"""Training driver.

The reference's epoch loop (code/main.py:185-242) round-trips to the host
per minibatch: C++ sampling on the host (~16 s/epoch of the ~31-36 s
Gowalla epoch, BASELINE.md), tensor transfer, ~400 optimizer steps each
syncing loss back (code/utils.py:64). Here an epoch is TWO device
dispatches: one jitted epoch-sampler call (on-device bitset rejection) and
one jitted `lax.scan` over all minibatches with donated params/opt-state —
no host↔device traffic until the scalar epoch-mean loss is read.

Loop semantics match the reference: eval every `eval_every` epochs with
best-NDCG checkpointing (code/main.py:187-212), per-epoch `last` saves,
periodic legacy-style saves (code/main.py:238-242), CSV/TB logging, and a
resume chain."""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gsrs_tpu.config import ExperimentConfig
from gsrs_tpu.data.adjacency import BipartiteGraph
from gsrs_tpu.data.dataset import InteractionData
from gsrs_tpu.models.lightgcn import LightGCN, Params
from gsrs_tpu.ops.sampling import make_sampler_state, sample_epoch
from gsrs_tpu.train.checkpoint import CheckpointManager, legacy_name
from gsrs_tpu.train.evaluator import Evaluator
from gsrs_tpu.train.logging import (
    TensorboardWriter,
    make_train_csv,
    make_valid_csv,
)
from gsrs_tpu.train.optim import make_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    epoch: int = dataclasses.field(metadata=dict(static=True), default=0)
    best_metric: float = dataclasses.field(metadata=dict(static=True), default=0.0)


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        data: InteractionData,
        graph: BipartiteGraph,
        model: LightGCN,
        run_eval: bool = True,
    ):
        self.cfg = cfg
        self.data = data
        # Mesh-first: single-chip is the degenerate 1×1 mesh. With a larger
        # mesh (cfg.parallel), tables are row-sharded over 'model', batches
        # over 'data', edges over the whole mesh — GSPMD inserts the
        # collectives in the same jitted epoch scan.
        par = cfg.parallel
        self.mesh = None
        self._shardings = None
        if par.data_axis * par.model_axis > 1:
            from gsrs_tpu.parallel.mesh import make_mesh
            from gsrs_tpu.parallel.sharding import GraphShardings

            self.mesh = make_mesh(par)
            self._shardings = GraphShardings(self.mesh)
        # Move graph constants to device ONCE: these pytrees are passed as
        # jit arguments every epoch, and numpy-backed leaves would re-upload
        # tens of MB through the host on every call.
        if self._shardings is not None:
            self.graph = self._shardings.place_graph(graph)
            if model.ell is not None:
                from gsrs_tpu.ops.ell import EllGraph

                if isinstance(model.ell, EllGraph):
                    # bucket arrays shard their rows over the whole mesh —
                    # each device stores ~1/n_devices of the edge slots
                    model.ell = self._shardings.place_ell(model.ell)
                else:
                    model.ell = jax.device_put(
                        model.ell, self._shardings.replicated()
                    )
        else:
            self.graph = jax.device_put(graph)
            if model.ell is not None:
                model.ell = jax.device_put(model.ell)
        model.graph = self.graph
        self.model = model
        self.sampler_state = jax.device_put(
            make_sampler_state(data),
            *( [self._shardings.replicated()] if self._shardings else [] ),
        )
        # Models that mask per-user positives inside their loss (UltraGCN
        # ug_sift_pos) get the sampler's packed bitset through the unused
        # ell slot — same buffer, no extra HBM.
        if getattr(model, "wants_train_bitset", False) and model.ell is None:
            from gsrs_tpu.models.ultragcn import TrainBitset

            model.ell = TrainBitset(self.sampler_state.train_bitset)
        self.steps_per_epoch = max(1, -(-data.train_size // cfg.train.batch_size))
        self.optimizer, self.schedule = make_optimizer(
            cfg.train, self.steps_per_epoch
        )
        self.evaluator = (
            # reuse the sampler's packed train bitset — a second copy
            # would double ~150 MB of HBM at Gowalla scale
            Evaluator(
                data, model, cfg.eval,
                train_bitset=self.sampler_state.train_bitset,
            )
            if (run_eval and data.test_dict)
            else None
        )
        self.ckpt = CheckpointManager(cfg.train.checkpoint_dir)
        # Triplets sampled per epoch; None = train_size (reference semantics,
        # code/utils.py:68-81). Settable for quick smoke runs.
        self.epoch_samples: Optional[int] = None
        self._epoch_fn = None  # compiled lazily

    # ------------------------------------------------------------------ init
    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.train.seed if seed is None else seed
        params = self.model.init_params(jax.random.key(seed))
        if self._shardings is not None:
            params = self._shardings.place_params(params)
        return TrainState(params=params, opt_state=self.optimizer.init(params))

    # ------------------------------------------------------------ train step
    def _build_epoch_fn(self):
        from gsrs_tpu.train.fused_adam import FusedAdam

        model, opt = self.model, self.optimizer
        fused_step = isinstance(opt, FusedAdam)
        decay = self.cfg.train.decay
        # Models that consume per-step randomness beyond edge dropout
        # (e.g. XSimGCL's noise views) declare needs_step_key.
        use_dropout = self.cfg.model.dropout or getattr(
            model, "needs_step_key", False
        )

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, graph, ell, users_b, pos_b, neg_b, drop_keys):
            # graph/ell are jit arguments (not closures) so their edge
            # arrays are device buffers, never HLO constants.
            def body(carry, xs):
                params, opt_state = carry
                users, pos, neg, drop_key = xs

                def loss_fn(p):
                    loss, aux = model.bpr_loss(
                        p,
                        users,
                        pos,
                        neg,
                        drop_key if use_dropout else None,
                        graph,
                        ell,
                    )
                    return loss + decay * aux["reg"], aux

                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                if fused_step:
                    params, opt_state = opt.step(params, grads, opt_state)
                else:
                    updates, opt_state = opt.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (users_b, pos_b, neg_b, drop_keys)
            )
            return params, opt_state, jnp.mean(losses)

        return run_epoch

    def train_epoch(self, state: TrainState) -> Tuple[TrainState, float]:
        """One full epoch: on-device sampling + scanned optimizer steps.

        Sampling draws train_size triplets rounded up to full batches
        (same expected coverage as reference code/utils.py:68-81, without
        the ragged tail of code/utils.py:135-139)."""
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()
        epoch_key = jax.random.fold_in(
            jax.random.key(self.cfg.train.seed), state.epoch
        )
        k_sample, k_drop = jax.random.split(epoch_key)
        B = self.cfg.train.batch_size
        epoch_size = self.epoch_samples or self.data.train_size
        num_batches = max(1, -(-epoch_size // B))
        # steps_per_scan chunks the epoch: each chunk samples its own
        # triplets and runs one scan segment, bounding the (chunk, B)
        # batch buffers on device AND the single-dispatch duration —
        # multi-minute single executions fault the TPU worker 5/5
        # (results/probe_flake_r4.log; see TrainConfig.steps_per_scan).
        # 0 = auto: whole epoch, capped at 128 steps per segment.
        # -1 = force the whole epoch into ONE uncapped scan segment (the
        # pre-round-3 behavior) — for fault-reproduction experiments only.
        spc = self.cfg.train.steps_per_scan or min(num_batches, 128)
        if spc == -1:
            spc = num_batches
        if spc < 1:
            raise ValueError(
                f"steps_per_scan must be >= -1, got {self.cfg.train.steps_per_scan}"
            )

        def _place(batches):
            if self._shardings is None:
                return batches
            # batches: (num_batches, B) sharded over 'data' on the batch dim
            from jax.sharding import NamedSharding, PartitionSpec as P

            bspec = NamedSharding(self.mesh, P(None, "data"))
            return tuple(jax.device_put(b, bspec) for b in batches)

        params, opt_state = state.params, state.opt_state
        loss_acc = 0.0
        for chunk_i, c0 in enumerate(range(0, num_batches, spc)):
            n = min(spc, num_batches - c0)
            kc = k_sample if spc >= num_batches else jax.random.fold_in(
                k_sample, chunk_i
            )
            kd = k_drop if spc >= num_batches else jax.random.fold_in(
                k_drop, chunk_i
            )
            users_b, pos_b, neg_b = _place(
                sample_epoch(
                    kc,
                    self.sampler_state,
                    n * B,
                    B,
                    by_edge=getattr(self.model, "samples_pairs_by_edge", False),
                    neg_candidates=self.cfg.train.neg_candidates,
                )
            )
            drop_keys = jax.random.split(kd, n)
            params, opt_state, mean_loss = self._epoch_fn(
                params,
                opt_state,
                self.graph,
                self.model.ell,
                users_b,
                pos_b,
                neg_b,
                drop_keys,
            )
            loss_acc = loss_acc + mean_loss * n
        return (
            TrainState(params, opt_state, state.epoch + 1, state.best_metric),
            float(loss_acc) / num_batches,
        )

    # ------------------------------------------------------------------ eval
    def evaluate(self, state: TrainState) -> Dict[str, float]:
        assert self.evaluator is not None, "dataset has no test split"
        return self.evaluator.run(state.params)

    def current_lr(self, state: TrainState) -> float:
        return float(self.schedule(state.epoch * self.steps_per_epoch))

    # ------------------------------------------------------------ checkpoint
    def _ckpt_state(self, state: TrainState) -> Dict[str, Any]:
        return {
            "params": state.params,
            "opt_state": state.opt_state,
            "epoch": np.asarray(state.epoch, np.int64),
            "best_metric": np.asarray(state.best_metric, np.float64),
        }

    def save_last(self, state: TrainState) -> None:
        self.ckpt.save_last(self._ckpt_state(state))

    def maybe_resume(self, state: TrainState) -> TrainState:
        path = self.ckpt.resolve_resume_path(
            self.cfg.train.resume_path,
            legacy_name(
                self.cfg.model.model,
                self.data.name,
                self.cfg.model.num_layers,
                self.cfg.model.embedding_dim,
            ),
        )
        if path is None:
            return state
        restored = self.ckpt.restore(path, self._ckpt_state(state))
        print(f"[resume] restored checkpoint from {path}")
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            epoch=int(restored["epoch"]),
            best_metric=float(restored["best_metric"]),
        )

    # ------------------------------------------------------------------ fit
    def fit(
        self,
        state: Optional[TrainState] = None,
        epochs: Optional[int] = None,
        log_dir: Optional[str] = None,
        verbose: bool = True,
    ) -> TrainState:
        """Full training run with the reference loop semantics
        (code/main.py:185-242): eval every eval_every epochs (and epoch 0),
        best-NDCG checkpoints, per-epoch last saves, periodic legacy saves."""
        t_cfg = self.cfg.train
        epochs = t_cfg.epochs if epochs is None else epochs
        state = state or self.init_state()
        if t_cfg.load_pretrained:
            # --load semantics (reference code/main.py:143-149): restore
            # WEIGHTS ONLY from the legacy-named checkpoint, keep epoch 0 /
            # fresh optimizer; missing file tolerated with a warning.
            import os as _os

            legacy = legacy_name(
                self.cfg.model.model,
                self.data.name,
                self.cfg.model.num_layers,
                self.cfg.model.embedding_dim,
            )
            legacy_path = _os.path.join(t_cfg.checkpoint_dir, legacy)
            path = (
                legacy_path
                if _os.path.isdir(legacy_path)
                else self.ckpt.resolve_resume_path(None, legacy)
            )
            if path is not None:
                restored = self.ckpt.restore(path, self._ckpt_state(state))
                state = dataclasses.replace(state, params=restored["params"])
                print(f"[load] restored pretrained weights from {path}")
            else:
                print(f"[load] WARNING: no pretrained checkpoint ({legacy})")
        if t_cfg.resume:
            state = self.maybe_resume(state)

        train_csv = make_train_csv(t_cfg.checkpoint_dir)
        valid_csv = make_valid_csv(t_cfg.checkpoint_dir, self.cfg.eval.topks)
        # persist the exact model config next to the checkpoints so
        # serve/export never re-guesses it from CLI flags (fields like
        # pop_gate_temp or i2i_alpha don't change parameter shapes, so a
        # wrong flag at export time would corrupt serving silently)
        import json as _json
        import os as _os

        with open(
            _os.path.join(t_cfg.checkpoint_dir, "model_meta.json"), "w"
        ) as f:
            _json.dump(dataclasses.asdict(self.cfg.model), f)
        tb = TensorboardWriter(log_dir if t_cfg.tensorboard else None, t_cfg.comment)
        main_k = max(self.cfg.eval.topks)
        last_eval_epoch = -1
        last_saved_epoch = -1
        evals_since_best = 0

        try:
            while state.epoch < epochs:
                # eval_every <= 0 = no in-loop eval (the final eval after
                # the last epoch still runs); reference hardcodes 10
                if (
                    self.evaluator is not None
                    and t_cfg.eval_every > 0
                    and state.epoch % t_cfg.eval_every == 0
                ):
                    last_eval_epoch = state.epoch
                    state, improved = self._run_eval(
                        state, valid_csv, tb, verbose, label="eval"
                    )
                    if improved:
                        evals_since_best = 0
                    else:
                        evals_since_best += 1
                        if (
                            t_cfg.early_stop_evals
                            and evals_since_best >= t_cfg.early_stop_evals
                        ):
                            if verbose:
                                print(
                                    f"[early-stop] no ndcg@{main_k} improvement"
                                    f" in {evals_since_best} evals"
                                    f" (best {state.best_metric:.5f})"
                                )
                            break

                t0 = time.time()
                state, loss = self.train_epoch(state)
                dt = time.time() - t0
                lr = self.current_lr(state)
                train_csv.append(
                    {
                        "epoch": state.epoch,
                        "time_sec": f"{dt:.3f}",
                        "train_loss": f"{loss:.6f}",
                        "lr": lr,
                    }
                )
                tb.scalar("Train/loss", loss, state.epoch)
                if verbose:
                    print(f"[epoch {state.epoch}/{epochs}] loss={loss:.5f} ({dt:.2f}s)")
                # 'last' save cadence: a full Orbax write costs ~1-2 s
                # through this filesystem — at the headline 0.5 s/epoch,
                # saving EVERY epoch quadruples wall time (round-5 queue
                # pacing measurement: 2.3 s/epoch wall vs 0.56 s train).
                # Resume still lands on the newest multiple; 1 keeps the
                # original every-epoch behavior.
                if (
                    t_cfg.save_last_every == 1
                    or state.epoch % max(1, t_cfg.save_last_every) == 0
                ):
                    self.save_last(state)
                    last_saved_epoch = state.epoch
                if t_cfg.save_every and state.epoch % t_cfg.save_every == 0:
                    self.ckpt.save_periodic(
                        self._ckpt_state(state),
                        legacy_name(
                            self.cfg.model.model,
                            self.data.name,
                            self.cfg.model.num_layers,
                            self.cfg.model.embedding_dim,
                        ),
                    )

            # Final eval after the last epoch (the reference's loop pattern
            # never evaluates the final state, code/main.py:185-242 — the
            # epoch-1000 numbers it reports are from epoch 990). The in-loop
            # eval fires BEFORE an epoch trains, so the state after the last
            # epoch has never been evaluated regardless of divisibility.
            if self.evaluator is not None and last_eval_epoch != state.epoch:
                state, _ = self._run_eval(
                    state, valid_csv, tb, verbose, label="final eval"
                )
        finally:
            # the loop may skip save_last on its final epoch (throttled
            # cadence / early-stop / interrupt): always leave a current
            # 'last' checkpoint behind (skipped when the loop just wrote it)
            if t_cfg.checkpoint_dir and last_saved_epoch != state.epoch:
                self.save_last(state)
            tb.close()
        return state

    def _run_eval(self, state, valid_csv, tb, verbose, label="eval"):
        """One eval + CSV/TB logging + best-NDCG checkpointing.
        → (state, improved). Shared by the in-loop and final evals."""
        t_cfg = self.cfg.train
        main_k = max(self.cfg.eval.topks)
        t0 = time.time()
        metrics = self.evaluate(state)
        eval_sec = time.time() - t0
        row = {
            "epoch": state.epoch,
            "time_sec": f"{eval_sec:.3f}",
            "lr": self.current_lr(state),
        }
        row.update({k: f"{v:.6f}" for k, v in metrics.items()})
        valid_csv.append(row)
        tb.eval_metrics(metrics, self.cfg.eval.topks, state.epoch)
        if verbose:
            print(f"[{label} e{state.epoch}] " + " ".join(
                f"{k}={v:.5f}" for k, v in sorted(metrics.items())
            ))
        ndcg = metrics.get(f"ndcg@{main_k}", 0.0)
        improved = ndcg > state.best_metric
        if improved:
            state = dataclasses.replace(state, best_metric=ndcg)
            self.ckpt.save_best(
                self._ckpt_state(state), state.epoch, t_cfg.keep_topk
            )
        return state, improved
