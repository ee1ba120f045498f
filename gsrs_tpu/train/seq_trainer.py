"""Trainer + evaluator for the sequential (SASRec) model family.

Mirrors the graph trainer's TPU conventions: static-shaped epoch arrays,
one jitted `lax.scan` over minibatches with donated state, on-device
uniform negatives, and the shared masked-top-k/metrics stack for eval
(leave-last-item-out: HR@k == recall@k with a single ground-truth item,
NDCG@k as usual)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gsrs_tpu.data.sequences import SequenceData
from gsrs_tpu.models.sasrec import SASRec
from gsrs_tpu.ops.bitset import build_bitset
from gsrs_tpu.ops.metrics import batch_metrics, topk_labels
from gsrs_tpu.ops.topk import mask_train_positives, topk_scores


@dataclasses.dataclass
class SeqTrainState:
    params: Any
    opt_state: Any
    epoch: int = 0


class SeqTrainer:
    def __init__(
        self,
        model: SASRec,
        data: SequenceData,
        batch_size: int = 128,
        lr: float = 1e-3,
        decay: float = 0.0,
        seed: int = 2020,
        topks: Tuple[int, ...] = (10, 20),
        eval_batch: int = 256,
        mesh: Optional[Any] = None,
    ):
        """``mesh``: an optional (data, model) `jax.sharding.Mesh`. When
        set, epochs and eval run GSPMD-sharded — batches over 'data'
        (grad psum), the item table row-sharded over 'model' — via
        `gsrs_tpu.parallel.seq_sharding.SeqShardings`. Single-device is
        the mesh=None degenerate case of the same step code."""
        self.model = model
        self.data = data
        self.batch_size = batch_size
        self.decay = decay
        self.seed = seed
        self.topks = topks
        self.eval_batch = eval_batch
        self.optimizer = optax.adam(lr)
        self.mesh = mesh
        self._sh = None
        if mesh is not None:
            from gsrs_tpu.parallel.seq_sharding import SeqShardings

            d = mesh.shape.get("data", 1)
            if batch_size % d or eval_batch % d:
                raise ValueError(
                    f"batch_size {batch_size} and eval_batch {eval_batch} "
                    f"must divide by the data axis ({d})"
                )
            self._sh = SeqShardings(mesh)

        n = len(data.train_seqs)
        self.n_train = n
        pad = -(-n // batch_size) * batch_size
        seqs = np.zeros((pad, data.max_len), np.int32)
        seqs[:n] = data.train_seqs
        self.train_seqs = jnp.asarray(seqs)

        # eval: history bitset over REAL (unshifted) ids for masking
        hist_u, hist_i = [], []
        for u, items in data.user_hist_sets.items():
            hist_u.append(np.full(len(items), u, np.int64))
            hist_i.append(np.asarray(items, np.int64) - 1)  # unshift
        self.hist_bitset = jnp.asarray(
            build_bitset(
                np.concatenate(hist_u) if hist_u else np.zeros(0, np.int64),
                np.concatenate(hist_i) if hist_i else np.zeros(0, np.int64),
                data.n_users,
                data.m_items,
            )
        )
        tgt_bitset = build_bitset(
            data.eval_users.astype(np.int64),
            (data.eval_targets - 1).astype(np.int64),
            data.n_users,
            data.m_items,
        )
        self.target_bitset = jnp.asarray(tgt_bitset)
        self._epoch_fn = None
        self._eval_fn = None
        # set by init_state; equal values make (un)padding a no-op
        self._canonical_rows = self._padded_rows = 0
        self._table_dim = 0

    def init_state(self) -> SeqTrainState:
        params = self.model.init_params(jax.random.key(self.seed))
        self._canonical_rows = params["item_emb"].shape[0]
        self._table_dim = params["item_emb"].shape[1]
        self._padded_rows = self._canonical_rows
        if self._sh is not None:
            # pad the item table to the model-axis multiple so rows shard
            # evenly; phantom rows are never gathered (ids ≤ m_items) and
            # score_catalog slices exactly m_items real rows
            m_ax = self.mesh.shape.get("model", 1)
            self._padded_rows = self._canonical_rows + (
                (-self._canonical_rows) % m_ax
            )
            if self._padded_rows != self._canonical_rows:
                params["item_emb"] = jnp.pad(
                    params["item_emb"],
                    ((0, self._padded_rows - self._canonical_rows), (0, 0)),
                )
            params = self._sh.place_params(params)
        return SeqTrainState(params, self.optimizer.init(params))

    # -------------------------------------------------- checkpoint (un)padding
    # Checkpoints always store the CANONICAL (unpadded) table so they stay
    # interchangeable across mesh configs and readable by serve_seq export;
    # the mesh padding is a runtime layout detail, re-applied on restore.
    def _is_table_leaf(self, leaf) -> bool:
        return getattr(leaf, "shape", None) == (self._padded_rows, self._table_dim)

    def _unpad_tree(self, tree):
        if self._padded_rows == self._canonical_rows:
            return tree
        cut = self._canonical_rows
        return jax.tree_util.tree_map(
            lambda v: v[:cut] if self._is_table_leaf(v) else v, tree
        )

    def _repad_tree(self, tree):
        if self._padded_rows == self._canonical_rows:
            return tree
        pad = self._padded_rows - self._canonical_rows
        canon = (self._canonical_rows, self._table_dim)

        def fix(v):
            if getattr(v, "shape", None) == canon:
                return jnp.pad(jnp.asarray(v), ((0, pad), (0, 0)))
            return v

        return jax.tree_util.tree_map(fix, tree)

    # ------------------------------------------------------------------ train
    def _build_epoch_fn(self, state: "SeqTrainState"):
        model, opt, decay = self.model, self.optimizer, self.decay
        m_items = self.data.m_items

        def run_epoch(params, opt_state, seq_batches, keys):
            def body(carry, xs):
                params, opt_state = carry
                seqs, key = xs
                inp = jnp.zeros_like(seqs).at[:, 1:].set(seqs[:, :-1])
                pos = seqs
                k_neg, k_drop = jax.random.split(key)
                neg = jax.random.randint(
                    k_neg, seqs.shape, 1, m_items + 1, dtype=jnp.int32
                )
                neg = jnp.where(pos == 0, 0, neg)

                def loss_fn(p):
                    loss, aux = model.next_item_bpr_loss(
                        p, inp, pos, neg, k_drop
                    )
                    return loss + decay * aux["reg"], aux

                (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (seq_batches, keys)
            )
            return params, opt_state, jnp.mean(losses)

        if self._sh is None:
            return jax.jit(run_epoch, donate_argnums=(0, 1))
        sh = self._sh
        pspec = sh.params_spec(state.params)
        ospec = sh.opt_state_spec(state.opt_state, state.params)
        return jax.jit(
            run_epoch,
            in_shardings=(pspec, ospec, sh.scan_batch_spec(), sh.replicated()),
            out_shardings=(pspec, ospec, sh.replicated()),
            donate_argnums=(0, 1),
        )

    def train_epoch(self, state: SeqTrainState) -> Tuple[SeqTrainState, float]:
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn(state)
        key = jax.random.fold_in(jax.random.key(self.seed), state.epoch)
        k_perm, k_steps = jax.random.split(key)
        perm = jax.random.permutation(k_perm, self.train_seqs.shape[0])
        batches = self.train_seqs[perm].reshape(
            -1, self.batch_size, self.data.max_len
        )
        keys = jax.random.split(k_steps, batches.shape[0])
        params, opt_state, loss = self._epoch_fn(
            state.params, state.opt_state, batches, keys
        )
        return SeqTrainState(params, opt_state, state.epoch + 1), float(loss)

    # ------------------------------------------------------------------ eval
    def _build_eval_fn(self):
        """Built ONCE per trainer — a fresh jitted closure per evaluate()
        call would recompile every eval (the same re-jit trap fixed in the
        graph evaluator)."""
        model, m_items, topks = self.model, self.data.m_items, self.topks
        max_k = max(topks)

        def eval_batch(params, seqs, users, weights, hist_bitset, target_bitset):
            scores = model.score_catalog(params, seqs)
            hist_rows = hist_bitset[users]
            scores = mask_train_positives(scores, hist_rows, m_items)
            _, top_items = topk_scores(scores, max_k)
            labels = topk_labels(top_items, target_bitset, users)
            gt = jnp.ones(seqs.shape[0], jnp.float32)
            return batch_metrics(labels, gt, weights, topks)

        return jax.jit(eval_batch)

    def evaluate(self, state: SeqTrainState) -> Dict[str, float]:
        data = self.data
        n_eval = len(data.eval_users)
        B = self.eval_batch
        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        eval_batch = self._eval_fn

        def place(x, spec_fn):
            a = jnp.asarray(x)
            return jax.device_put(a, spec_fn()) if self._sh else a

        totals: Dict[str, float] = {}
        pad = -(-n_eval // B) * B
        seqs = np.zeros((pad, data.max_len), np.int32)
        seqs[:n_eval] = data.eval_seqs
        users = np.zeros(pad, np.int32)
        users[:n_eval] = data.eval_users
        weights = np.zeros(pad, np.float32)
        weights[:n_eval] = 1.0
        for s in range(0, pad, B):
            sums = eval_batch(
                state.params,
                place(seqs[s : s + B], lambda: self._sh.batch_spec()),
                place(users[s : s + B], lambda: self._sh.vector_spec()),
                place(weights[s : s + B], lambda: self._sh.vector_spec()),
                self.hist_bitset,
                self.target_bitset,
            )
            for k, v in sums.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        return {k: v / max(n_eval, 1) for k, v in totals.items()}

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        state: Optional[SeqTrainState] = None,
        epochs: int = 100,
        checkpoint_dir: Optional[str] = None,
        eval_every: int = 10,
        resume: bool = False,
        verbose: bool = True,
        tensorboard: bool = False,
        comment: str = "",
    ) -> SeqTrainState:
        """Full training loop with the graph Trainer's amenities: CSV +
        optional TensorBoard logging (same schemas/tag shapes as reference
        code/main.py:98-133,170), per-epoch last checkpoint, best-NDCG
        checkpoint, resume, and a final eval of the last state. All
        optional: with no checkpoint_dir this is just the epoch loop."""
        import time as _time

        from gsrs_tpu.train.logging import TensorboardWriter

        state = state or self.init_state()
        ckpt = train_csv = valid_csv = None
        tb = TensorboardWriter(
            checkpoint_dir if (tensorboard and checkpoint_dir) else None,
            comment or f"seq-{self.data.name}",
        )
        if checkpoint_dir:
            from gsrs_tpu.train.checkpoint import CheckpointManager
            from gsrs_tpu.train.logging import make_train_csv, make_valid_csv

            ckpt = CheckpointManager(checkpoint_dir)
            train_csv = make_train_csv(checkpoint_dir)
            valid_csv = make_valid_csv(checkpoint_dir, self.topks)
            # persist the exact model hyperparameters so export/serving
            # never has to re-guess them from CLI flags
            import json as _json
            import os as _os

            from gsrs_tpu.models.registry import seq_model_meta

            with open(
                _os.path.join(checkpoint_dir, "model_meta.json"), "w"
            ) as f:
                _json.dump(seq_model_meta(self.model), f)
            if resume:
                path = ckpt.resolve_resume_path(None)
                if path is not None:
                    restored = ckpt.restore(path, self._ckpt_state(state))
                    state = self._from_ckpt_state(restored)
                    if verbose:
                        print(f"[resume] restored from {path} (epoch {state.epoch})")

        best_ndcg = 0.0
        main_k = max(self.topks)
        last_eval = -1
        try:
            while state.epoch < epochs:
                if state.epoch % eval_every == 0:
                    last_eval = state.epoch
                    metrics = self.evaluate(state)
                    self._log_eval(state, metrics, valid_csv, verbose, tb)
                    if ckpt and metrics.get(f"ndcg@{main_k}", 0.0) > best_ndcg:
                        best_ndcg = metrics[f"ndcg@{main_k}"]
                        ckpt.save_best(self._ckpt_state(state), state.epoch)
                t0 = _time.time()
                state, loss = self.train_epoch(state)
                dt = _time.time() - t0
                tb.scalar("Train/loss", loss, state.epoch)
                if train_csv:
                    train_csv.append(
                        {
                            "epoch": state.epoch,
                            "time_sec": f"{dt:.3f}",
                            "train_loss": f"{loss:.6f}",
                            "lr": "",
                        }
                    )
                if verbose:
                    print(f"[epoch {state.epoch}/{epochs}] loss={loss:.5f} ({dt:.2f}s)")
                if ckpt:
                    ckpt.save_last(self._ckpt_state(state))
            if last_eval != state.epoch:
                metrics = self.evaluate(state)
                self._log_eval(state, metrics, valid_csv, verbose, tb)
                if ckpt and metrics.get(f"ndcg@{main_k}", 0.0) > best_ndcg:
                    ckpt.save_best(self._ckpt_state(state), state.epoch)
        finally:
            # reference discipline: flush TB even on a crash (code/main.py:244-247)
            tb.close()
        return state

    def _ckpt_state(self, state: SeqTrainState):
        return {
            "params": self._unpad_tree(state.params),
            "opt_state": self._unpad_tree(state.opt_state),
            "epoch": np.asarray(state.epoch, np.int64),
        }

    def _from_ckpt_state(self, restored) -> SeqTrainState:
        params = self._repad_tree(restored["params"])
        opt_state = self._repad_tree(restored["opt_state"])
        if self._sh is not None:
            params = self._sh.place_params(params)
            ospec = self._sh.opt_state_spec(opt_state, params)
            opt_state = jax.tree_util.tree_map(
                jax.device_put, opt_state, ospec
            )
        return SeqTrainState(params, opt_state, int(restored["epoch"]))

    def _log_eval(self, state, metrics, valid_csv, verbose, tb=None):
        if tb is not None:
            tb.eval_metrics(metrics, self.topks, state.epoch)
        if valid_csv:
            row = {"epoch": state.epoch, "time_sec": "", "lr": ""}
            row.update({k: f"{v:.6f}" for k, v in metrics.items()})
            valid_csv.append(row)
        if verbose:
            print(
                f"[eval e{state.epoch}] "
                + " ".join(f"{k}={v:.5f}" for k, v in sorted(metrics.items()))
            )
