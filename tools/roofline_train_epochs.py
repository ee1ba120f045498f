"""Train-step roofline via REAL epoch timings under config variants
(VERDICT r4 item 4).

Why not prefix pipelines: tools/profile_train_phases.py tried the
profile_eval_phases method (time prefix pipelines of the step, attribute
phases to differences) and its numbers are unusable through the tunnel —
two independent pathologies, both caught and recorded:

1. the remote-device tunnel memoizes repeated dispatches with a key
   looser than input contents (a varied-seed second call of a b131072
   step "ran" in 50 us; even AOT-compiled first executions of reduced
   pipelines came back faster than their HBM floor), and
2. XLA's algebraic simplifier rewrites the reduced pipelines themselves:
   a pipeline ending in sum(dense @ gathered) is simplified to
   dot(colsum(dense), ...) — one reduction pass instead of the matmul —
   so "dense sweep only" measures a program the real step never runs
   (same class as the round-1 note: synthetic gather+sum probes report
   absurd 40 G rows/s because XLA folds the gather into the reduction).

The real train epoch has neither problem: its output (params) depends on
every phase with no collapsible algebra, and convergence-run wall times
independently confirm the trainer's epoch timing. So: time REAL epochs
under ablated configs and attribute differences.

  full(L=3)  - full(L=0)    -> 3-layer propagation fwd+bwd+their grads
  full(ell)  - full(hybrid) -> the gather-vs-dense-hub delta (known A/B)
  full(adam) - full(sgd)    -> optimizer update + moment traffic
  full(L=0, sgd)            -> sampling + loss head + table grads floor

Each arm is the production Trainer (on-device sampling included,
2-dispatch epochs). Usage:
  python tools/roofline_train_epochs.py [--batch 131072] [--epochs 3]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--hbm_gbps", type=float, default=819.0)
    ap.add_argument("--sampling_only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsrs_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.ops.hybrid import hybrid_from_interactions
    from gsrs_tpu.train.trainer import Trainer

    print(f"[backend] {jax.default_backend()} {jax.devices()}", flush=True)
    ddir = os.path.join(REPO, "data", "gowalla")
    data = load_dataset(ddir, name="gowalla")
    graph = build_graph(data, cache_dir=ddir)
    hg = hybrid_from_interactions(data, cols=8192, dtype=jnp.bfloat16)
    eg = ell_from_interactions(data)

    import optax

    import gsrs_tpu.train.trainer as trainer_mod
    from gsrs_tpu.ops.sampling import make_sampler_state, sample_epoch
    from gsrs_tpu.train.optim import make_optimizer as real_make_opt

    # the sampler dispatch the trainer actually runs (honest: a fresh
    # key per call, so the tunnel cannot memoize the dispatch)
    st = jax.device_put(make_sampler_state(data))
    steps = -(-data.train_size // args.batch)
    out0 = sample_epoch(jax.random.key(0), st, steps * args.batch, args.batch)
    jax.block_until_ready(out0)  # compile
    t0 = time.time()
    reps = 3
    for r in range(1, reps + 1):
        jax.block_until_ready(
            sample_epoch(jax.random.key(r), st, steps * args.batch, args.batch)
        )
    sampling_s = (time.time() - t0) / reps
    print(json.dumps({"sampling_epoch_s": round(sampling_s, 4)}), flush=True)
    if args.sampling_only:
        return

    def epoch_time(mcfg, layout, optimizer="adam"):
        cfg = ExperimentConfig(
            model=mcfg,
            train=TrainConfig(batch_size=args.batch, tensorboard=False),
        )
        # the sgd arm isolates Adam's moment reads/writes + update math;
        # TrainConfig has no optimizer knob (the reference is Adam-only,
        # code/utils.py:51), so swap the factory at the trainer seam
        if optimizer == "sgd":
            trainer_mod.make_optimizer = lambda tc, spe: (
                optax.sgd(learning_rate=tc.lr),
                optax.constant_schedule(tc.lr),
            )
        else:
            trainer_mod.make_optimizer = real_make_opt
        model = build_model(mcfg, graph, ell=layout)
        tr = Trainer(cfg, data, graph, model, run_eval=False)
        st = tr.init_state()
        st, _ = tr.train_epoch(st)  # compile + warm
        t0 = time.time()
        for _ in range(args.epochs):
            st, loss = tr.train_epoch(st)
        dt = (time.time() - t0) / args.epochs
        del tr, st, model
        return dt

    base = dict(num_layers=3, embedding_dim=64, bf16_compute=True)
    arms = {}
    arms["hybrid_L3_adam"] = epoch_time(
        ModelConfig(spmm_mode="hybrid", hybrid_cols=8192, **base), hg
    )
    arms["ell_L3_adam"] = epoch_time(ModelConfig(spmm_mode="ell", **base), eg)
    arms["hybrid_L0_adam"] = epoch_time(
        ModelConfig(spmm_mode="hybrid", hybrid_cols=8192,
                    num_layers=0, embedding_dim=64, bf16_compute=True),
        hg,
    )
    try:
        arms["hybrid_L3_sgd"] = epoch_time(
            ModelConfig(spmm_mode="hybrid", hybrid_cols=8192, **base),
            hg, optimizer="sgd",
        )
        arms["hybrid_L0_sgd"] = epoch_time(
            ModelConfig(spmm_mode="hybrid", hybrid_cols=8192,
                        num_layers=0, embedding_dim=64, bf16_compute=True),
            hg, optimizer="sgd",
        )
    except Exception as e:  # noqa: BLE001 — optimizer may not be pluggable
        arms["sgd_error"] = f"{type(e).__name__}: {e}"[:120]

    n, m, d = data.n_users, data.m_items, 64
    E = data.train_size
    steps = -(-E // args.batch)
    hbm = args.hbm_gbps * 1e9
    # floors per EPOCH (x steps where per-step)
    dense_bytes = (n + m) * 8192 * 2  # bf16 hub blocks, per layer
    res_edges = 837408 * 2  # padded residual slots/layer, fwd+transpose sides
    floors = {
        "prop3_hbm+issue_s": steps * 3 * (
            3 * dense_bytes / hbm + 3 * res_edges / 2 / 300e6
        ),  # fwd + bwd(2 transpose applies) approximated as 3 sweeps
        "adam_hbm_s": steps * 7 * (n + m) * d * 4 / hbm,
        "tables_rw_s": steps * 2 * (n + m) * d * 4 / hbm,
    }
    out = {
        "batch": args.batch,
        "steps_per_epoch": steps,
        "epoch_s": {k: round(v, 4) for k, v in arms.items()
                    if isinstance(v, float)},
    }
    if isinstance(arms.get("hybrid_L0_adam"), float):
        out["diff_s"] = {
            "propagation_L3_fwdbwd": round(
                arms["hybrid_L3_adam"] - arms["hybrid_L0_adam"], 4
            ),
            "gather_premium_ell_vs_hybrid": round(
                arms["ell_L3_adam"] - arms["hybrid_L3_adam"], 4
            ),
        }
        if isinstance(arms.get("hybrid_L3_sgd"), float):
            out["diff_s"]["adam_vs_sgd"] = round(
                arms["hybrid_L3_adam"] - arms["hybrid_L3_sgd"], 4
            )
            out["diff_s"]["sampling+loss+tablegrads_floor"] = round(
                arms["hybrid_L0_sgd"], 4
            )
    out["floor_s"] = {k: round(v, 5) for k, v in floors.items()}
    if "sgd_error" in arms:
        out["sgd_error"] = arms["sgd_error"]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
