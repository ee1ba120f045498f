"""Mega-hub crash probe (VERDICT r2 item 2 root-cause proof).

Round 2's yelp-scale stand-in crashed the TPU worker inside the first
train epoch. Root cause (round 3): big_synthetic's inverse-CDF clamp
dumped ~35% of ALL draws onto the single last item (degree ~540k),
which the ELL builder turned into a degenerate (1, 2^20)-wide bucket
whose compiled gather faulted the worker.

This probe reconstructs exactly that pathology on purpose — a
yelp-shaped graph where item 0 holds 35% of all edges — and runs one
jitted BPR grad step:

  --max_width 1073741824   no row splitting (the r2 layout) → expected
                           to reproduce the worker fault
  --max_width 65536        the round-3 ELL row-splitting default →
                           expected to run

Run each mode in its own process (a worker fault kills the client).
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
    ap.add_argument("--max_width", type=int, default=65536)
    ap.add_argument("--n_users", type=int, default=31668)
    ap.add_argument("--m_items", type=int, default=38048)
    ap.add_argument("--avg_degree", type=int, default=49)
    ap.add_argument("--hub_share", type=float, default=0.35)
    ap.add_argument(
        "--trainer", action="store_true",
        help="run the FULL Trainer epoch (sampler + Adam + chunked scan) "
        "instead of the minimal grad step — the minimal step SURVIVES the "
        "degenerate layout (83 s compile, 10x slow steps); the r2 worker "
        "fault needed the whole train program around it",
    )
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from gsrs_tpu.data.adjacency import normalized_edge_weights
    from gsrs_tpu.ops.ell import build_ell_graph, ell_propagate_layer

    rng = np.random.default_rng(0)
    total = args.n_users * args.avg_degree
    users = np.repeat(
        np.arange(args.n_users, dtype=np.int64), args.avg_degree
    )
    items = rng.integers(0, args.m_items, total)
    hub = rng.random(total) < args.hub_share
    items[hub] = 0  # the mega-hub

    user_deg = np.bincount(users, minlength=args.n_users)
    item_deg = np.bincount(items, minlength=args.m_items)
    w = normalized_edge_weights(users, items, user_deg, item_deg)
    ell = build_ell_graph(
        users, items, w.astype(np.float32),
        args.n_users, args.m_items, max_width=args.max_width,
    )
    widths = sorted(b.cols.shape[1] for b in ell.by_item.buckets)
    print(json.dumps({
        "hub_degree": int(item_deg.max()),
        "max_width": args.max_width,
        "by_item_max_bucket_width": widths[-1],
        "split_extras": (
            0 if ell.by_item.extra_dst is None
            else int(ell.by_item.extra_dst.shape[0])
        ),
    }), flush=True)

    if args.trainer:
        import dataclasses as dc

        from gsrs_tpu.config import (
            EvalConfig, ExperimentConfig, ModelConfig, TrainConfig,
        )
        from gsrs_tpu.data.dataset import InteractionData
        from gsrs_tpu.data.adjacency import build_graph
        from gsrs_tpu.models.registry import build_model
        from gsrs_tpu.train.trainer import Trainer

        data = InteractionData(
            name="megahub", n_users=args.n_users, m_items=args.m_items,
            train_users=users, train_items=items, test_dict={},
        )
        graph = build_graph(data)
        mcfg = ModelConfig(num_layers=3, embedding_dim=64,
                           bf16_compute=True, spmm_mode="ell")
        cfg = ExperimentConfig(
            model=mcfg,
            train=TrainConfig(batch_size=2048, tensorboard=False),
            eval=EvalConfig(test_batch=2048, topks=(20,)),
        )
        model = build_model(mcfg, graph, ell=ell)
        trainer = Trainer(cfg, data, graph, model, run_eval=False)
        state = trainer.init_state()
        t0 = time.time()
        state, loss = trainer.train_epoch(state)
        print(json.dumps({
            "result": "TRAINER_EPOCH_OK",
            "epoch_s": round(time.time() - t0, 2),
            "loss": float(loss),
        }), flush=True)
        return

    d = 64
    u = jnp.asarray(rng.normal(size=(args.n_users, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(args.m_items, d)).astype(np.float32))

    @jax.jit
    def step(u, x):
        def loss(u, x):
            nu, ni = ell_propagate_layer(ell, u.astype(jnp.bfloat16),
                                         x.astype(jnp.bfloat16), None)
            return (nu.astype(jnp.float32) ** 2).sum() + (
                ni.astype(jnp.float32) ** 2
            ).sum()

        gu, gx = jax.grad(loss, argnums=(0, 1))(u, x)
        return jnp.abs(gu).sum() + jnp.abs(gx).sum()

    t0 = time.time()
    v = float(jax.block_until_ready(step(u, x)))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        v = float(jax.block_until_ready(step(u, x)))
    print(json.dumps({
        "result": "OK",
        "grad_abs_sum_finite": bool(np.isfinite(v)),
        "compile_s": round(compile_s, 2),
        "step_s": round((time.time() - t0) / 3, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
