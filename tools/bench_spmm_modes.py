"""Gowalla epoch-time A/B across SpMM modes on the real chip.

Times the full training epoch (on-device sampling included, identical to
bench.py's protocol) for spmm_mode in {ell, hybrid} at the parity batch
(2048) and the large batch (8192), bf16. The hybrid mode's dense hub
blocks trade issue-rate-bound gathers for full-bandwidth MXU matmuls
(ops/hybrid.py); this harness measures what that buys end-to-end.

Usage: python tools/bench_spmm_modes.py [--hybrid_cols 4096 8192 16384]
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
    ap.add_argument("--batch", type=int, nargs="+", default=[2048, 8192])
    ap.add_argument(
        "--hybrid_cols", type=int, nargs="*", default=[8192, 16384],
        help="hybrid variants; pass with no values to skip hybrid",
    )
    ap.add_argument(
        "--no_ell", action="store_true", help="skip the ELL baseline arm"
    )
    ap.add_argument(
        "--tiled", type=str, nargs="*", default=[],
        help="tiled variants as G:C pairs, e.g. --tiled 32:4096 64:4096",
    )
    ap.add_argument("--timed_epochs", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gsrs_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.ops.hybrid import hybrid_from_interactions
    from gsrs_tpu.train.trainer import Trainer

    ddir = os.path.join(REPO, "data", "gowalla")
    data = load_dataset(ddir, name="gowalla")
    graph = build_graph(data, cache_dir=ddir)

    layouts = []
    if not args.no_ell:
        layouts.append(("ell", "ell", {}, ell_from_interactions(data)))
    for c in args.hybrid_cols:
        layouts.append(
            (f"hybrid{c}", "hybrid", {"hybrid_cols": c},
             hybrid_from_interactions(data, cols=c, dtype=jnp.bfloat16))
        )
    if args.tiled:
        from gsrs_tpu.ops.tiled import tiled_from_interactions

        for gc in args.tiled:
            g, c = (int(v) for v in gc.split(":"))
            layouts.append((
                f"tiledG{g}C{c}", "tiled",
                {"tiled_groups": g, "tiled_cols": c},
                tiled_from_interactions(
                    data, groups=g, cols=c, dtype=jnp.bfloat16
                ),
            ))

    for label, mode, extra, layout in layouts:
        mcfg = ModelConfig(
            num_layers=3, embedding_dim=64, bf16_compute=True,
            spmm_mode=mode, **extra,
        )
        for B in args.batch:
            cfg = ExperimentConfig(
                model=mcfg, train=TrainConfig(batch_size=B, tensorboard=False)
            )
            model = build_model(mcfg, graph, ell=layout)
            trainer = Trainer(cfg, data, graph, model, run_eval=False)
            state = trainer.init_state()
            state, _ = trainer.train_epoch(state)  # compile + warm
            t0 = time.time()
            for _ in range(args.timed_epochs):
                state, loss = trainer.train_epoch(state)
            dt = (time.time() - t0) / args.timed_epochs
            print(json.dumps({
                "spmm": label, "batch": B,
                "epoch_s": round(dt, 3),
                "vs_reference_33.5s": round(33.5 / dt, 2),
                "last_loss": round(float(loss), 5),
            }), flush=True)
            del trainer, state, model


if __name__ == "__main__":
    main()
