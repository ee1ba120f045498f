"""Fused-Adam chip probe (round-5 roofline follow-up).

The train roofline measured the Adam-vs-SGD delta at ~8 ms/step at
b131072 — ~50x the moment-traffic floor — because XLA runs the optax
chain as separate passes over the dense tables. train/fused_adam.py
computes the identical update in one pass per leaf (jnp fused
expression, or an explicit Pallas kernel with aliased outputs). This
probe A/Bs REAL production epochs (same method as
roofline_train_epochs.py — prefix pipelines are unusable through the
tunnel) across optimizer backends on the current fastest SpMM layout.

Usage: python tools/probe_fused_adam.py [--batch 131072] [--epochs 3]
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
    ap.add_argument("--groups", type=int, default=64)
    ap.add_argument("--cols", type=int, default=2048)
    ap.add_argument(
        "--neg_candidates", type=int, default=16,
        help="sampler candidates per triplet (the headline-combination "
        "arm passes 4; quality evidence: results/b131072-tiled-c4)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsrs_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.tiled import tiled_from_interactions
    from gsrs_tpu.train.trainer import Trainer

    print(f"[backend] {jax.default_backend()} {jax.devices()}", flush=True)
    ddir = os.path.join(REPO, "data", "gowalla")
    data = load_dataset(ddir, name="gowalla")
    graph = build_graph(data, cache_dir=ddir)
    layout = tiled_from_interactions(
        data, groups=args.groups, cols=args.cols, dtype=jnp.bfloat16
    )
    mcfg = ModelConfig(
        num_layers=3, embedding_dim=64, bf16_compute=True,
        spmm_mode="tiled", tiled_groups=args.groups, tiled_cols=args.cols,
    )

    losses = {}
    for fused in ["off", "jnp", "pallas", "off2"]:
        mode = "off" if fused == "off2" else fused
        cfg = ExperimentConfig(
            model=mcfg,
            train=TrainConfig(
                batch_size=args.batch, tensorboard=False, fused_adam=mode,
                neg_candidates=args.neg_candidates,
            ),
        )
        model = build_model(mcfg, graph, ell=layout)
        tr = Trainer(cfg, data, graph, model, run_eval=False)
        st = tr.init_state()
        st, _ = tr.train_epoch(st)  # compile + warm
        t0 = time.time()
        for _ in range(args.epochs):
            st, loss = tr.train_epoch(st)
        dt = (time.time() - t0) / args.epochs
        losses[fused] = float(loss)
        print(json.dumps({
            "arm": fused, "batch": args.batch,
            "epoch_s": round(dt, 4),
            "vs_reference_33.5s": round(33.5 / dt, 2),
            "loss_e4": round(float(loss), 5),
        }), flush=True)
        del tr, st, model

    # same RNG stream + same update math -> trajectories must agree
    drift = max(abs(losses[k] - losses["off"]) for k in losses)
    print(json.dumps({"max_loss_drift_vs_off": round(drift, 6)}), flush=True)


if __name__ == "__main__":
    main()
