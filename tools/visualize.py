"""Training-curve and pop-gate visualization.

Working replacement for the reference's visualize_lightgcn.py (which
imports a nonexistent module and a stale checkpoint schema — reference
code/visualize_lightgcn.py:6,34):

- plot_training_curves: loss/lr/metric curves from the two CSVs written
  by the trainer (same schemas as reference code/main.py:98-133)
- plot_gate_distribution: histogram of pop-gate values vs item popularity
  for a trained pop-gate checkpoint

Usage:
  python tools/visualize.py curves --checkpoint_dir checkpoints [--out curves.png]
  python tools/visualize.py gates --checkpoint_dir checkpoints --dataset_dir data/gowalla
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plot_training_curves(checkpoint_dir: str, out: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    train_csv = os.path.join(checkpoint_dir, "train_epoch_metrics.csv")
    valid_csv = os.path.join(checkpoint_dir, "valid_epoch_metrics.csv")
    if os.path.exists(train_csv):
        df = pd.read_csv(train_csv)
        axes[0].plot(df["epoch"], df["train_loss"])
        axes[0].set_title("BPR train loss")
        axes[0].set_xlabel("epoch")
        axes[1].plot(df["epoch"], df["lr"])
        axes[1].set_title("learning rate")
        axes[1].set_xlabel("epoch")
    if os.path.exists(valid_csv):
        df = pd.read_csv(valid_csv)
        for col in df.columns:
            if col.startswith(("recall@", "ndcg@", "precision@")):
                axes[2].plot(df["epoch"], df[col], label=col)
        axes[2].set_title("eval metrics")
        axes[2].set_xlabel("epoch")
        axes[2].legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def plot_gate_distribution(checkpoint_dir: str, dataset_dir: str, out: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gsrs_tpu.config import ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.train.checkpoint import CheckpointManager

    data = load_dataset(dataset_dir)
    graph = build_graph(data, cache_dir=dataset_dir)
    # rebuild the model from the hyperparameters the trainer persisted —
    # hardcoded defaults (layers=3, temp=1.0) would plot gates the
    # deployed model never produces
    import json
    import os

    meta_path = os.path.join(checkpoint_dir, "model_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            cfg = ModelConfig(**json.load(f))
        if not cfg.use_pop_gate:
            raise SystemExit(
                f"{meta_path} says this checkpoint was trained without "
                f"the pop gate — nothing to plot"
            )
    else:
        cfg = ModelConfig(use_pop_gate=True)
    model = build_model(cfg, graph)
    mgr = CheckpointManager(checkpoint_dir)
    path = mgr.resolve_resume_path(None)
    if path is None:
        raise SystemExit(f"no checkpoint found under {checkpoint_dir}")
    import orbax.checkpoint as ocp

    full = ocp.StandardCheckpointer().restore(path)
    params = full["params"]

    _, items, gate = model.final_embeddings(params)
    gate = np.asarray(gate)
    pop = np.log1p(np.asarray(data.item_degrees))

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(gate, bins=50)
    axes[0].set_title("pop-gate value distribution")
    axes[0].set_xlabel("gate (1 = keep graph emb)")
    axes[1].scatter(pop, gate, s=2, alpha=0.3)
    axes[1].set_title("gate vs log1p(popularity)")
    axes[1].set_xlabel("log1p(item degree)")
    axes[1].set_ylabel("gate")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("curves")
    c.add_argument("--checkpoint_dir", required=True)
    c.add_argument("--out", default="curves.png")
    g = sub.add_parser("gates")
    g.add_argument("--checkpoint_dir", required=True)
    g.add_argument("--dataset_dir", required=True)
    g.add_argument("--out", default="gates.png")
    args = ap.parse_args()
    if args.cmd == "curves":
        plot_training_curves(args.checkpoint_dir, args.out)
    else:
        plot_gate_distribution(args.checkpoint_dir, args.dataset_dir, args.out)


if __name__ == "__main__":
    main()
