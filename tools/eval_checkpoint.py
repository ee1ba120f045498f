"""Evaluate a saved checkpoint on the full test split (one-off).

Usage:
  python tools/eval_checkpoint.py --checkpoint_dir checkpoints/long_b8192 \
      --dataset gowalla [--bf16] [--layer 3] [--recdim 64] [--topks "[20]"]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--dataset", default="gowalla")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--model", default="lgn")
    ap.add_argument("--layer", type=int, default=3)
    ap.add_argument("--recdim", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--topks", default="[20]")
    ap.add_argument("--testbatch", type=int, default=2048)
    args = ap.parse_args()

    from gsrs_tpu.config import (
        EvalConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
        topks_from_string,
    )
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.train.trainer import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ddir = os.path.join(args.data_root or os.path.join(repo, "data"), args.dataset)
    data = load_dataset(ddir, name=args.dataset)
    graph = build_graph(data, cache_dir=ddir)
    cfg = ExperimentConfig(
        model=ModelConfig(
            model=args.model,
            num_layers=args.layer,
            embedding_dim=args.recdim,
            bf16_compute=args.bf16,
        ),
        train=TrainConfig(
            checkpoint_dir=args.checkpoint_dir, resume=True, tensorboard=False
        ),
        eval=EvalConfig(
            test_batch=args.testbatch, topks=topks_from_string(args.topks)
        ),
    )
    model = build_model(cfg.model, graph, ell=ell_from_interactions(data))
    trainer = Trainer(cfg, data, graph, model)
    state = trainer.maybe_resume(trainer.init_state())
    print(f"[eval] checkpoint epoch {state.epoch}")
    metrics = trainer.evaluate(state)
    print(
        f"[eval e{state.epoch}] "
        + " ".join(f"{k}={v:.5f}" for k, v in sorted(metrics.items()))
    )


if __name__ == "__main__":
    main()
