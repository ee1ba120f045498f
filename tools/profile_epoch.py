"""Capture a jax.profiler trace + phase timings over a few train epochs.

The reference's live profiling is wall-clock deltas written into CSV
time_sec columns (reference code/main.py:215,230-233); this tool adds the
real thing for TPU: an XLA/TPU profiler trace (viewable in TensorBoard's
profile plugin or Perfetto) plus the named-tape phase summary.

Usage:
  python tools/profile_epoch.py --dataset gowalla --epochs 2 \
      --trace_dir /tmp/gsrs_trace [--bf16] [--bpr_batch 8192]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gowalla")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--bpr_batch", type=int, default=2048)
    ap.add_argument("--layer", type=int, default=3)
    ap.add_argument("--recdim", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--trace_dir", default=None, help="jax.profiler output dir")
    ap.add_argument(
        "--eval", action="store_true",
        help="also profile full-catalog evals (propagation + scan dispatch)",
    )
    args = ap.parse_args()

    from gsrs_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.train.trainer import Trainer
    from gsrs_tpu.utils.timer import Timer, profile_trace

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ddir = os.path.join(args.data_root or os.path.join(repo, "data"), args.dataset)
    with Timer.named("load_data"):
        data = load_dataset(ddir, name=args.dataset)
        graph = build_graph(data, cache_dir=ddir)
        ell = ell_from_interactions(data)
    cfg = ExperimentConfig(
        model=ModelConfig(
            num_layers=args.layer,
            embedding_dim=args.recdim,
            bf16_compute=args.bf16,
        ),
        train=TrainConfig(batch_size=args.bpr_batch, tensorboard=False),
    )
    model = build_model(cfg.model, graph, ell=ell)
    trainer = Trainer(cfg, data, graph, model, run_eval=args.eval)
    with Timer.named("init"):
        state = trainer.init_state()
    with Timer.named("warmup_epoch_incl_compile"):
        state, _ = trainer.train_epoch(state)
    if trainer.evaluator is not None:
        with Timer.named("warmup_eval_incl_compile"):
            trainer.evaluator.run(state.params)
    with profile_trace(args.trace_dir):
        for _ in range(args.epochs):
            with Timer.named("epoch"):
                state, loss = trainer.train_epoch(state)
            if trainer.evaluator is not None:
                with Timer.named("eval"):
                    trainer.evaluator.run(state.params)
    print(Timer.summary())
    if args.trace_dir:
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
