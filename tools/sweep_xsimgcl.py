"""Short-horizon hyperparameter sweep for XSimGCL on a real dataset.

Runs each (cl_lambda, cl_eps) config for a fixed small number of epochs
with periodic evals and prints the trajectories — enough to pick the
contrastive strength before committing to a full run.

Usage:
  python tools/sweep_xsimgcl.py --dataset gowalla --epochs 75 \
      --lambdas 0.05 0.1 0.2 [--eps 0.2] [--batch 8192] [--bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gowalla")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--epochs", type=int, default=75)
    ap.add_argument("--eval_every", type=int, default=25)
    ap.add_argument("--lambdas", type=float, nargs="+", default=[0.05, 0.1, 0.2])
    ap.add_argument("--eps", type=float, nargs="+", default=[0.2])
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--layer", type=int, default=3)
    ap.add_argument("--recdim", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    from gsrs_tpu.config import (
        EvalConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
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
    ell = ell_from_interactions(data)

    for lam in args.lambdas:
        for eps in args.eps:
            cfg = ExperimentConfig(
                model=ModelConfig(
                    model="xsimgcl",
                    num_layers=args.layer,
                    embedding_dim=args.recdim,
                    bf16_compute=args.bf16,
                    cl_lambda=lam,
                    cl_eps=eps,
                ),
                train=TrainConfig(
                    batch_size=args.batch, tensorboard=False,
                    checkpoint_dir=os.path.join(
                        "/tmp", f"sweep_l{lam}_e{eps}"
                    ),
                ),
                eval=EvalConfig(test_batch=2048, topks=(20,)),
            )
            model = build_model(cfg.model, graph, ell=ell)
            trainer = Trainer(cfg, data, graph, model)
            state = trainer.init_state()
            print(f"=== cl_lambda={lam} cl_eps={eps} ===", flush=True)
            t0 = time.time()
            while state.epoch < args.epochs:
                state, loss = trainer.train_epoch(state)
                if state.epoch % args.eval_every == 0 or state.epoch == args.epochs:
                    m = trainer.evaluate(state)
                    print(
                        f"  e{state.epoch} loss={loss:.4f} "
                        + " ".join(f"{k}={v:.5f}" for k, v in sorted(m.items())),
                        flush=True,
                    )
            print(f"  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
