"""Scale stand-ins for the stripped reference datasets (VERDICT r1 item 5).

The reference publishes quality tables for yelp2018 (31,668 × 38,048)
and amazon-book (52,643 × 91,599) — reference LightGCN_work/README.md:
96-103 — but their train.txt files were stripped from the snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so no run at those scales is
possible on the real data. This harness validates the FRAMEWORK at those
shapes on one chip with power-law synthetics: train epoch time (ELL and
hybrid SpMM), eval time/throughput, and device memory in use.

Usage: python tools/bench_scale_standin.py [--spmm ell hybrid] [--batch 2048 8192]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHAPES = {
    # avg_degree chosen to match the real datasets' interaction counts:
    # yelp2018 ~1.56M over 31,668 users (~49), amazon-book ~2.98M over
    # 52,643 users (~57) (reference data READMEs / SURVEY C21)
    "yelp2018-scale": dict(n_users=31668, m_items=38048, avg_degree=49),
    "amazon-book-scale": dict(n_users=52643, m_items=91599, avg_degree=57),
}


def device_mem_gib():
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        return round(stats["bytes_in_use"] / 2**30, 2)
    except Exception:
        return None


def drive():
    """Run every (shape, spmm, batch) config in its OWN subprocess: a TPU
    worker crash (or tunnel fault) kills one config, not the sweep, and
    the next subprocess re-acquires the chip after a grace wait."""
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--spmm", nargs="+", default=["ell", "hybrid"])
    ap.add_argument("--batch", type=int, nargs="+", default=[2048, 8192])
    ap.add_argument("--shapes", nargs="+", default=list(SHAPES))
    ap.add_argument("--timed_epochs", type=int, default=2)
    ap.add_argument("--hybrid_cols", type=int, default=8192)
    ap.add_argument(
        "--timeout", type=int, default=1800,
        help="per-config subprocess timeout (s); amazon-book-scale b2048 "
        "runs ~1450 steps/epoch x 3 epochs and cannot fit the old 900",
    )
    args = ap.parse_args()

    for shape in args.shapes:
        for spmm in args.spmm:
            for b in args.batch:
                cmd = [
                    sys.executable, os.path.abspath(__file__), "--single",
                    "--shapes", shape, "--spmm", spmm, "--batch", str(b),
                    "--timed_epochs", str(args.timed_epochs),
                    "--hybrid_cols", str(args.hybrid_cols),
                ]
                attempts = (1, 2)
                for attempt in attempts:
                    try:
                        r = subprocess.run(cmd, timeout=args.timeout)
                        if r.returncode == 0:
                            break
                    except subprocess.TimeoutExpired:
                        pass
                    print(json.dumps({
                        "shape": shape, "spmm": spmm, "batch": b,
                        "attempt": attempt, "result": "FAILED",
                    }), flush=True)
                    if attempt < attempts[-1]:
                        time.sleep(60)  # grant-release grace before retry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--spmm", nargs="+", default=["ell", "hybrid"])
    ap.add_argument("--batch", type=int, nargs="+", default=[2048, 8192])
    ap.add_argument("--shapes", nargs="+", default=list(SHAPES))
    ap.add_argument("--timed_epochs", type=int, default=2)
    ap.add_argument("--hybrid_cols", type=int, default=8192)
    args = ap.parse_args()

    import importlib.util

    import jax

    from gsrs_tpu.config import EvalConfig, ExperimentConfig, ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.ops.hybrid import hybrid_from_interactions
    from gsrs_tpu.train.evaluator import Evaluator
    from gsrs_tpu.train.trainer import Trainer

    spec = importlib.util.spec_from_file_location(
        "stress_pod", os.path.join(REPO, "tools", "stress_pod.py")
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    import numpy as np

    for shape_name in args.shapes:
        kw = SHAPES[shape_name]
        data = sp.big_synthetic(seed=0, **kw)
        # held-out split so the eval engine runs (10 items/user)
        rng = np.random.default_rng(1)
        td = {
            int(u): rng.integers(0, data.m_items, 10)
            for u in range(data.n_users)
        }
        data = dataclasses.replace(data, test_dict=td)
        graph = build_graph(data)
        for spmm in args.spmm:
            mcfg = ModelConfig(
                num_layers=3, embedding_dim=64, bf16_compute=True,
                spmm_mode=spmm, hybrid_cols=args.hybrid_cols,
            )
            if spmm == "hybrid":
                import jax.numpy as jnp

                layout = hybrid_from_interactions(
                    data, cols=args.hybrid_cols, dtype=jnp.bfloat16
                )
            else:
                layout = ell_from_interactions(data)
            for B in args.batch:
                cfg = ExperimentConfig(
                    model=mcfg,
                    train=TrainConfig(batch_size=B, tensorboard=False),
                    eval=EvalConfig(test_batch=2048, topks=(20,)),
                )
                model = build_model(mcfg, graph, ell=layout)
                trainer = Trainer(cfg, data, graph, model, run_eval=False)
                state = trainer.init_state()
                state, _ = trainer.train_epoch(state)  # compile + warm
                t0 = time.time()
                for _ in range(args.timed_epochs):
                    state, loss = trainer.train_epoch(state)
                epoch_s = (time.time() - t0) / args.timed_epochs

                ev = Evaluator(data, model, cfg.eval)
                ev.run(state.params)  # compile
                t0 = time.time()
                ev.run(state.params)
                eval_s = time.time() - t0

                print(json.dumps({
                    "shape": shape_name,
                    "spmm": spmm,
                    "batch": B,
                    "train_epoch_s": round(epoch_s, 3),
                    "eval_s": round(eval_s, 3),
                    "eval_users_per_s": round(ev.n_test_users / eval_s),
                    "hbm_gib_in_use": device_mem_gib(),
                    "edges": int(data.train_users.size),
                }), flush=True)
                del trainer, state, ev, model


if __name__ == "__main__":
    if "--single" in sys.argv:
        main()
    else:
        drive()
