"""Flake-rate experiment for the TPU-worker fault story (VERDICT r3 item 2).

History: round 3 claimed single-dispatch executions past ~30 s fault the
TPU worker non-deterministically, and mitigated with the 128-step scan
cap (gsrs_tpu/train/trainer.py). The round-3 four-arm bisect then came
back 4/4 OK — including a "242 s single dispatch" — seemingly
contradicting the theory. BUT: that bisect ran AFTER the scan-cap commit
(970cd61), and its arms used steps_per_scan=0, whose meaning the same
commit changed from "one uncapped scan" to "auto-chunk at 128" — so
every arm was chunked (~40 s max per dispatch) and the single-dispatch
hypothesis was never actually tested. Arm A's loss equals arm C's
bit-for-bit in results/probe_yelp_bisect.log (0.43477447...), which is
only possible if both used the same chunking.

This round-4 version uses steps_per_scan=-1 (force ONE uncapped scan,
restored for exactly this experiment) and runs each arm N times to get a
flake RATE, not a single pass/fail:

  A yelp-shape b2048, ONE 758-step scan (~4 min single dispatch)
  B yelp-shape b2048, gowalla-length 396-step single scan (~2 min)
  C yelp-shape b2048, auto-chunked at 128 steps (mitigated control)
  D gowalla REAL data b2048, 758-step single scan

If A/B/D fault at some rate while C never does → duration theory holds,
auto-chunk is load-bearing. If nobody faults across all reps → the
duration theory is dead and the r3 fault had another cause (the
pre-970cd61 degenerate mega-hub generator is the prime suspect: the
realistic-generator fix landed in the SAME commit as the scan cap, so
the two variables were never separated).

Usage: python tools/probe_yelp_bisect.py --arms A C --reps 5
       python tools/probe_yelp_bisect.py --arm A    # one rep, in-process
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARMS = {
    "A": dict(shape="yelp", epoch_samples=0, steps_per_scan=-1),
    "B": dict(shape="yelp", epoch_samples=810128, steps_per_scan=-1),
    "C": dict(shape="yelp", epoch_samples=0, steps_per_scan=0),
    "D": dict(shape="gowalla", epoch_samples=1552000, steps_per_scan=-1),
}


def run_arm(arm: str):
    import importlib.util

    from gsrs_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.train.trainer import Trainer

    spec = ARMS[arm]
    if spec["shape"] == "yelp":
        s = importlib.util.spec_from_file_location(
            "stress_pod", os.path.join(REPO, "tools", "stress_pod.py")
        )
        sp = importlib.util.module_from_spec(s)
        s.loader.exec_module(sp)
        data = sp.big_synthetic(31668, 38048, avg_degree=49, seed=0)
    else:
        data = load_dataset(os.path.join(REPO, "data", "gowalla"))
    graph = build_graph(data)
    mcfg = ModelConfig(num_layers=3, embedding_dim=64, bf16_compute=True)
    cfg = ExperimentConfig(
        model=mcfg,
        train=TrainConfig(
            batch_size=2048,
            tensorboard=False,
            steps_per_scan=spec["steps_per_scan"],
        ),
    )
    model = build_model(mcfg, graph, ell=ell_from_interactions(data))
    trainer = Trainer(cfg, data, graph, model, run_eval=False)
    if spec["epoch_samples"]:
        trainer.epoch_samples = spec["epoch_samples"]
    state = trainer.init_state()
    t0 = time.time()
    state, loss = trainer.train_epoch(state)
    print(json.dumps({
        "arm": arm, **spec, "result": "OK",
        "epoch_s": round(time.time() - t0, 2), "loss": float(loss),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", default=None, choices=list(ARMS))
    ap.add_argument("--arms", nargs="+", default=list(ARMS), choices=list(ARMS))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    if args.arm:
        run_arm(args.arm)
        return
    tallies = {}
    for arm in args.arms:
        ok = 0
        for rep in range(args.reps):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--arm", arm],
                    timeout=args.timeout,
                )
                status = "OK" if r.returncode == 0 else f"FAULT rc={r.returncode}"
                ok += r.returncode == 0
            except subprocess.TimeoutExpired:
                status = "TIMEOUT"
            print(json.dumps({
                "arm": arm, "rep": rep, **ARMS[arm], "driver_sees": status,
            }), flush=True)
            time.sleep(30)  # grant-release grace after a possible fault
        tallies[arm] = f"{ok}/{args.reps}"
    print(json.dumps({"flake_tally_ok": tallies}), flush=True)


if __name__ == "__main__":
    main()
