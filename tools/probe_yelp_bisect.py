"""Bisect the yelp-scale TPU-worker fault (VERDICT r2 item 2).

Facts so far (round 3): the fault reproduces with the REALISTIC
generator (no mega-hub), in the first Trainer.train_epoch at
yelp2018-scale b2048 ELL; gowalla (same code path, 810k edges,
396-step epoch scan) has never faulted; the minimal jitted grad step
at yelp shape runs fine even with the degenerate mega-hub layout.

Remaining variables between the working and faulting programs: graph
shape (31,668×38,048 / 1.55M edges vs 29,858×40,981 / 810k) and epoch
scan length (758 donated-buffer optimizer steps vs 396). This driver
isolates them — each arm in its own subprocess so a worker fault kills
one arm, not the sweep:

  A yelp-shape, full 758-step scan      (repro control → expect fault)
  B yelp-shape, epoch_samples=810128    (gowalla-length 396-step scan)
  C yelp-shape, steps_per_scan=128      (chunked short scans)
  D gowalla REAL data, epoch_samples=1552000 (758-step scan)

If B/C pass while A/D fault → scan length. If B/C fault too → the
graph shape itself. If only A faults → interaction of both.

Usage: python tools/probe_yelp_bisect.py            # driver
       python tools/probe_yelp_bisect.py --arm A    # one arm, in-process
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
    "A": dict(shape="yelp", epoch_samples=0, steps_per_scan=0),
    "B": dict(shape="yelp", epoch_samples=810128, steps_per_scan=0),
    "C": dict(shape="yelp", epoch_samples=0, steps_per_scan=128),
    "D": dict(shape="gowalla", epoch_samples=1552000, steps_per_scan=0),
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
    args = ap.parse_args()
    if args.arm:
        run_arm(args.arm)
        return
    for arm in ARMS:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm", arm],
                timeout=900,
            )
            status = "OK" if r.returncode == 0 else f"FAULT rc={r.returncode}"
        except subprocess.TimeoutExpired:
            status = "TIMEOUT"
        print(json.dumps({"arm": arm, **ARMS[arm], "driver_sees": status}),
              flush=True)
        time.sleep(60)  # grant-release grace after a possible fault


if __name__ == "__main__":
    main()
