"""Driver benchmark: Gowalla LightGCN epoch wall time on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published Gowalla epoch time of ~31-36 s/epoch
(3 layers, dim 64, batch 2048, of which ~16 s is host-side C++ sampling —
BASELINE.md, reference LightGCN_work/README.md:48-63). We use the
midpoint 33.5 s. ``vs_baseline`` is the speedup factor
(baseline_seconds / our_seconds; >1 = faster than the reference).

The measured config is the fastest one that holds QUALITY PARITY with
the reference's published Gowalla numbers (recall@20 0.1825): 3 layers,
dim 64, batch 131072, TILED SpMM (per-row-group dense hub blocks over
the deterministic spectral cluster order + residual ELL; G=64 groups,
C=2048 hub columns per group — the round-5 A/B winner,
results/bench_spmm_tiled_b131072.log), bf16, the 4-candidate on-device
sampler (`--neg_candidates 4`; accept-a-positive bias floor rho^4 ~
1e-12 per triplet at Gowalla densities), full 810,128-interaction
epochs — sampling is *included* in our epoch time (it runs on-device).
Quality evidence at THIS exact config (tiled G64xC2048 + C4, seed
2020): results/b131072-tiled-c4{-valid.csv,.log} — recall/ndcg/prec@20
0.183424/0.156257/0.056013, above the reference's published
0.1824/0.1547/0.05589 AND its own best recorded run
0.18250/0.15456/0.05596 on all three metrics; THIS exact config is
seed-replicated (results/b131072-tiledc4-seed*-valid.csv: recall
0.183527 +/- 0.00014, mean-sigma above the reference's best run on all
three metrics), plus 5 hybrid-layout seeds (mean 0.18310 +/- 0.00053,
`python tools/seed_stats.py`). The cheaper neg_candidates=0 sampler
(0.26 s/epoch) was measured quality-NEGATIVE (recall 0.18190, below
the bar — results/b131072-tiledc0*) and is deliberately NOT the bench
config. lr 8e-3 = sqrt-scaled from the reference's 1e-3
at 64x batch, MultiStepLR [750,900,1050] gamma 0.5 — the reference's
own scheduler mechanism (reference code/parse.py:76-82); re-derive
with `python quality_bench.py`. The b65536 point (0.63 s, recall
0.183429) is the project's best QUALITY at any batch. Tiled SpMM is
train-step equality-tested against ELL (tests/test_tiled.py), and ELL
matches segment-sum to 1e-10 in gradients. The hybrid b131072
(0.52-0.53 s), b8192 (2.85 s, 0.18280), b16384 (1.6 s, 0.18275),
b32768 (0.93 s, 0.18338) parity points remain tracked in results/.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_EPOCH_SECONDS = 33.5
N_TIMED_EPOCHS = 3


def ensure_gowalla() -> str:
    ddir = os.path.join(REPO, "data", "gowalla")
    if not os.path.exists(os.path.join(ddir, "train.txt")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "recover_gowalla.py")],
            check=True,
        )
    return ddir


def wait_for_tpu(max_wait_s: int = 900) -> None:
    """The axon TPU grant can be wedged for ~10 min after an unclean client
    exit (every new client futex-blocks). Probe with short-lived
    subprocesses until a tiny matmul succeeds, so the bench never starts
    into a wedged chip."""
    deadline = time.time() + max_wait_s
    probe = (
        "import jax, jax.numpy as jnp;"
        # refuse the CPU fallback: this bench's numbers are only meaningful
        # on the accelerator (platform is 'tpu'/'axon', never 'cpu')
        "assert jax.devices()[0].platform != 'cpu', jax.devices();"
        "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))"
    )
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=120,
                capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("# warning: TPU probe never succeeded; proceeding anyway", file=sys.stderr)
            return
        time.sleep(60)


def main() -> None:
    ddir = ensure_gowalla()
    wait_for_tpu()

    import jax.numpy as jnp

    from gsrs_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.tiled import tiled_from_interactions
    from gsrs_tpu.train.trainer import Trainer

    data = load_dataset(ddir, name="gowalla")
    graph = build_graph(data, cache_dir=ddir)
    cfg = ExperimentConfig(
        model=ModelConfig(
            num_layers=3,
            embedding_dim=64,
            bf16_compute=True,
            spmm_mode="tiled",
            tiled_groups=64,
            tiled_cols=2048,
        ),
        train=TrainConfig(
            batch_size=131072, tensorboard=False, neg_candidates=4
        ),
    )
    model = build_model(
        cfg.model,
        graph,
        ell=tiled_from_interactions(data, groups=64, cols=2048, dtype=jnp.bfloat16),
    )
    trainer = Trainer(cfg, data, graph, model, run_eval=False)
    state = trainer.init_state()

    # warm-up epoch (includes compile)
    state, _ = trainer.train_epoch(state)
    t0 = time.time()
    for _ in range(N_TIMED_EPOCHS):
        state, loss = trainer.train_epoch(state)
    epoch_seconds = (time.time() - t0) / N_TIMED_EPOCHS

    print(
        json.dumps(
            {
                "metric": "gowalla_epoch_time",
                "value": round(epoch_seconds, 3),
                "unit": "s/epoch",
                "vs_baseline": round(BASELINE_EPOCH_SECONDS / epoch_seconds, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
