"""Chip probe: threshold-select exact top-k vs lax.top_k (VERDICT r4
item 2 — the eval wall: top-k is 75% of eval scan time, 15x above its
bandwidth floor at amazon scale, results/profile_eval_phases.log).

Times one dispatch of N chained iterations (lax.scan) per variant —
repeated identical dispatches short-circuit through the tunnel, and a
chained dispatch must stay well under the ~2 min worker-fault onset, so
N is kept small at the big shape.

Usage: python tools/probe_topk_threshold.py [--iters 20]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from gsrs_tpu.ops.topk import NEG_INF, topk_threshold


def bench(fn, scores, iters):
    """One dispatch: scan `iters` top-k calls, each on a slightly
    perturbed copy so no iteration can be CSE'd away. The perturbation
    add is one HBM pass — identical across variants, and reported so the
    floor is visible."""

    def run(s0):
        # s0 must come in as the jit ARGUMENT (not a closure capture):
        # through the tunnel a captured 300+ MB constant is baked into
        # the compile payload and the remote_compile endpoint 413s.
        def body(carry, i):
            s = s0 + i * 1e-7
            v, ix = fn(s)
            return carry + v.sum() + ix.sum(), None

        return jax.lax.scan(
            body, jnp.float32(0), jnp.arange(iters, dtype=jnp.float32)
        )[0]

    g = jax.jit(run)
    r = g(scores)
    r.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    r = g(scores)
    r.block_until_ready()
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()
    print(f"[backend] {jax.default_backend()} {jax.devices()}")

    shapes = [
        ("gowalla-evalbatch", 2048, 40960),
        ("amazon-evalbatch", 2048, 91648),
        ("pod-catalog", 1024, 262144),
    ]
    rng = np.random.default_rng(0)
    for name, B, m in shapes:
        s = rng.standard_normal((B, m)).astype(np.float32)
        mask = rng.random((B, m)) < (28.0 / m)  # ~avg-degree train mask
        s[mask] = float(NEG_INF)
        scores = jnp.asarray(s)
        bytes_rw = B * m * 4
        floor_ms = bytes_rw / 819e9 * 1e3  # one HBM read at ~819 GB/s
        res = {"shape": name, "B": B, "m": m,
               "hbm_read_floor_ms": round(floor_ms, 3)}
        for label, fn in [
            ("lax_top_k", lambda x: jax.lax.top_k(x, args.k)),
            ("threshold", lambda x: topk_threshold(x, args.k)),
            ("approx", lambda x: jax.lax.approx_max_k(
                x, args.k, recall_target=0.98, aggregate_to_topk=True)),
        ]:
            try:
                ms = bench(fn, scores, args.iters) * 1e3
                res[label + "_ms"] = round(ms, 3)
            except Exception as e:  # noqa: BLE001
                res[label + "_ms"] = f"ERR {type(e).__name__}: {e}"[:120]
        if isinstance(res.get("lax_top_k_ms"), float) and isinstance(
            res.get("threshold_ms"), float
        ):
            res["speedup"] = round(res["lax_top_k_ms"] / res["threshold_ms"], 2)
        print(json.dumps(res), flush=True)

    # exactness smoke on-chip at the big shape (fp32 scores)
    s = rng.standard_normal((256, 91648)).astype(np.float32)
    v1, i1 = jax.jit(lambda x: topk_threshold(x, args.k))(jnp.asarray(s))
    v2, i2 = jax.jit(lambda x: jax.lax.top_k(x, args.k))(jnp.asarray(s))
    ok_v = bool(jnp.array_equal(v1, v2))
    ok_i = bool(jnp.array_equal(i1, i2))
    print(json.dumps({"onchip_exactness": {"values": ok_v, "indices": ok_i}}))


if __name__ == "__main__":
    main()
