"""Re-probe Pallas for a gather idiom that beats XLA's issue rate
(VERDICT r1 item 8b).

Round 1 found Mosaic exposes no vectorized VMEM gather (`jnp.take` /
`take_along_axis` / fori row-copies all failed to lower), capping the
ELL SpMM at XLA's ~300M gathered rows/s. This probe tries the remaining
idiom: HBM-resident table + PrefetchScalarGridSpec indices + per-row
async DMA copies (HBM→VMEM) with K copies in flight, then a VMEM
reduction. If the DMA engines can beat ~300M rows/s for 256 B rows this
becomes the ELL gather backend; if per-copy overhead dominates (the
expected outcome for sub-KB descriptors) the negative result is recorded
in BENCH_NOTES with numbers.

Usage (real chip): python tools/probe_pallas_gather.py [--rows 20]
"""

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 16, help="table rows")
    ap.add_argument("--d", type=int, default=64, help="feature width")
    ap.add_argument("--m", type=int, default=1 << 18, help="gathered rows")
    ap.add_argument("--block", type=int, default=256, help="rows per grid step")
    ap.add_argument("--inflight", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, D, M, B, K = args.n, args.d, args.m, args.block, args.inflight
    assert M % B == 0

    def kernel(idx_ref, x_hbm, out_ref, scratch, sems):
        i = pl.program_id(0)

        def start(j):
            row = idx_ref[i * B + j]
            pltpu.make_async_copy(
                x_hbm.at[row], scratch.at[j % (2 * K)], sems.at[j % (2 * K)]
            ).start()

        def wait(j):
            row = idx_ref[i * B + j]
            pltpu.make_async_copy(
                x_hbm.at[row], scratch.at[j % (2 * K)], sems.at[j % (2 * K)]
            ).wait()

        # software pipeline: K copies in flight
        for j in range(K):
            start(j)

        def body(j, acc):
            wait(j)
            row_val = scratch[j % (2 * K)]

            @pl.when(j + K < B)
            def _():
                start(j + K)

            return acc + jnp.sum(row_val)

        acc = jax.lax.fori_loop(0, B, body, jnp.float32(0.0))
        # scalar result into the whole-array SMEM block at this step's
        # row — Mosaic cannot store scalars to VMEM, and per-step (1,1)
        # blocks fail the (8,128)-divisibility rule (round-3 findings)
        out_ref[i, 0] = acc

    x = jnp.asarray(np.random.default_rng(0).normal(size=(N, D)).astype(np.float32))
    idx = jnp.asarray(np.random.default_rng(1).integers(0, N, M).astype(np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        # whole-array SMEM output block: scalars cannot be stored to
        # VMEM, and this Mosaic requires blocks either (8,128)-divisible
        # or equal to the full array — (1,1) per-step blocks are neither
        # (both walls recorded in results/probe_pallas_gather.log)
        out_specs=pl.BlockSpec(
            (M // B, 1), lambda i, *_: (0, 0), memory_space=pltpu.SMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * K, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * K,)),
        ],
    )

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M // B, 1), jnp.float32),
        grid_spec=grid_spec,
    )

    try:
        out = jax.block_until_ready(fn(idx, x))[:, 0]
    except Exception as e:
        print(json.dumps({
            "result": "DOES_NOT_LOWER",
            "error": f"{type(e).__name__}: {str(e)[:400]}",
        }))
        return

    # correctness spot-check
    ref = np.add.reduceat(
        np.asarray(x)[np.asarray(idx)].sum(axis=1), np.arange(0, M, B)
    )
    ok = np.allclose(np.asarray(out), ref, rtol=1e-4)

    # XLA baseline: same gather+rowsum via jnp.take (consumer prevents
    # folding per round-1's methodology note)
    @jax.jit
    def xla_gather(idx, x):
        g = jnp.take(x, idx, axis=0)
        return jnp.sum(g.reshape(M // B, B, D), axis=(1, 2))

    jax.block_until_ready(xla_gather(idx, x))

    def bench(f, *a, reps=5):
        t0 = time.time()
        for _ in range(reps):
            jax.block_until_ready(f(*a))
        return (time.time() - t0) / reps

    t_pallas = bench(fn, idx, x)
    t_xla = bench(xla_gather, idx, x)
    print(json.dumps({
        "result": "LOWERED",
        "correct": bool(ok),
        "rows": M,
        "row_bytes": D * 4,
        "pallas_dma_s": round(t_pallas, 5),
        "pallas_rows_per_s": round(M / t_pallas / 1e6, 1),
        "xla_take_s": round(t_xla, 5),
        "xla_rows_per_s_M": round(M / t_xla / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
