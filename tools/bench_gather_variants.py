"""Microbench: gather-strategy variants for the ELL SpMM hot loop.

The epoch wall is the row gather (~300M rows/s issue-bound on v5e,
BENCH_NOTES.md). Two hypotheses that could move it without changing the
ELL design:

1. ``promise_in_bounds`` gathers — ELL indices are constructed in-bounds,
   so XLA's default clamp logic is pure overhead if it isn't free.
2. One flat gather per side instead of one gather per width bucket —
   if any part of the 300M rows/s limit is per-dispatch overhead,
   consolidating ~20 bucket gathers into 1 wins.

Run on the real chip:  python tools/bench_gather_variants.py
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n_rows", type=int, default=70839)
    p.add_argument("--n_gather", type=int, default=1_950_000,
                   help="~Gowalla one-side padded slot count")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--buckets", type=int, default=20)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()

    dtype = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (args.n_rows, args.dim), dtype=dtype)
    idx_np = np.random.default_rng(0).integers(
        0, args.n_rows, size=args.n_gather, dtype=np.int32
    )
    idx = jnp.asarray(idx_np)
    # split into uneven "buckets" like the ELL layout produces
    cuts = np.sort(
        np.random.default_rng(1).integers(
            1, args.n_gather, size=args.buckets - 1
        )
    )
    bucket_idx = [jnp.asarray(a) for a in np.split(idx_np, cuts)]

    @jax.jit
    def take_flat(x, idx):
        return jnp.take(x, idx, axis=0).sum(axis=0)

    @jax.jit
    def at_get_flat(x, idx):
        return x.at[idx].get(
            mode="promise_in_bounds", unique_indices=False
        ).sum(axis=0)

    @jax.jit
    def take_buckets(x, *bs):
        return sum(jnp.take(x, b, axis=0).sum(axis=0) for b in bs)

    @jax.jit
    def at_get_buckets(x, *bs):
        return sum(
            x.at[b].get(mode="promise_in_bounds").sum(axis=0) for b in bs
        )

    rows_per_s = lambda t: args.n_gather / t / 1e6
    for name, fn, fargs in [
        ("take, 1 flat gather", take_flat, (x, idx)),
        ("promise_in_bounds, 1 flat gather", at_get_flat, (x, idx)),
        (f"take, {args.buckets} bucket gathers", take_buckets, (x, *bucket_idx)),
        (
            f"promise_in_bounds, {args.buckets} bucket gathers",
            at_get_buckets,
            (x, *bucket_idx),
        ),
    ]:
        t = _timed(fn, *fargs)
        print(f"{name:45s} {t*1e3:8.2f} ms   {rows_per_s(t):8.1f} M rows/s")


if __name__ == "__main__":
    sys.exit(main())
