"""Probe: two-stage EXACT top-k vs lax.top_k at eval shapes.

lax.top_k on TPU is sort-based; the eval phase profile shows it
dominating eval time (~14 ms/batch at (2048, 91599)). An exact
two-stage form — top-k per 4096-block (every true global top-k element
is top-k within its block), then top-k over the B x (nblocks*k)
candidates — replaces one full-width sort with a narrow one.

Timing method: a first version timed repeated independent dispatches on
identical inputs and reported physically impossible numbers (0.048 ms
for a (2048, 94208) top_k that must read 772 MB — the remote-device
tunnel does not execute such repeats honestly). This version chains
ITERS data-dependent iterations inside ONE dispatch via lax.fori_loop
(the output of each top-k is folded back into the carry), so per-iter
time is real device execution regardless of tunnel semantics.

Usage: python tools/probe_topk_twostage.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    k = 20

    def chained(op):
        """One dispatch: ITERS data-dependent applications of op."""

        def run(s):
            def body(_, carry):
                v, i = op(carry)
                # fold the result into the carry: forces serialization
                return carry.at[:, :k].add(v * 1e-9)

            return jax.lax.fori_loop(0, ITERS, body, s)

        return jax.jit(run)

    def timed_chain(fn, x, reps=3):
        # max(single, avg-of-reps): repeats of an identical dispatch can
        # be short-circuited by the tunnel; a lone blocked call cannot
        out = fn(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(x)
        jax.block_until_ready(out)
        t_single = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        jax.block_until_ready(out)
        t_avg = (time.perf_counter() - t0) / reps
        return max(t_single, t_avg) / ITERS * 1e3

    def two_stage(s, blk):
        nb = s.shape[1] // blk
        sb = s.reshape(s.shape[0], nb, blk)
        v1, i1 = jax.lax.top_k(sb, k)
        base = (jnp.arange(nb, dtype=jnp.int32) * blk)[None, :, None]
        cand_v = v1.reshape(s.shape[0], nb * k)
        cand_i = (i1 + base).reshape(s.shape[0], nb * k)
        v2, sel = jax.lax.top_k(cand_v, k)
        return v2, jnp.take_along_axis(cand_i, sel, axis=1)

    B = 2048
    # 91599 = real amazon catalog (unaligned), 94208 = its 4096-pad,
    # 40960 ~ gowalla-aligned, 65536 = the auto threshold
    for m in (40960, 65536, 91599, 94208):
        x = jax.random.normal(jax.random.key(0), (B, m), jnp.float32)
        r = {"B": B, "m": m}
        r["lax.top_k_ms"] = round(
            timed_chain(chained(lambda s: jax.lax.top_k(s, k)), x), 3
        )
        for blk in (2048, 4096):
            if m % blk == 0:
                r[f"two_stage_blk{blk}_ms"] = round(
                    timed_chain(
                        chained(lambda s, b=blk: two_stage(s, b)), x
                    ),
                    3,
                )
        # exactness (values must match bit-for-bit) where blocks divide m
        if m % 4096 == 0:
            v_ref, _ = jax.jit(lambda s: jax.lax.top_k(s, k))(x)
            v_2, _ = jax.jit(lambda s: two_stage(s, 4096))(x)
            r["values_equal"] = bool(jnp.array_equal(v_ref, v_2))
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
