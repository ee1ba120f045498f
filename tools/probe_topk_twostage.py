"""Probe: two-stage EXACT top-k vs lax.top_k at eval shapes.

lax.top_k on TPU is sort-based; at (B, m) = (2048, 91599) it may
dominate eval time (see tools/profile_eval_phases.py). An exact
two-stage form — reshape the row into m/blk blocks, take top-k per
block (every true top-k element survives: a row-global top-k element is
also top-k within its block), gather the B x (nblocks*k) candidates,
top-k the candidates — replaces one full-width sort with a much
narrower one plus a blocked pass.

`lax.approx_max_k` does a related reduction but trades recall; this is
EXACT. If the win is real, it becomes topk_method='exact' internals.

Usage: python tools/probe_topk_twostage.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    k = 20
    # 94208 = amazon-book's 91,599 padded to 4096-blocks; 40960 ~ gowalla
    for B, m in ((2048, 94208), (2048, 40960)):
        x = jax.random.normal(jax.random.key(0), (B, m), jnp.float32)

        def plain(s):
            return jax.lax.top_k(s, k)

        def two_stage(s, blk=4096):
            nb = s.shape[1] // blk
            sb = s.reshape(s.shape[0], nb, blk)
            v1, i1 = jax.lax.top_k(sb, k)  # (B, nb, k) within blocks
            base = (jnp.arange(nb, dtype=jnp.int32) * blk)[None, :, None]
            cand_v = v1.reshape(s.shape[0], nb * k)
            cand_i = (i1 + base).reshape(s.shape[0], nb * k)
            v2, sel = jax.lax.top_k(cand_v, k)
            return v2, jnp.take_along_axis(cand_i, sel, axis=1)

        r = {"B": B, "m": m}
        r["lax.top_k_ms"] = round(timed(jax.jit(plain), x), 3)
        for blk in (2048, 4096, 8192):
            if m % blk:
                continue
            f = jax.jit(lambda s, b=blk: two_stage(s, b))
            r[f"two_stage_blk{blk}_ms"] = round(timed(f, x), 3)
        # exactness check (values must match bit-for-bit)
        v_ref, i_ref = jax.jit(plain)(x)
        v_2, i_2 = jax.jit(lambda s: two_stage(s, 4096))(x)
        r["values_equal"] = bool(jnp.array_equal(v_ref, v_2))
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
