"""Profile the UltraGCN 'pool' estimator's per-step cost (VERDICT r3 item 3).

The committed Bernoulli-inclusion 'pool' estimator was designed for
"batch-like cost" but measured 32.7 s/epoch (b512, ~1583 steps → ~21
ms/step) vs 'batch' at ~0.7 ms/step — results/ug-pool-n800.log. This
tool times each candidate component of one pool step in isolation AND
the full fwd+bwd for pool vs batch vs none, on the real chip, to find
the wall.

Suspects (gsrs_tpu/models/ultragcn.py 'pool' branch):
  1. jax.random.bernoulli over (B, P) = (512, 8192) — 4.2M threefry draws
  2. the (P,) pool gather + its scatter-add cotangent
  3. the (B, P) elementwise weight/softplus field
  4. something outside the branch (shared terms scale with P?)

Usage: python tools/profile_ug_pool.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, *args, reps=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from gsrs_tpu.config import ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.train.optim import make_optimizer
    from gsrs_tpu.config import TrainConfig
    import optax

    data = load_dataset(os.path.join(REPO, "data", "gowalla"))
    graph = build_graph(data)
    B, P, N, d = 512, 8192, 800, 64
    m = data.m_items

    key = jax.random.key(0)
    users = jnp.arange(B, dtype=jnp.int32) % data.n_users
    pos = jnp.arange(B, dtype=jnp.int32) % m
    neg = (jnp.arange(B, dtype=jnp.int32) * 7) % m

    # ---- micro pieces
    emb = jax.random.normal(jax.random.key(1), (m, d))
    uemb = jax.random.normal(jax.random.key(2), (B, d))

    r = {}
    r["bernoulli(B,P)"] = timed(
        jax.jit(lambda k: jax.random.bernoulli(k, N / P, (B, P))), key
    )
    # candidate replacement: the stateless per-cell hash used for edge
    # dropout (ops/hashdrop.py) — no threefry, pure elementwise ALU
    from gsrs_tpu.ops.hashdrop import hash_keep, hashdrop_from_key

    def hash_include(k):
        drop = hashdrop_from_key(k, N / P)
        return hash_keep(
            jnp.arange(B, dtype=jnp.uint32)[:, None],
            jnp.arange(P, dtype=jnp.uint32)[None, :],
            drop,
        )

    r["hash_include(B,P)"] = timed(jax.jit(hash_include), key)
    r["randint(P)+gather"] = timed(
        jax.jit(
            lambda k, e: e[jax.random.randint(k, (P,), 0, m)]
        ),
        key, emb,
    )
    r["matmul(B,d)x(d,P)"] = timed(
        jax.jit(
            lambda u, e: jnp.dot(
                u.astype(jnp.bfloat16),
                e[:P].T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        ),
        uemb, emb,
    )

    def pool_neg_term(k, uemb, emb):
        k1, k2 = jax.random.split(k)
        pool = jax.random.randint(k1, (P,), 0, m)
        ne = emb[pool]
        s = jnp.dot(
            uemb.astype(jnp.bfloat16),
            ne.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        inc = jax.random.bernoulli(k2, N / P, (B, P))
        w = 1.0 + inc.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(inc, axis=1), 1).astype(jnp.float32)
        return jnp.sum(jnp.sum(w * jax.nn.softplus(s), axis=1) / denom)

    r["pool_neg_term fwd"] = timed(jax.jit(pool_neg_term), key, uemb, emb)
    r["pool_neg_term fwd+bwd"] = timed(
        jax.jit(jax.grad(pool_neg_term, argnums=2)), key, uemb, emb
    )

    # ---- full model step (fwd+bwd+adam), per estimator
    for mode in ("batch", "pool", "none"):
        cfg = ModelConfig(
            model="ultragcn", embedding_dim=d, bf16_compute=True,
            ug_neg_sharing=mode, ug_neg_num=N, ug_neg_pool=P,
            ug_neg_weight=300.0, ug_lambda=2.75, ug_ii_k=10,
        )
        model = build_model(cfg, graph)
        params = model.init_params(jax.random.key(0))
        optimizer, _ = make_optimizer(
            TrainConfig(lr=1e-4, decay=1e-4), steps_per_epoch=1
        )
        opt_state = optimizer.init(params)

        def step(p, o, g, k):
            def loss_fn(pp):
                loss, aux = model.bpr_loss(
                    pp, users, pos, neg, dropout_key=k, graph=g
                )
                return loss + 1e-4 * aux["reg"]

            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, o2 = optimizer.update(grads, o, p)
            return optax.apply_updates(p, upd), o2, loss

        jstep = jax.jit(step, donate_argnums=(0, 1))
        # warm: donation means we must thread fresh states
        p2, o2, _ = jstep(params, opt_state, model.graph, key)
        jax.block_until_ready(p2)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            p2, o2, loss = jstep(p2, o2, model.graph, key)
        jax.block_until_ready(loss)
        r[f"full_step[{mode}]"] = (time.perf_counter() - t0) / reps * 1e3

    for k, v in r.items():
        print(json.dumps({"op": k, "ms": round(v, 3)}), flush=True)


if __name__ == "__main__":
    main()
