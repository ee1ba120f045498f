"""Chip probe: the on-device sampler's true cost vs neg_candidates
(round-5 roofline follow-up — the sampler is the dominant per-triplet
train-base cost: tools/probe_l0_base.py measured 0.21 s of the 0.27 s
L0 epoch at b4096, i.e. the earlier 0.7 ms self-timing was tunnel-memo
garbage).

Method (the only one that survived the tunnel): REAL scanned L0-SGD
epochs, sampling INSIDE the jit — one arm per neg_candidates value —
against one arm consuming PRE-BUILT batches. Differences are the
sampler. Then the winning C re-measured on the FULL production step
(3-layer hybrid Adam) to state the end-to-end headline impact.

Usage: python tools/probe_sampler_cost.py [--batch 131072]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cands", type=int, nargs="+", default=[16, 8, 4, 2])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gsrs_tpu.config import ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.hybrid import hybrid_from_interactions
    from gsrs_tpu.ops.sampling import make_sampler_state, sample_epoch

    print(f"[backend] {jax.default_backend()} {jax.devices()}", flush=True)
    ddir = os.path.join(REPO, "data", "gowalla")
    data = load_dataset(ddir, name="gowalla")
    graph = build_graph(data, cache_dir=ddir)
    hg = jax.device_put(
        hybrid_from_interactions(data, cols=8192, dtype=jnp.bfloat16)
    )
    B = args.batch
    steps = -(-data.train_size // B)
    st = jax.device_put(make_sampler_state(data))
    sgd = optax.sgd(1e-3)

    def build(mcfg):
        model = build_model(mcfg, graph, ell=hg)
        return model, model.init_params(jax.random.key(0))

    def make_epoch(model, opt, n_cands):
        def loss_step(carry, batch):
            pp, oo = carry
            ub, pb, nb = batch

            def loss_fn(q):
                loss, aux = model.bpr_loss(q, ub, pb, nb, ell=hg)
                return loss + 1e-4 * aux["reg"]

            v, g = jax.value_and_grad(loss_fn)(pp)
            upd, oo = opt.update(g, oo, pp)
            return (optax.apply_updates(pp, upd), oo), v

        if n_cands:
            def epoch(key, params, ost):
                u, p, n = sample_epoch(
                    key, st, steps * B, B, neg_candidates=n_cands
                )
                (params, ost), losses = jax.lax.scan(
                    loss_step, (params, ost), (u, p, n)
                )
                return params, ost, losses.mean()
        else:
            def epoch(batches, params, ost):
                (params, ost), losses = jax.lax.scan(
                    loss_step, (params, ost), batches
                )
                return params, ost, losses.mean()

        return jax.jit(epoch, donate_argnums=(1, 2))

    def run(model, params0, opt, n_cands, label):
        fn = make_epoch(model, opt, n_cands)
        p = jax.device_put(
            {k: jnp.array(v, copy=True) for k, v in params0.items()}
        )
        o = opt.init(p)
        if n_cands:
            p, o, l = fn(jax.random.key(0), p, o)
            jax.block_until_ready(l)
            t0 = time.time()
            for r in range(1, args.reps + 1):
                p, o, l = fn(jax.random.key(r), p, o)
                jax.block_until_ready(l)
            dt = (time.time() - t0) / args.reps
        else:
            b0 = sample_epoch(jax.random.key(0), st, steps * B, B)
            jax.block_until_ready(b0)
            p, o, l = fn(b0, p, o)
            jax.block_until_ready(l)
            pre = [sample_epoch(jax.random.key(100 + r), st, steps * B, B)
                   for r in range(args.reps)]
            jax.block_until_ready(pre)
            t0 = time.time()
            for br in pre:
                p, o, l = fn(br, p, o)
                jax.block_until_ready(l)
            dt = (time.time() - t0) / args.reps
        print(json.dumps({"arm": label, "epoch_s": round(dt, 4)}), flush=True)
        return dt

    # L0 arms: sampler cost isolated
    mcfg0 = ModelConfig(
        spmm_mode="hybrid", hybrid_cols=8192, num_layers=0,
        embedding_dim=64, bf16_compute=True,
    )
    model0, params0 = build(mcfg0)
    base = run(model0, params0, sgd, 0, "L0_prebuilt")
    for c in args.cands:
        dt = run(model0, params0, sgd, c, f"L0_sample_C{c}")
        print(json.dumps({"sampler_cost_s": {f"C{c}": round(dt - base, 4)}}),
              flush=True)

    # full production step at default vs best C
    mcfg3 = ModelConfig(
        spmm_mode="hybrid", hybrid_cols=8192, num_layers=3,
        embedding_dim=64, bf16_compute=True,
    )
    model3, params3 = build(mcfg3)
    adam = optax.adam(1e-3)
    for c in (16, min(args.cands)):
        run(model3, params3, adam, c, f"full_hybrid_adam_C{c}")


if __name__ == "__main__":
    main()
