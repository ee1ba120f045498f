"""Chip probe: split the L0 per-triplet base (60% of the headline epoch,
BENCH_NOTES round-5 train roofline) into sampler vs loss-pipeline, and
try a hand-fused Adam against the optax chain.

Open questions this answers (round-5 roofline follow-ups):

1. The sampler dispatch self-timed at 0.7 ms/epoch, but that timing ran
   repeated dispatches with fresh keys — and the tunnel's memo key has
   been caught being looser than input contents. Honest split: time the
   L0 epoch twice, once with sampling inside (the production path) and
   once with batches PRE-SAMPLED outside the timed region. The
   difference is the sampler's true cost.
2. Adam measured 0.056 s/epoch over SGD (~50x its moment-traffic
   floor). Arm 3 replaces the optax chain with a hand-fused single-pass
   Adam (one tree_map computing mu/nu/update together) to see whether
   the chain structure (separate update_moment passes + bias
   correction + apply) is what XLA fails to fuse.

Every arm is a REAL scanned epoch (the only timing method that survived
the tunnel — see tools/profile_train_phases.py's refutation note).
Usage: python tools/probe_l0_base.py [--batch 131072] [--layers 0]
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
    ap.add_argument("--layers", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
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
    mcfg = ModelConfig(
        spmm_mode="hybrid", hybrid_cols=8192, num_layers=args.layers,
        embedding_dim=64, bf16_compute=True,
    )
    model = build_model(mcfg, graph, ell=hg)
    params0 = model.init_params(jax.random.key(0))
    st = jax.device_put(make_sampler_state(data))

    def fused_adam(lr=1e-3, b1=0.9, b2=0.999, eps=1e-8):
        """Hand-fused Adam: one pass computing both moments + update per
        leaf (same math as optax.adam/torch Adam incl. bias correction)."""

        def init(params):
            z = jax.tree_util.tree_map(jnp.zeros_like, params)
            return {"mu": z, "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
                    "t": jnp.zeros((), jnp.int32)}

        def update(grads, state, params=None):
            t = state["t"] + 1
            tf = t.astype(jnp.float32)
            c1 = 1.0 - b1 ** tf
            c2 = 1.0 - b2 ** tf

            upds, mus, nus = {}, {}, {}
            for k, g in grads.items():  # params are flat name->array dicts
                mu = b1 * state["mu"][k] + (1 - b1) * g
                nu = b2 * state["nu"][k] + (1 - b2) * (g * g)
                upds[k] = -lr * (mu / c1) / (jnp.sqrt(nu / c2) + eps)
                mus[k], nus[k] = mu, nu
            return upds, {"mu": mus, "nu": nus, "t": t}

        return optax.GradientTransformation(init, update)

    def make_epoch(opt, sample_inside):
        def loss_step(carry, batch):
            pp, oo = carry
            ub, pb, nb = batch

            def loss_fn(q):
                loss, aux = model.bpr_loss(q, ub, pb, nb, ell=hg)
                return loss + 1e-4 * aux["reg"]

            v, g = jax.value_and_grad(loss_fn)(pp)
            upd, oo = opt.update(g, oo, pp)
            pp = optax.apply_updates(pp, upd)
            return (pp, oo), v

        if sample_inside:
            def epoch(key, params, ost):
                u, p, n = sample_epoch(key, st, steps * B, B)
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

    def fresh():
        return jax.device_put(
            {k: jnp.array(v, copy=True) for k, v in params0.items()}
        )

    def run(label, opt, sample_inside):
        fn = make_epoch(opt, sample_inside)
        p = fresh()
        o = opt.init(p)
        key0 = jax.random.key(123)
        if sample_inside:
            p, o, l = fn(key0, p, o)
        else:
            b0 = sample_epoch(key0, st, steps * B, B)
            jax.block_until_ready(b0)
            p, o, l = fn(b0, p, o)
        jax.block_until_ready(l)
        t0 = time.time()
        for r in range(1, args.reps + 1):
            if sample_inside:
                p, o, l = fn(jax.random.key(r), p, o)
            else:
                br = sample_epoch(jax.random.key(r), st, steps * B, B)
                jax.block_until_ready(br)
                p, o, l = fn(br, p, o)
            jax.block_until_ready(l)
        dt = (time.time() - t0) / args.reps
        print(json.dumps({"arm": label, "epoch_s": round(dt, 4),
                          "loss": round(float(l), 5)}), flush=True)
        return dt

    sgd = optax.sgd(1e-3)
    t_in = run("sgd_sample_inside", sgd, True)
    # outside arm: the timed loop includes the (blocked) sampling calls,
    # so subtracting arms isolates nothing — instead the outside arm's
    # scan consumes PRE-BUILT batches and we re-time only fn:
    fn = make_epoch(sgd, False)
    p = fresh(); o = sgd.init(p)
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
    t_scan_only = (time.time() - t0) / args.reps
    print(json.dumps({"arm": "sgd_prebuilt_batches", "epoch_s":
                      round(t_scan_only, 4),
                      "sampler_true_s": round(t_in - t_scan_only, 4)}),
          flush=True)

    t_optax = run("optax_adam", optax.adam(1e-3), True)
    t_fused = run("fused_adam", fused_adam(1e-3), True)
    print(json.dumps({"adam_chain_premium_s":
                      round(t_optax - t_fused, 4)}), flush=True)


if __name__ == "__main__":
    main()
