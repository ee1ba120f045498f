"""Train-step roofline: decompose the b131072 (and b2048) Gowalla train
step into phases and state each phase's distance to its wall (VERDICT r4
item 4 — the eval got this treatment in profile_eval_phases.py and it
changed the round-3 conclusion; the train step's "at its practical
ceiling" claim deserves the same numbers).

STATUS (round 5): this prefix-pipeline method is REFUTED through the
tunnel — its numbers are unusable for two measured reasons: (1) the
remote-device tunnel memoizes repeated dispatches with a key looser
than input contents (varied-seed second calls, and even AOT-compiled
first executions, of a b131072 step came back in 50-600 us — far below
any floor), and (2) XLA's algebraic simplifier rewrites the reduced
pipelines (sum(dense @ gathered(x)) -> a dot of reductions), so the
ablated arms measure programs the real step never runs. Kept as the
recorded negative result; the usable decomposition is
tools/roofline_train_epochs.py (real Trainer epochs under ablated
configs — timing independently confirmed by convergence-run wall
clocks). See BENCH_NOTES round 5.

Method (same discipline as profile_eval_phases.py): XLA fuses whole
steps, so isolated phase timings lie. We time PREFIX pipelines of the
real step — sampling; propagation fwd; propagation fwd+bwd; full loss
fwd; full loss fwd+bwd; loss+Adam (the full step) — each as ONE chained
lax.scan dispatch (the tunnel short-circuits repeated identical
dispatches, and a single dispatch must stay far under the ~2 min
worker-fault onset), and attribute phase cost to successive differences.
A second set of micro-pipelines splits one propagation sweep into its
dense-hub-block matmul and residual-ELL-gather halves, since those two
have different walls (HBM streaming vs the ~300 M rows/s gather issue
rate measured in BENCH_NOTES round 1).

Usage: python tools/profile_train_phases.py [--batch 131072] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def chain_timed(make_body, n_iters, *args):
    """Build jit(scan(body)) over n_iters data-dependently-chained
    iterations; return per-iteration seconds.

    The timed call takes a DIFFERENT seed scalar than the warm-up call
    (seed feeds the initial carry, which perturbs every iteration): the
    remote-device tunnel memoizes repeated identical dispatches — with
    device-resident args, a second identical call returns in ~40 µs
    without executing (caught in this tool's first run; the same
    phenomenon profile_eval_phases.py's `timed` guards against)."""
    import jax
    import jax.numpy as jnp

    def run(seed, *a):
        def step(carry, i):
            return make_body(carry, i, *a), None

        out, _ = jax.lax.scan(
            step, seed, jnp.arange(n_iters, dtype=jnp.float32)
        )
        return out

    # AOT: compile WITHOUT executing, then time the FIRST execution —
    # the only dispatch the tunnel cannot have memoized (a varied-seed
    # second call still came back in ~50 µs, so the memo key is looser
    # than input contents). Includes one tunnel round-trip, amortized
    # over n_iters chained iterations.
    compiled = jax.jit(run).lower(jnp.float32(0), *args).compile()
    t0 = time.perf_counter()
    r = compiled(jnp.float32(0), *args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / n_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--hbm_gbps", type=float, default=819.0)
    ap.add_argument(
        "--synthetic", action="store_true",
        help="tiny clustered dataset + hybrid_cols 64: CPU smoke of the "
        "whole pipeline, numbers meaningless",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsrs_tpu.config import ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import _apply_side
    from gsrs_tpu.ops.hybrid import hybrid_from_interactions
    from gsrs_tpu.ops.sampling import make_sampler_state, sample_triplets
    from gsrs_tpu.train.optim import make_optimizer

    print(f"[backend] {jax.default_backend()} {jax.devices()}", flush=True)
    cols = 8192
    if args.synthetic:
        from gsrs_tpu.data.synthetic import clustered

        data = clustered(256, 384, n_clusters=4, seed=0)
        graph = build_graph(data, edge_pad_multiple=256)
        cols = 64
        args.batch = min(args.batch, 512)
    else:
        data = load_dataset(os.path.join(REPO, "data", "gowalla"))
        graph = build_graph(
            data, cache_dir=os.path.join(REPO, "data", "gowalla")
        )
    mcfg = ModelConfig(
        num_layers=3, embedding_dim=64, bf16_compute=True,
        spmm_mode="hybrid", hybrid_cols=cols,
    )
    # device_put EVERYTHING that rides as a jit argument: numpy-backed
    # leaves re-upload through the tunnel on every call (the trainer
    # does the same — train/trainer.py "numpy-backed leaves would
    # re-upload"), which would swamp the phase timings
    hg = jax.device_put(
        hybrid_from_interactions(data, cols=cols, dtype=jnp.bfloat16)
    )
    model = build_model(mcfg, graph, ell=hg)
    params = jax.device_put(model.init_params(jax.random.key(0)))
    optimizer, _ = make_optimizer(
        TrainConfig(batch_size=args.batch, lr=8e-3), steps_per_epoch=1
    )
    opt_state = optimizer.init(params)
    B = args.batch
    n, m, d = data.n_users, data.m_items, mcfg.embedding_dim
    state = jax.device_put(make_sampler_state(data))
    users, pos, neg = sample_triplets(jax.random.key(1), state, B)
    jax.block_until_ready((users, pos, neg))

    it = args.iters
    times = {}

    # --- sampling (one epoch's draw, per-batch amortized)
    def s_body(carry, i, st):
        u, p, ng = sample_triplets(
            jax.random.fold_in(jax.random.key(2), i.astype(jnp.int32)), st, B
        )
        return carry + u.sum() + p.sum() + ng.sum() + i * 0, None

    times["sampling"] = chain_timed(
        lambda c, i, st: s_body(c, i, st)[0], it, state
    )

    # --- propagation prefixes (the carry perturbs the tables so no
    # iteration is CSE-able; the add is one HBM pass, shared by all arms)
    def perturbed(p, c):
        return {
            k: (v + c * 1e-12 if k in ("user_emb", "item_emb") else v)
            for k, v in p.items()
        }

    # hg rides through chain_timed as a jit ARGUMENT everywhere below —
    # closed-over it would be baked into the lowered HLO as a ~466 MiB
    # constant and the tunnel's remote_compile endpoint 413s the upload
    # (same fix as trainer.run_epoch's graph/ell arguments).
    def prop_fwd(c, i, p, g_):
        au, ai, _ = model.final_embeddings(perturbed(p, c + i), ell=g_)
        return c + au.sum().astype(jnp.float32) + ai.sum().astype(jnp.float32)

    times["prop_fwd"] = chain_timed(prop_fwd, it, params, hg)

    def prop_fwdbwd(c, i, p, g_):
        def f(pp):
            au, ai, _ = model.final_embeddings(pp, ell=g_)
            return au.sum().astype(jnp.float32) + ai.sum().astype(jnp.float32)

        v, g = jax.value_and_grad(f)(perturbed(p, c + i))
        return c + v + g["user_emb"].sum().astype(jnp.float32)

    times["prop_fwdbwd"] = chain_timed(prop_fwdbwd, it, params, hg)

    # --- full loss prefixes
    def loss_fwd(c, i, p, g_, u, po, ng):
        loss, aux = model.bpr_loss(perturbed(p, c + i), u, po, ng, ell=g_)
        return c + loss + 1e-4 * aux["reg"]

    times["loss_fwd"] = chain_timed(loss_fwd, it, params, hg, users, pos, neg)

    def loss_fwdbwd(c, i, p, g_, u, po, ng):
        def f(pp):
            loss, aux = model.bpr_loss(pp, u, po, ng, ell=g_)
            return loss + 1e-4 * aux["reg"]

        v, g = jax.value_and_grad(f)(perturbed(p, c + i))
        return c + v + g["user_emb"].sum().astype(jnp.float32)

    times["loss_fwdbwd"] = chain_timed(
        loss_fwdbwd, it, params, hg, users, pos, neg
    )

    # --- the full step (loss + Adam), optimizer state threaded honestly
    def run_full(seed, p, os_, g_, u, po, ng):
        def step(carry, i):
            c, pp, oss = carry

            def f(q):
                loss, aux = model.bpr_loss(q, u, po, ng, ell=g_)
                return loss + 1e-4 * aux["reg"]

            v, grads = jax.value_and_grad(f)(pp)
            upd, oss = optimizer.update(grads, oss, pp)
            import optax

            pp = optax.apply_updates(pp, upd)
            return (c + v, pp, oss), None

        out, _ = jax.lax.scan(
            step, (seed, p, os_),
            jnp.arange(it, dtype=jnp.float32),
        )
        return out[0]

    # AOT compile + time the first execution (see chain_timed)
    f_full = (
        jax.jit(run_full)
        .lower(jnp.float32(0), params, opt_state, hg, users, pos, neg)
        .compile()
    )
    t0 = time.perf_counter()
    r = f_full(jnp.float32(0), params, opt_state, hg, users, pos, neg)
    r.block_until_ready()
    times["full_step"] = (time.perf_counter() - t0) / it

    # --- one-sweep split: dense hub blocks vs residual ELL (3 layers,
    # both directions, forward only — walls differ)
    ue0 = params["user_emb"].astype(jnp.bfloat16)
    ie0 = params["item_emb"].astype(jnp.bfloat16)

    def dense_only(c, i, g_, ue, ie):
        u, x = ue + c * 1e-12, ie + c * 1e-12
        for _ in range(mcfg.num_layers):
            du = g_.user_from_item
            di = g_.item_from_user
            nu = jnp.dot(du.dense.astype(u.dtype), x[du.top_src],
                         preferred_element_type=jnp.float32)
            ni = jnp.dot(di.dense.astype(u.dtype), u[di.top_src],
                         preferred_element_type=jnp.float32)
            u, x = nu.astype(u.dtype), ni.astype(x.dtype)
        return c + u.sum().astype(jnp.float32) + x.sum().astype(jnp.float32)

    times["sweep_dense_only"] = chain_timed(dense_only, it, hg, ue0, ie0)

    def residual_only(c, i, g_, ue, ie):
        u, x = ue + c * 1e-12, ie + c * 1e-12
        for _ in range(mcfg.num_layers):
            nu = _apply_side(g_.user_from_item.residual.by_user, x, None,
                             None, True)
            ni = _apply_side(g_.item_from_user.residual.by_user, u, None,
                             None, False)
            u, x = nu.astype(u.dtype), ni.astype(x.dtype)
        return c + u.sum().astype(jnp.float32) + x.sum().astype(jnp.float32)

    times["sweep_residual_only"] = chain_timed(residual_only, it, hg, ue0, ie0)

    # --- walls
    E = data.train_size
    res_edges = sum(
        int(b.cols.shape[0] * b.cols.shape[1])
        for s in (hg.user_from_item.residual.by_user,
                  hg.item_from_user.residual.by_user)
        for b in s.buckets
    )  # padded residual gather slots, both directions, per layer
    dense_bytes = (n + m) * cols * 2  # bf16 blocks streamed per layer
    L = mcfg.num_layers
    hbm = args.hbm_gbps * 1e9
    floors = {
        # dense: stream both blocks once per layer (fwd)
        "sweep_dense_hbm_s": L * dense_bytes / hbm,
        # residual: gather issue rate (~300M rows/s, BENCH_NOTES r1)
        "sweep_residual_issue_s": L * res_edges / 300e6,
        # Adam: read p/mu/nu + grads, write p/mu/nu (fp32, both tables)
        "adam_hbm_s": 7 * (n + m) * d * 4 / hbm,
        # loss bwd adds one transpose sweep: ~2x the fwd sweep floor
        "step_floor_s": (
            3 * (L * dense_bytes / hbm + L * res_edges / 300e6)
            + 7 * (n + m) * d * 4 / hbm
        ),
    }

    steps_per_epoch = -(-data.train_size // B)
    report = {
        "batch": B,
        "steps_per_epoch": steps_per_epoch,
        "residual_gather_slots_per_layer": res_edges,
        "phase_s": {k: round(v, 5) for k, v in times.items()},
        "diff_s": {
            "prop_bwd": round(times["prop_fwdbwd"] - times["prop_fwd"], 5),
            "loss_head_fwd": round(times["loss_fwd"] - times["prop_fwd"], 5),
            "loss_bwd": round(times["loss_fwdbwd"] - times["loss_fwd"], 5),
            "adam": round(times["full_step"] - times["loss_fwdbwd"], 5),
        },
        "floor_s": {k: round(v, 5) for k, v in floors.items()},
        "epoch_projection_s": round(
            times["full_step"] * steps_per_epoch + times["sampling"], 4
        ),
        "distance_to_floor": round(
            times["full_step"] / floors["step_floor_s"], 2
        ),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
