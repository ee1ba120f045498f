"""Pod-scale stress harness: sharded tables + all-to-all + sharded top-k.

BASELINE.json config 5 asks for a "synthetic 50M-user/10M-item graph,
dim=256, stress all-to-all + sharded top-k on N-host pod". The reference
has no counterpart (it is single-process, SURVEY.md §2 checklist); this
harness is the TPU-native realization:

- ``--plan_only`` prints the per-device memory plan and per-step
  collective volumes for any (scale, mesh) point and a feasibility
  verdict against the per-chip HBM budget — so the 50M-user config can
  be validated/sized without a pod attached.
- run mode materializes the synthetic graph (chunked, host-memory-aware
  generator at large scale), places row-sharded embedding tables +
  mesh-sharded ELL edges, and measures the sharded train step
  (examples/s) and the sharded full-catalog top-k eval (users/s).

Usage:
  # the BASELINE config, plan only (no pod needed):
  python tools/stress_pod.py --n_users 50000000 --m_items 10000000 \
      --dim 256 --data_axis 4 --model_axis 16 --plan_only
  # small-scale smoke on the virtual CPU mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/stress_pod.py --smoke
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_PER_CHIP = {"v5e": 16, "v5p": 95, "v4": 32, "v6e": 32}  # GiB


# membership-bitset sampler cutoff: past this the run mode (and the
# plan) switch to plain uniform negatives
BITSET_SAMPLER_MAX_BYTES = 8 * 2**30


def memory_plan(
    n_users: int,
    m_items: int,
    dim: int,
    avg_degree: float,
    batch: int,
    eval_batch: int,
    data_axis: int,
    model_axis: int,
    layers: int = 3,
    chip: str = "v5e",
    topk: int = 20,
) -> dict:
    """Per-device byte budget + per-step collective volumes for the
    sharded LightGCN design (tables row-sharded over 'model', edges
    sharded over the full mesh, scores sharded (data, model))."""
    n_dev = data_axis * model_axis
    nodes = n_users + m_items
    edges = int(n_users * avg_degree)

    # fp32 master tables + Adam mu/nu, row-sharded over 'model'
    tables = nodes * dim * 4 * 3 / model_axis
    # propagation working set: bf16 current layer + accumulator + next
    # (ELL SpMM materializes one (nodes, dim) temporary per direction)
    activations = 3 * nodes * dim * 2 / model_axis
    # ELL edges, both directions: idx(4) + weight(4) + perm(4), with
    # ~1.25x power-of-two bucket padding; sharded over the whole mesh
    ell = edges * 2 * 12 * 1.25 / n_dev
    # eval score block: (eval_batch, m_items) fp32 sharded (data, model)
    scores = eval_batch * m_items * 4 / n_dev
    # rejection-sampler membership bitset: (n_users, ceil(m/32)) uint32,
    # REPLICATED per device — beyond bitset_sampler_max_GiB the run mode
    # switches to plain uniform negatives (collision odds ~avg_degree/m)
    sampler_bitset = n_users * ((m_items + 31) // 32) * 4
    use_bitset = sampler_bitset <= BITSET_SAMPLER_MAX_BYTES

    per_dev = tables + activations + ell + scores + (
        sampler_bitset if use_bitset else 0
    )
    hbm = HBM_PER_CHIP[chip] * 2**30

    # collectives per train step
    batch_gather = 3 * batch * dim * 4  # all-to-all: triplet rows from remote shards
    mlp_psum = 0  # table grads stay sharded; only scalar loss + small MLPs psum
    # eval: local top-k (k per shard) then gather-merge over model axis
    topk_merge = eval_batch * topk * 8 * model_axis / n_dev

    min_model_axis = math.ceil((tables + activations) * model_axis / (hbm * 0.8))
    return {
        "devices": n_dev,
        "mesh": f"data={data_axis} x model={model_axis}",
        "chip": chip,
        # Pod scale is ELL-only by design: hybrid's dense hub blocks are
        # O((n+m)·C) with rows REPLICATED per device (hybrid_spec shards
        # only columns), so at these shapes they dwarf any HBM budget —
        # ops.hybrid.resolve_hybrid_cols would clamp them to 0 anyway.
        "spmm": "ell",
        "hybrid_dense_at_C8192_GiB": round(nodes * 8192 * 2 / 2**30, 1),
        "per_device_GiB": {
            "tables+adam": round(tables / 2**30, 3),
            "propagation_activations": round(activations / 2**30, 3),
            "ell_edges": round(ell / 2**30, 3),
            "eval_scores": round(scores / 2**30, 3),
            "sampler_bitset": round(
                (sampler_bitset if use_bitset else 0) / 2**30, 3
            ),
            "total": round(per_dev / 2**30, 3),
        },
        "bitset_sampler": use_bitset,
        "per_step_collectives_MiB": {
            "batch_all_to_all": round(batch_gather / 2**20, 3),
            "grad_psum": round(mlp_psum / 2**20, 3),
            "eval_topk_merge": round(topk_merge / 2**20, 3),
        },
        "fits": per_dev < hbm * 0.8,  # 20% headroom for XLA temporaries
        "min_model_axis_for_fit": max(1, min_model_axis),
        "edges": edges,
    }


def big_synthetic(n_users: int, m_items: int, avg_degree: int, seed: int = 0):
    """Low-host-memory constant-degree Zipf generator for huge scales:
    no global dedup/sort (parallel edges are numerically harmless — they
    just add weight), int32 ids, chunked sampling."""
    import numpy as np

    from gsrs_tpu.data.dataset import InteractionData

    rng = np.random.default_rng(seed)
    total = n_users * avg_degree
    users = np.repeat(np.arange(n_users, dtype=np.int32), avg_degree)
    items = np.empty(total, dtype=np.int32)
    # Zipf via inverse-CDF on uniform — avoids a 10M-entry choice() p-vector
    s = 1.1
    # Round-3 fix (root cause of the yelp-scale TPU-worker crash): the
    # round-2 version CLAMPED every out-of-range draw of the unbounded
    # inverse CDF onto rank m_items−1 — u < m^-(s-1) is ~35% of all
    # draws at these shapes, so ONE item got degree 540k and the ELL
    # builder produced a degenerate (1, 2^20)-wide bucket whose compiled
    # gather faulted the worker. Real catalogs have truncated heads
    # (gowalla's most popular item holds 0.17% of interactions), so:
    # out-of-range draws spread uniformly over the whole catalog, and
    # the top HEAD ranks are flattened among themselves, capping every
    # item's share at ≈ P(rank<HEAD)/HEAD ≈ 0.46/512 ≈ 0.09% while the
    # tail stays exactly Zipf.
    HEAD = max(1, min(512, m_items // 64))
    for lo in range(0, total, 50_000_000):
        hi = min(lo + 50_000_000, total)
        u = rng.random(hi - lo)
        raw = u ** (-1.0 / (s - 1.0)) - 1.0  # unbounded inverse CDF
        over = ~(raw < float(m_items))  # catches inf/NaN too
        ranks = np.where(over, 0.0, raw).astype(np.int64)
        ranks[over] = rng.integers(0, m_items, int(over.sum()))
        head = ranks < HEAD
        ranks[head & ~over] = rng.integers(0, HEAD, int((head & ~over).sum()))
        items[lo:hi] = ranks.astype(np.int32)
    return InteractionData(
        name=f"stress-{n_users}x{m_items}",
        n_users=n_users,
        m_items=m_items,
        train_users=users.astype(np.int64),
        train_items=items.astype(np.int64),
        test_dict={},
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_users", type=int, default=50_000_000)
    ap.add_argument("--m_items", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--avg_degree", type=int, default=27)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--eval_batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--data_axis", type=int, default=4)
    ap.add_argument("--model_axis", type=int, default=16)
    ap.add_argument("--chip", choices=sorted(HBM_PER_CHIP), default="v5e")
    ap.add_argument("--plan_only", action="store_true")
    ap.add_argument("--smoke", action="store_true", help="tiny-scale run")
    args = ap.parse_args()

    if args.smoke:
        args.n_users, args.m_items, args.dim = 2000, 1500, 32
        args.avg_degree, args.batch, args.eval_batch = 10, 512, 128
        args.data_axis = args.data_axis if args.data_axis <= 4 else 2
        args.model_axis = 2

    plan = memory_plan(
        args.n_users, args.m_items, args.dim, args.avg_degree,
        args.batch, args.eval_batch, args.data_axis, args.model_axis,
        layers=args.layers, chip=args.chip, topk=args.topk,
    )
    print(json.dumps(plan, indent=2))
    if args.plan_only:
        return

    import jax
    import numpy as np

    from gsrs_tpu.config import ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.synthetic import powerlaw
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.ops.sampling import make_sampler_state, sample_triplets
    from gsrs_tpu.parallel.dist_train import make_eval_scores_fn, make_train_step
    from gsrs_tpu.parallel.mesh import make_mesh
    from gsrs_tpu.parallel.sharding import GraphShardings
    from gsrs_tpu.train.optim import make_optimizer

    n_dev = args.data_axis * args.model_axis
    if n_dev > len(jax.devices()):
        raise SystemExit(
            f"mesh needs {n_dev} devices, only {len(jax.devices())} present "
            "(use --plan_only to size a pod run, or --smoke)"
        )

    gen = powerlaw if args.n_users <= 2_000_000 else (
        lambda n, m, avg_degree, seed: big_synthetic(n, m, avg_degree, seed)
    )
    data = gen(args.n_users, args.m_items, avg_degree=args.avg_degree, seed=0)
    from gsrs_tpu.data.dataset import pad_nodes_to_multiple

    data = pad_nodes_to_multiple(data, args.model_axis)
    graph = build_graph(data)
    ell = ell_from_interactions(data)

    mesh = make_mesh(data_axis=args.data_axis, model_axis=args.model_axis)
    sh = GraphShardings(mesh)
    model_cfg = ModelConfig(
        num_layers=args.layers, embedding_dim=args.dim, bf16_compute=True
    )
    optimizer, _ = make_optimizer(TrainConfig(lr=1e-3), steps_per_epoch=1)
    model = build_model(model_cfg, sh.place_graph(graph), ell=sh.place_ell(ell))
    params = sh.place_params(model.init_params(jax.random.key(0)))
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, mesh, decay=1e-4)(params, opt_state)

    bitset_bytes = data.n_users * ((data.m_items + 31) // 32) * 4
    if bitset_bytes <= BITSET_SAMPLER_MAX_BYTES:
        sampler = make_sampler_state(data)
        users, pos, neg = sample_triplets(jax.random.key(1), sampler, args.batch)
    else:
        # membership bitset would need TBs at pod catalog scale — use plain
        # uniform negatives (collision probability ~ avg_degree / m_items)
        print(
            f"# sampler bitset would need {bitset_bytes / 2**30:.0f} GiB; "
            f"using uniform negatives"
        )
        rng = np.random.default_rng(1)
        pick = rng.integers(0, data.train_size, args.batch)
        users = jnp.asarray(data.train_users[pick].astype(np.int32))
        pos = jnp.asarray(data.train_items[pick].astype(np.int32))
        neg = jnp.asarray(
            rng.integers(0, data.m_items, args.batch).astype(np.int32)
        )
    bs = sh.batch_spec()
    users, pos, neg = (jax.device_put(x, bs) for x in (users, pos, neg))
    params, opt_state, loss = step(params, opt_state, model.graph, model.ell, users, pos, neg)
    float(loss)
    t0 = time.time()
    for _ in range(args.steps):
        params, opt_state, loss = step(
            params, opt_state, model.graph, model.ell, users, pos, neg
        )
    float(loss)
    step_s = (time.time() - t0) / args.steps
    print(json.dumps({
        "train_step_ms": round(step_s * 1000, 2),
        "examples_per_s": round(args.batch / step_s),
    }))

    # sharded full-catalog top-k eval stress
    all_u, all_i, _ = model.final_embeddings(params)
    scores_fn = make_eval_scores_fn(model, mesh)
    eval_user_ids = np.arange(args.eval_batch, dtype=np.int64) % data.n_users
    # bitset rows for just the eval users (remap to 0..B-1 so the packed
    # table is (B, words), not (n_users, words) — 50M rows won't fit)
    from gsrs_tpu.ops.bitset import build_bitset

    sel = np.isin(data.train_users, eval_user_ids)
    remap = np.full(data.n_users, -1, dtype=np.int64)
    remap[eval_user_ids] = np.arange(args.eval_batch)
    rows = build_bitset(
        remap[data.train_users[sel]], data.train_items[sel],
        args.eval_batch, data.m_items,
        real_m_items=data.real_m_items,  # mask phantom padded catalog ids
    )
    eval_users = jax.device_put(eval_user_ids.astype(np.int32), bs)
    train_rows = jax.device_put(rows, bs)
    vals, idx = scores_fn(all_u, all_i, eval_users, train_rows, args.topk)
    vals.block_until_ready()
    t0 = time.time()
    reps = max(1, args.steps // 4)
    for _ in range(reps):
        vals, idx = scores_fn(all_u, all_i, eval_users, train_rows, args.topk)
    vals.block_until_ready()
    eval_s = (time.time() - t0) / reps
    print(json.dumps({
        "eval_topk_ms": round(eval_s * 1000, 2),
        "eval_users_per_s": round(args.eval_batch / eval_s),
    }))

    stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
    if stats:
        print(json.dumps({
            "hbm_in_use_GiB": round(stats.get("bytes_in_use", 0) / 2**30, 3)
        }))
    print("STRESS OK")


if __name__ == "__main__":
    main()
