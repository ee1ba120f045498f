"""Scaling-efficiency benchmark: examples/s at mesh sizes 1 → N.

BASELINE.json's north star asks for examples/s scaling efficiency at
1 chip, 1 host, and N hosts. This harness runs the sharded train step
over increasing mesh sizes and reports examples/s and efficiency vs
linear. On real multi-chip hardware it measures true scaling; on a
single-chip/virtual-CPU environment it still validates that every mesh
shape compiles and runs (numbers are then not meaningful for throughput).

Usage:
  python tools/bench_scaling.py --devices 1 2 4 8 --batch 8192
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py --devices 1 2 4 8   # shape validation
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1])
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--n_users", type=int, default=100_000)
    ap.add_argument("--m_items", type=int, default=50_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    args = ap.parse_args()

    import jax

    from gsrs_tpu.config import ModelConfig, TrainConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.synthetic import powerlaw
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.ops.sampling import make_sampler_state, sample_triplets
    from gsrs_tpu.parallel.dist_train import make_train_step
    from gsrs_tpu.parallel.mesh import make_mesh
    from gsrs_tpu.parallel.sharding import GraphShardings
    from gsrs_tpu.train.optim import make_optimizer

    data = powerlaw(args.n_users, args.m_items, avg_degree=27, seed=0)
    graph = build_graph(data)
    ell = ell_from_interactions(data)
    model_cfg = ModelConfig(
        num_layers=args.layers, embedding_dim=args.dim, bf16_compute=True
    )
    optimizer, _ = make_optimizer(TrainConfig(lr=1e-3), steps_per_epoch=1)
    sampler = make_sampler_state(data)

    results = []
    base_rate = None
    for n_dev in args.devices:
        if n_dev > len(jax.devices()):
            print(f"# skipping {n_dev} devices (only {len(jax.devices())})")
            continue
        # prefer pure data-parallel growth; model axis joins at >=4 devices
        model_axis = 2 if n_dev >= 4 else 1
        if n_dev % model_axis:
            # an odd count would silently run a smaller mesh than the row
            # reports (make_mesh takes devices[:data*model])
            print(f"# skipping {n_dev} devices (not divisible by model_axis={model_axis})")
            continue
        data_axis = n_dev // model_axis
        mesh = make_mesh(data_axis=data_axis, model_axis=model_axis)
        sh = GraphShardings(mesh)

        model = build_model(model_cfg, sh.place_graph(graph), ell=sh.place_ell(ell))
        params = sh.place_params(model.init_params(jax.random.key(0)))
        opt_state = optimizer.init(params)
        step = make_train_step(model, optimizer, mesh, decay=1e-4)(params, opt_state)

        users, pos, neg = sample_triplets(jax.random.key(1), sampler, args.batch)
        batch_s = sh.batch_spec()
        users, pos, neg = (
            jax.device_put(users, batch_s),
            jax.device_put(pos, batch_s),
            jax.device_put(neg, batch_s),
        )
        # warm-up / compile
        params, opt_state, loss = step(params, opt_state, model.graph, model.ell, users, pos, neg)
        float(loss)
        t0 = time.time()
        for _ in range(args.steps):
            params, opt_state, loss = step(
                params, opt_state, model.graph, model.ell, users, pos, neg
            )
        float(loss)
        dt = (time.time() - t0) / args.steps
        rate = args.batch / dt
        if base_rate is None:
            # normalize by the first MEASURED config (requested entries
            # may have been skipped above)
            base_rate, base_dev = rate, n_dev
        eff = rate / (base_rate * n_dev / base_dev)
        results.append(
            {
                "devices": n_dev,
                "mesh": f"{data_axis}x{model_axis}",
                "step_ms": round(dt * 1000, 2),
                "examples_per_s": round(rate),
                "scaling_efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    main()
