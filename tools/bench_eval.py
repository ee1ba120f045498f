"""Eval-throughput A/B on the real chip (VERDICT r1 item 3).

Measures eval examples/sec/chip (BASELINE.json north star) for the
full-catalog masked top-k engine across its accelerator options:

  exact        lax.top_k (default)
  approx       lax.approx_max_k at --recall_target
  pallas       fused masked-scoring Pallas kernel + exact top_k

on (a) the real Gowalla test split and (b) an amazon-book-SCALE synthetic
stand-in (52,643 x 91,599, the real train.txt was stripped from the
reference snapshot — reference LightGCN_work/README.md:96-103 publishes
quality there but no timing exists anywhere).

Quality delta for 'approx' is measured against 'exact' on the SAME
params: load a trained checkpoint with --checkpoint_dir for meaningful
recall numbers (random params otherwise — timing valid, delta vacuous).

Usage: python tools/bench_eval.py [--checkpoint_dir CK] [--skip_scale]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def time_eval(ev, params, reps=3):
    ev.run(params)  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        m = ev.run(params)
    dt = (time.time() - t0) / reps
    return dt, m


def bench_dataset(name, data, model, params, topk_variants, test_batch=2048):
    from gsrs_tpu.config import EvalConfig
    from gsrs_tpu.train.evaluator import Evaluator

    out = []
    for label, cfg_kw in topk_variants:
        cfg = EvalConfig(test_batch=test_batch, topks=(20,), **cfg_kw)
        try:
            ev = Evaluator(data, model, cfg)
            dt, metrics = time_eval(ev, params)
        except Exception as e:
            print(f"[{name}:{label}] FAILED: {type(e).__name__}: {e}")
            continue
        users_per_s = ev.n_test_users / dt
        row = {
            "dataset": name,
            "variant": label,
            "eval_sec": round(dt, 4),
            "eval_users_per_s_per_chip": round(users_per_s),
            "recall@20": round(metrics.get("recall@20", 0.0), 5),
            "ndcg@20": round(metrics.get("ndcg@20", 0.0), 5),
        }
        out.append(row)
        print(json.dumps(row))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", default=None,
                    help="trained checkpoint for meaningful quality deltas")
    ap.add_argument("--skip_scale", action="store_true")
    ap.add_argument("--recall_target", type=float, default=0.98)
    ap.add_argument("--test_batch", type=int, default=2048)
    args = ap.parse_args()

    import jax

    from gsrs_tpu.config import ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions

    variants = [
        # what a default user now gets: auto-select (bitplane on TPU at
        # >= 64k items, XLA below — VERDICT r3 item 4)
        ("auto", dict(topk_method="exact")),
        ("exact", dict(topk_method="exact", use_pallas_scoring="off")),
        ("approx", dict(topk_method="approx", use_pallas_scoring="off",
                        topk_recall_target=args.recall_target)),
        # bit-plane kernel (default pallas variant): bit unpack via
        # lane-axis concat — the Mosaic-compilable form (round 3)
        ("pallas-bitplane+exact",
         dict(topk_method="exact", use_pallas_scoring=True)),
        # natural-order kernel: known Mosaic shape-cast wall (round 2) —
        # kept to record the compile failure in the log
        ("pallas-natural+exact",
         dict(topk_method="exact", use_pallas_scoring=True,
              pallas_variant="natural")),
    ]

    results = []

    # ---- Gowalla (real data, optionally trained params)
    data = load_dataset(os.path.join(REPO, "data", "gowalla"))
    graph = build_graph(data)
    cfg = ModelConfig(num_layers=3, embedding_dim=64, bf16_compute=True)
    model = build_model(cfg, graph, ell=ell_from_interactions(data))
    if args.checkpoint_dir:
        # restore through the Trainer so the template matches the full
        # train-state layout the trainer checkpoints (params+opt_state)
        from gsrs_tpu.config import ExperimentConfig, TrainConfig
        from gsrs_tpu.train.trainer import Trainer

        tcfg = ExperimentConfig(
            model=cfg,
            train=TrainConfig(
                checkpoint_dir=args.checkpoint_dir,
                resume=True,
                tensorboard=False,
            ),
        )
        tr = Trainer(tcfg, data, graph, model, run_eval=False)
        state = tr.maybe_resume(tr.init_state())
        params = state.params
        if state.epoch == 0:
            # maybe_resume silently returns fresh state when no
            # checkpoint resolves — don't report random params as trained
            raise SystemExit(
                f"[params] NO checkpoint resolved under {args.checkpoint_dir} "
                "(state.epoch == 0) — refusing to report random-params "
                "quality as restored; run without --checkpoint_dir for "
                "timing-only numbers"
            )
        print(f"[params] restored {args.checkpoint_dir} @ epoch {state.epoch}")
    else:
        params = model.init_params(jax.random.key(0))
        print("[params] RANDOM (quality deltas vacuous; timing valid)")
    results += bench_dataset("gowalla", data, model, params,
                             variants, args.test_batch)

    # ---- amazon-book scale stand-in
    if not args.skip_scale:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "stress_pod", os.path.join(REPO, "tools", "stress_pod.py")
        )
        sp = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sp)
        sdata = sp.big_synthetic(52643, 91599, avg_degree=57, seed=0)
        # synthetic held-out split: 10 random items per user (amazon-book
        # has ~52k test users; eval cost depends on test-user count and
        # catalog size, not on which items are held out)
        import numpy as np

        rng = np.random.default_rng(1)
        td = {
            int(u): rng.integers(0, sdata.m_items, 10)
            for u in range(sdata.n_users)
        }
        sdata = dataclasses.replace(sdata, test_dict=td)
        sgraph = build_graph(sdata)
        smodel = build_model(cfg, sgraph, ell=ell_from_interactions(sdata))
        sparams = smodel.init_params(jax.random.key(0))
        results += bench_dataset("amazon-book-scale", sdata, smodel, sparams,
                                 variants, args.test_batch)

    print("== summary ==")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
