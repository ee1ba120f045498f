"""Eval roofline: where do the seconds go at amazon-book scale?
(VERDICT r3 item 5.)

The amazon-scale exact eval (52,643 users x 91,599 items, d=64) takes
~3.8 s XLA / ~2.0 s bitplane on the chip, while its scoring matmul alone
is ~10 ms at MXU rates — so the pipeline is NOT compute-bound. This tool
decomposes the measured time into phases and states the distance to the
chip's bandwidth bound.

Method: XLA fuses aggressively, so isolated per-phase timings lie
(e.g. a matmul whose output feeds only a reduction never materializes
the (B, m) score matrix). Instead we time PREFIX pipelines of the real
eval — score; score+mask; score+mask+topk; the full eval — each as one
scanned dispatch over all user batches, and attribute phase cost to the
successive differences. Fusion makes phases not strictly additive; the
prefix-diff is the finest decomposition XLA's compilation model admits.

Also measured: an HBM copy-bandwidth calibration (big fp32 array copy)
so "distance to bandwidth bound" uses this chip's delivered number, not
a datasheet.

Usage: python tools/profile_eval_phases.py [--shape amazon|gowalla]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, *args, reps=3):
    """Warm, then report max(single-call, per-rep-avg) wall time.

    The remote-device tunnel has been caught short-circuiting repeated
    identical dispatches (see the calibration note below); a lone
    blocked call cannot be short-circuited, so if avg-of-reps comes out
    LOWER than the single call, the single call is the honest number."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    t_single = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    t_avg = (time.perf_counter() - t0) / reps
    return max(t_single, t_avg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="amazon", choices=["amazon", "gowalla"])
    ap.add_argument("--test_batch", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import importlib.util

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsrs_tpu.config import EvalConfig, ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.ops.metrics import batch_metrics, topk_labels
    from gsrs_tpu.ops.topk import mask_train_positives, topk_scores
    from gsrs_tpu.train.evaluator import Evaluator

    if args.shape == "amazon":
        spec = importlib.util.spec_from_file_location(
            "stress_pod", os.path.join(REPO, "tools", "stress_pod.py")
        )
        sp = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sp)
        data = sp.big_synthetic(52643, 91599, avg_degree=57, seed=0)
        rng = np.random.default_rng(1)
        td = {
            int(u): rng.integers(0, data.m_items, 10)
            for u in range(data.n_users)
        }
        data = dataclasses.replace(data, test_dict=td)
    else:
        data = load_dataset(os.path.join(REPO, "data", "gowalla"))

    graph = build_graph(data)
    mcfg = ModelConfig(num_layers=3, embedding_dim=64, bf16_compute=True)
    model = build_model(mcfg, graph, ell=ell_from_interactions(data))
    params = model.init_params(jax.random.key(0))

    # ---- HBM calibration. Repeated independent dispatches on identical
    # inputs are not executed honestly by the remote-device tunnel (two
    # earlier versions reported 18-27 TB/s on an 819 GB/s part), so the
    # elementwise pass is chained data-dependently inside ONE dispatch
    # via fori_loop: per-iteration time is real device execution.
    N = 256 * 2**20  # 1 GiB fp32
    K_CAL = 16
    x = jax.random.normal(jax.random.key(9), (N,), jnp.float32)

    def cal(a):
        def body(_, c):
            return c * 1.0000001 + c[::-1] * 1e-9

        return jax.lax.fori_loop(0, K_CAL, body, a)

    t_copy = timed(jax.jit(cal), x, reps=args.reps) / K_CAL
    hbm_gbps = 3 * N * 4 / t_copy / 1e9  # 2 reads + 1 write per iter
    print(json.dumps({"calib": "hbm_elementwise_chained",
                      "gbps": round(hbm_gbps, 1)}))

    # evaluator machinery: reuse its padded user batches/bitsets
    ecfg = EvalConfig(
        test_batch=args.test_batch, topks=(20,), use_pallas_scoring="off"
    )
    ev = Evaluator(data, model, ecfg)
    n_b, B = ev.user_batches.shape
    m, d = data.m_items, mcfg.embedding_dim
    U = n_b * B

    all_users, items, _ = jax.jit(
        lambda p, g, e: model.final_embeddings(p, graph=g, ell=e)
    )(params, model.graph, model.ell)
    t_prop = timed(
        jax.jit(lambda p, g, e: model.final_embeddings(p, graph=g, ell=e)),
        params, model.graph, model.ell, reps=args.reps,
    )

    users_d, tb = ev._users_dev, ev.train_bitset
    test_b, w_d, gt_d = ev.test_bitset, ev._weights_dev, ev._gt_dev
    max_k = ev.max_k

    def scan_over(fn):
        def run(au, it, trb, teb, us, ws, gs):
            def step(_, xs):
                return None, fn(au, it, trb, teb, *xs)

            _, out = jax.lax.scan(step, None, (us, ws, gs))
            return out

        return jax.jit(run)

    def p_score(au, it, trb, teb, u, w, g):
        s = jnp.dot(
            au[u], it.T.astype(au.dtype), preferred_element_type=jnp.float32
        )
        # abs blocks the sum∘matmul → dot-of-sums algebraic rewrite that
        # let XLA skip the matmul entirely in a first version
        return jnp.sum(jnp.abs(s))

    def p_mask(au, it, trb, teb, u, w, g):
        s = jnp.dot(
            au[u], it.T.astype(au.dtype), preferred_element_type=jnp.float32
        )
        s = mask_train_positives(s, trb[u], m)
        return jnp.sum(s)

    def p_topk(au, it, trb, teb, u, w, g):
        s = jnp.dot(
            au[u], it.T.astype(au.dtype), preferred_element_type=jnp.float32
        )
        s = mask_train_positives(s, trb[u], m)
        vals, idx = topk_scores(s, max_k)
        return jnp.sum(idx)

    def p_full(au, it, trb, teb, u, w, g):
        s = jnp.dot(
            au[u], it.T.astype(au.dtype), preferred_element_type=jnp.float32
        )
        s = mask_train_positives(s, trb[u], m)
        vals, idx = topk_scores(s, max_k)
        labels = topk_labels(idx, teb, u)
        return batch_metrics(labels, g, w, ecfg.topks)["recall@20"]

    times = {}
    argsv = (all_users, items, tb, test_b, users_d, w_d, gt_d)
    for name, fn in (
        ("score", p_score),
        ("score+mask", p_mask),
        ("score+mask+topk", p_topk),
        ("full", p_full),
    ):
        times[name] = timed(scan_over(fn), *argsv, reps=args.reps)

    # the Evaluator's own scan (exact/XLA path), device-resident args, no
    # propagation — isolates any gap between the Evaluator and the
    # hand-built prefix pipeline of the same math
    times["evaluator_scan_exact"] = timed(
        ev._scan_fn, all_users, items, ev.train_bitset, ev.test_bitset,
        ev._users_dev, ev._weights_dev, ev._gt_dev, reps=args.reps,
    )
    # full ev.run for both variants (includes propagation + host sync)
    ev.run(params)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        ev.run(params)
    times["evaluator_run_exact"] = (time.perf_counter() - t0) / args.reps

    # bitplane comparison: full eval via the Evaluator (auto picks the
    # kernel at amazon scale on TPU)
    ev_auto = Evaluator(data, model, EvalConfig(
        test_batch=args.test_batch, topks=(20,)
    ), train_bitset=ev.train_bitset)
    ev_auto.run(params)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        ev_auto.run(params)
    times["evaluator_auto(incl_prop)"] = (time.perf_counter() - t0) / args.reps
    if getattr(ev_auto, "_pallas_on", False):
        items_p = ev_auto._bp_permute_items(items)
        times["evaluator_scan_bitplane"] = timed(
            ev_auto._scan_fn, all_users, items_p, ev_auto.train_bitset,
            ev_auto.test_bitset, ev_auto._users_dev, ev_auto._weights_dev,
            ev_auto._gt_dev, reps=args.reps,
        )
    times["propagation"] = t_prop

    # ---- roofline arithmetic (fp32 score matrix, bf16 operands)
    flops = 2.0 * U * m * d
    score_write = U * m * 4.0
    mask_traffic = 2 * U * m * 4.0 + U * (m / 8.0)
    topk_read = U * m * 4.0
    floor = {
        "score_mxu_s": flops / 68e12,  # 68 TFLOP/s measured bf16 calib
        "score_hbm_s": score_write / (hbm_gbps * 1e9),
        "mask_hbm_s": mask_traffic / (hbm_gbps * 1e9),
        "topk_hbm_s": topk_read / (hbm_gbps * 1e9),
    }
    floor["pipeline_hbm_s"] = (
        floor["score_hbm_s"] + floor["mask_hbm_s"] + floor["topk_hbm_s"]
    )

    report = {
        "shape": args.shape,
        "users_padded": U,
        "m_items": m,
        "phase_s": {k: round(v, 4) for k, v in times.items()},
        "diff_s": {
            "mask": round(times["score+mask"] - times["score"], 4),
            "topk": round(
                times["score+mask+topk"] - times["score+mask"], 4
            ),
            "metrics": round(times["full"] - times["score+mask+topk"], 4),
        },
        "floor_s": {k: round(v, 4) for k, v in floor.items()},
        "distance_to_hbm_bound": round(
            times["full"] / floor["pipeline_hbm_s"], 2
        ),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
