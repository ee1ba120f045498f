"""Command-line entry point.

Accepts the complete reference flag surface (reference code/parse.py:16-114
— same names, same defaults) and maps it onto the frozen config
dataclasses, replacing the reference's import-time `world` global
(code/world.py) and `register` side effects (code/register.py:35-37).

Run:  python -m gsrs_tpu.cli --dataset gowalla --layer 3 --recdim 64
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

from gsrs_tpu.config import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
    milestones_from_string,
    topks_from_string,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gsrs_tpu",
        description="TPU-native graph recommendation training (LightGCN family)",
    )
    # core training (reference code/parse.py:17-45)
    p.add_argument("--bpr_batch", type=int, default=2048)
    p.add_argument("--recdim", type=int, default=64)
    p.add_argument("--layer", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--decay", type=float, default=1e-4)
    p.add_argument("--dropout", type=int, default=0)
    p.add_argument("--keepprob", type=float, default=0.6)
    p.add_argument("--a_fold", type=int, default=100)
    p.add_argument("--A_split", action="store_true")
    p.add_argument(
        "--reg_mode", choices=["propagated", "ego"], default="propagated",
        help="L2 target: 'propagated' = the reference fork's committed "
        "math; 'ego' = upstream LightGCN (raw table rows, the published "
        "0.1825 gowalla convention)",
    )
    p.add_argument("--testbatch", type=int, default=2048)
    p.add_argument("--epochs", type=int, default=1000)
    # dataset / paths (reference code/parse.py:46-58)
    p.add_argument("--dataset", type=str, default="gowalla")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--checkpoint_dir", type=str, default="./checkpoints")
    p.add_argument("--topks", type=str, default="[20]")
    # logging / repro
    p.add_argument("--tensorboard", type=int, default=1)
    p.add_argument("--comment", type=str, default="lgn")
    p.add_argument("--load", type=int, default=0)
    p.add_argument("--pretrain", type=int, default=0)
    p.add_argument("--seed", type=int, default=2020)
    p.add_argument(
        "--model",
        type=str,
        default="lgn",
        choices=["lgn", "mf", "ngcf", "xsimgcl", "ultragcn"],
    )
    p.add_argument("--multicore", type=int, default=0)
    # PPR (accepted for parity; ignored by the live model, as in the
    # reference — code/parse.py:69-74 vs code/model.py:222)
    p.add_argument("--exp_smooth_beta", type=float, default=0.0)
    p.add_argument("--use_ppr_weights", action="store_true")
    p.add_argument("--ppr_weights_path", type=str, default=None)
    # scheduler (reference code/parse.py:76-82)
    p.add_argument("--use_scheduler", action="store_true")
    p.add_argument("--sched_milestones", type=str, default="[120,240,360,480]")
    p.add_argument("--sched_gamma", type=float, default=0.5)
    # pop-gate (reference code/parse.py:84-97)
    p.add_argument("--use_pop_gate", action="store_true")
    p.add_argument("--pop_hidden", type=int, default=32)
    p.add_argument("--gate_hidden", type=int, default=64)
    p.add_argument("--gate_entropy_coeff", type=float, default=1e-4)
    p.add_argument("--pop_gate_temp", type=float, default=1.0)
    # item-item (reference code/parse.py:98-104)
    p.add_argument("--use_item_item", action="store_true")
    p.add_argument("--i2i_path", type=str, default=None)
    p.add_argument("--i2i_alpha", type=float, default=0.1)
    # checkpoint / resume (reference code/parse.py:107-113)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume_path", type=str, default=None)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--keep_topk", type=int, default=0)
    # XSimGCL contrastive flags (model=xsimgcl; no reference counterpart)
    p.add_argument("--cl_lambda", type=float, default=0.2)
    p.add_argument("--cl_temp", type=float, default=0.2)
    p.add_argument("--cl_eps", type=float, default=0.2)
    p.add_argument("--cl_layer", type=int, default=1)
    # UltraGCN flags (model=ultragcn; no reference counterpart)
    p.add_argument("--ug_neg_num", type=int, default=1500)
    p.add_argument("--ug_neg_weight", type=float, default=300.0)
    p.add_argument("--ug_w1", type=float, default=1e-6)
    p.add_argument("--ug_w2", type=float, default=1.0)
    p.add_argument("--ug_w3", type=float, default=1e-6)
    p.add_argument("--ug_w4", type=float, default=1.0)
    p.add_argument("--ug_lambda", type=float, default=2.75)
    p.add_argument("--ug_ii_k", type=int, default=10)
    p.add_argument("--ug_init_std", type=float, default=1e-4)
    p.add_argument(
        "--ug_neg_sharing",
        type=str,
        default="none",
        choices=["none", "batch", "group", "full", "pool"],
        help="negatives: per-example (paper), one shared set per batch "
        "(MXU matmul), per-group of rows (decorrelated middle ground), "
        "'full' = closed-form expectation over the whole catalog "
        "(one (B,d)x(d,m) matmul; zero sampling variance), or 'pool' = "
        "per-example distinct subsets drawn from a shared gathered pool "
        "(the paper's per-example-draw regularization at batch-like cost)",
    )
    p.add_argument("--ug_neg_groups", type=int, default=8)
    p.add_argument("--ug_neg_pool", type=int, default=8192)
    p.add_argument(
        "--ug_sift_pos",
        action="store_true",
        help="exclude each user's train positives from the negative term "
        "(exact, bitset-masked; requires --ug_neg_sharing full)",
    )
    # TPU-native additions (no reference counterpart)
    p.add_argument("--bf16", action="store_true", help="bf16 propagation/scoring")
    p.add_argument(
        "--spmm",
        type=str,
        default="ell",
        choices=["ell", "hybrid", "tiled", "segment"],
        help="propagation SpMM implementation (ell = scatter-free TPU "
        "path; hybrid = dense MXU hub blocks + residual ELL; tiled = "
        "per-row-group hub blocks over a spectral cluster order)",
    )
    p.add_argument(
        "--hybrid_cols",
        type=int,
        default=8192,
        help="hub columns per direction for --spmm hybrid",
    )
    p.add_argument(
        "--tiled_groups", type=int, default=32,
        help="row groups per direction for --spmm tiled",
    )
    p.add_argument(
        "--tiled_cols", type=int, default=4096,
        help="hub columns per row group for --spmm tiled",
    )
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument(
        "--early_stop",
        type=int,
        default=0,
        help="stop after N evals with no NDCG improvement (0 = off)",
    )
    p.add_argument(
        "--topk_method",
        type=str,
        default="exact",
        choices=["exact", "approx", "threshold"],
        help="eval top-k impl: exact lax.top_k, TPU-native approx_max_k, "
        "or exact threshold-select (measured 8-20x slower than exact on "
        "chip — kept as the recorded negative result, BENCH_NOTES r5)",
    )
    p.add_argument("--topk_recall_target", type=float, default=0.98)
    p.add_argument(
        "--use_pallas_scoring",
        nargs="?",
        const="on",  # bare `--use_pallas_scoring` keeps forcing it on
        type=str,
        default="auto",
        choices=["auto", "on", "off"],
        help="fused masked-scoring Pallas kernel (bit-plane variant) for "
        "eval — exact-equal metrics; ~1.9x faster than the XLA path on "
        "catalogs of ~90k+ items (BENCH_NOTES round 3). 'auto' (default) "
        "enables it on TPU when the catalog has >= 64k items",
    )
    p.add_argument(
        "--epoch_samples",
        type=int,
        default=0,
        help="override #triplets per epoch (0 = train_size, the reference semantics)",
    )
    p.add_argument(
        "--neg_candidates",
        type=int,
        default=16,
        help="on-device sampler: negative candidates per triplet (each = "
        "one bitset gather + one random int32; bias floor rho^C — see "
        "TrainConfig.neg_candidates)",
    )
    p.add_argument(
        "--save_last_every",
        type=int,
        default=1,
        help="cadence (epochs) of the rolling 'last' checkpoint; 1 = every "
        "epoch (reference behavior). An Orbax write costs ~1-2 s, which "
        "dominates wall time at sub-second epochs",
    )
    p.add_argument(
        "--fused_adam",
        choices=["off", "jnp", "pallas"],
        default="off",
        help="fuse the Adam update into one pass per table (off = optax "
        "chain; see TrainConfig.fused_adam)",
    )
    p.add_argument("--data_axis", type=int, default=1)
    p.add_argument("--model_axis", type=int, default=1)
    return p


def config_from_args(args: argparse.Namespace) -> ExperimentConfig:
    # data_root default lives in DataConfig's factory — only override it
    # when the flag was actually passed
    data_kw = {"data_root": args.data_root} if args.data_root else {}
    return ExperimentConfig(
        data=DataConfig(dataset=args.dataset, **data_kw),
        model=ModelConfig(
            model=args.model,
            embedding_dim=args.recdim,
            num_layers=args.layer,
            dropout=bool(args.dropout),
            keep_prob=args.keepprob,
            a_split=args.A_split,
            a_fold=args.a_fold,
            reg_mode=args.reg_mode,
            use_pop_gate=args.use_pop_gate,
            pop_hidden=args.pop_hidden,
            gate_hidden=args.gate_hidden,
            gate_entropy_coeff=args.gate_entropy_coeff,
            pop_gate_temp=args.pop_gate_temp,
            use_item_item=args.use_item_item,
            i2i_path=args.i2i_path,
            i2i_alpha=args.i2i_alpha,
            use_ppr_weights=args.use_ppr_weights,
            ppr_weights_path=args.ppr_weights_path,
            exp_smooth_beta=args.exp_smooth_beta,
            cl_lambda=args.cl_lambda,
            cl_temp=args.cl_temp,
            cl_eps=args.cl_eps,
            cl_layer=args.cl_layer,
            ug_neg_num=args.ug_neg_num,
            ug_neg_weight=args.ug_neg_weight,
            ug_w1=args.ug_w1,
            ug_w2=args.ug_w2,
            ug_w3=args.ug_w3,
            ug_w4=args.ug_w4,
            ug_lambda=args.ug_lambda,
            ug_ii_k=args.ug_ii_k,
            ug_init_std=args.ug_init_std,
            ug_neg_sharing=args.ug_neg_sharing,
            ug_neg_groups=args.ug_neg_groups,
            ug_neg_pool=args.ug_neg_pool,
            ug_sift_pos=args.ug_sift_pos,
            bf16_compute=args.bf16,
            spmm_mode=args.spmm,
            hybrid_cols=args.hybrid_cols,
            tiled_groups=args.tiled_groups,
            tiled_cols=args.tiled_cols,
        ),
        train=TrainConfig(
            batch_size=args.bpr_batch,
            lr=args.lr,
            decay=args.decay,
            epochs=args.epochs,
            seed=args.seed,
            use_scheduler=args.use_scheduler,
            sched_milestones=milestones_from_string(args.sched_milestones),
            sched_gamma=args.sched_gamma,
            checkpoint_dir=args.checkpoint_dir,
            save_every=args.save_every,
            keep_topk=args.keep_topk,
            resume=args.resume,
            resume_path=args.resume_path,
            load_pretrained=bool(args.load),
            pretrain=args.pretrain,
            eval_every=args.eval_every,
            early_stop_evals=args.early_stop,
            tensorboard=bool(args.tensorboard),
            comment=args.comment,
            neg_candidates=args.neg_candidates,
            save_last_every=args.save_last_every,
            fused_adam=args.fused_adam,
        ),
        eval=EvalConfig(
            test_batch=args.testbatch,
            topks=topks_from_string(args.topks),
            multicore=bool(args.multicore),
            topk_method=args.topk_method,
            topk_recall_target=args.topk_recall_target,
            use_pallas_scoring=args.use_pallas_scoring,
        ),
        parallel=ParallelConfig(
            data_axis=args.data_axis, model_axis=args.model_axis
        ),
    )



def _enable_compilation_cache() -> None:
    """Opt-in persistent XLA compilation cache (set GSRS_COMPILE_CACHE=1).

    NOT enabled by default: under the axon remote-compile tunnel the
    persistent cache deadlocks the first compile (observed: process
    futex-blocked indefinitely after device init)."""
    import os

    if os.environ.get("GSRS_COMPILE_CACHE") != "1":
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

def main(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    _enable_compilation_cache()

    # host-side RNG seeding (numpy global / random / torch / the native
    # sampler), matching reference utils.set_seed at startup
    # (code/main.py:136); on-device sampling derives from cfg.train.seed
    from gsrs_tpu.utils.seeding import set_seed

    set_seed(args.seed)

    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset, load_lastfm
    from gsrs_tpu.models.lightgcn import ItemItemGraph
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.train.trainer import Trainer

    if args.dataset == "lastfm":
        data = load_lastfm(cfg.data.dataset_dir)
    else:
        data = load_dataset(cfg.data.dataset_dir, name=args.dataset)
    if cfg.parallel.model_axis > 1:
        from gsrs_tpu.data.dataset import pad_nodes_to_multiple

        data = pad_nodes_to_multiple(data, cfg.parallel.model_axis)
    print(
        f"[data] {data.name}: {data.n_users} users × {data.m_items} items, "
        f"{data.train_size} train interactions, {len(data.test_dict)} test users"
    )
    graph = build_graph(
        data,
        edge_pad_multiple=cfg.data.edge_pad_multiple,
        cache_dir=cfg.data.dataset_dir if cfg.data.cache_adjacency else None,
    )
    i2i = None
    if cfg.model.use_item_item and cfg.model.i2i_path:
        import scipy.sparse as sp

        try:
            i2i = ItemItemGraph.from_scipy(sp.load_npz(cfg.model.i2i_path))
            print(f"[i2i] loaded {cfg.model.i2i_path}")
        except Exception as e:  # tolerate like reference code/model.py:107-109
            print(f"[i2i] WARNING: cannot load {cfg.model.i2i_path}: {e}")
    ell = None
    if cfg.model.model != "ultragcn":
        if cfg.model.spmm_mode == "ell":
            from gsrs_tpu.ops.ell import ell_from_interactions

            ell = ell_from_interactions(data)
        elif cfg.model.spmm_mode == "hybrid":
            import jax.numpy as _jnp

            from gsrs_tpu.ops.hybrid import hybrid_from_interactions

            ell = hybrid_from_interactions(
                data,
                cols=cfg.model.hybrid_cols,
                dtype=_jnp.bfloat16 if cfg.model.bf16_compute else _jnp.float32,
            )
        elif cfg.model.spmm_mode == "tiled":
            import jax.numpy as _jnp

            from gsrs_tpu.ops.tiled import tiled_from_interactions

            ell = tiled_from_interactions(
                data,
                groups=cfg.model.tiled_groups,
                cols=cfg.model.tiled_cols,
                dtype=_jnp.bfloat16 if cfg.model.bf16_compute else _jnp.float32,
            )
    model = build_model(
        cfg.model, graph, i2i, ell, cache_dir=cfg.data.dataset_dir
    )
    trainer = Trainer(cfg, data, graph, model)
    if args.epoch_samples:
        trainer.epoch_samples = args.epoch_samples
    log_dir = os.path.join(cfg.train.checkpoint_dir, "runs")
    trainer.fit(log_dir=log_dir)


if __name__ == "__main__":
    main()
