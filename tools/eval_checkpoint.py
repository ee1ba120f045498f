"""Evaluate a saved checkpoint on the full test split (one-off).

Usage:
  python tools/eval_checkpoint.py --checkpoint_dir checkpoints/long_b8192 \
      --dataset gowalla [--bf16] [--layer 3] [--recdim 64] [--topks "[20]"]

Works for both families: if the checkpoint dir's model_meta.json names a
sequential model (sasrec/gru4rec/bert4rec), the dataset is converted to
leave-last-out sequences and evaluated through SeqTrainer; otherwise the
graph path runs. Model hyperparameters come from model_meta.json when
present (CLI flags are the fallback for older checkpoints).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--dataset", default="gowalla")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--model", default="lgn")
    ap.add_argument("--layer", type=int, default=3)
    ap.add_argument("--recdim", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--topks", default="[20]")
    ap.add_argument("--testbatch", type=int, default=2048)
    args = ap.parse_args()

    from gsrs_tpu.config import (
        EvalConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
        topks_from_string,
    )
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.data.dataset import load_dataset
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions
    from gsrs_tpu.train.trainer import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ddir = os.path.join(args.data_root or os.path.join(repo, "data"), args.dataset)
    if args.dataset == "lastfm":
        from gsrs_tpu.data.dataset import load_lastfm

        data = load_lastfm(ddir)
    else:
        data = load_dataset(ddir, name=args.dataset)

    import json

    meta = None
    meta_path = os.path.join(args.checkpoint_dir, "model_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        print(f"[eval] using {meta_path}")

    from gsrs_tpu.models.registry import SEQ_MODELS

    if meta is not None and meta.get("kind") in SEQ_MODELS:
        _eval_sequential(args, data, meta)
        return

    graph = build_graph(data, cache_dir=ddir)
    if meta is not None:
        model_cfg = ModelConfig(**meta)
    else:
        model_cfg = ModelConfig(
            model=args.model,
            num_layers=args.layer,
            embedding_dim=args.recdim,
            bf16_compute=args.bf16,
        )
    cfg = ExperimentConfig(
        model=model_cfg,
        train=TrainConfig(
            checkpoint_dir=args.checkpoint_dir, resume=True, tensorboard=False
        ),
        eval=EvalConfig(
            test_batch=args.testbatch, topks=topks_from_string(args.topks)
        ),
    )
    i2i = None
    if cfg.model.use_item_item and cfg.model.i2i_path:
        # evaluating an i2i-trained checkpoint WITHOUT the i2i graph would
        # silently score different embeddings than training produced
        import scipy.sparse as sp

        from gsrs_tpu.models.lightgcn import ItemItemGraph

        i2i = ItemItemGraph.from_scipy(sp.load_npz(cfg.model.i2i_path))
    model = build_model(
        cfg.model, graph, i2i=i2i, ell=ell_from_interactions(data)
    )
    trainer = Trainer(cfg, data, graph, model)
    if trainer.ckpt.resolve_resume_path(None) is None:
        raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
    state = trainer.maybe_resume(trainer.init_state())
    print(f"[eval] checkpoint epoch {state.epoch}")
    metrics = trainer.evaluate(state)
    print(
        f"[eval e{state.epoch}] "
        + " ".join(f"{k}={v:.5f}" for k, v in sorted(metrics.items()))
    )


def _eval_sequential(args, data, meta) -> None:
    from gsrs_tpu.config import topks_from_string
    from gsrs_tpu.data.sequences import sequences_from_interactions
    from gsrs_tpu.models.registry import build_seq_model
    from gsrs_tpu.train.checkpoint import CheckpointManager
    from gsrs_tpu.train.seq_trainer import SeqTrainer

    seq_data = sequences_from_interactions(data, max_len=meta["max_len"])
    model = build_seq_model(
        meta["kind"],
        m_items=seq_data.m_items,
        max_len=meta["max_len"],
        dim=meta["dim"],
        hidden=meta["hidden"],
        blocks=meta["blocks"],
        heads=meta["heads"],
        dropout=0.0,
    )
    trainer = SeqTrainer(
        model,
        seq_data,
        eval_batch=args.testbatch,
        topks=topks_from_string(args.topks),
    )
    state = trainer.init_state()
    ckpt = CheckpointManager(args.checkpoint_dir)
    path = ckpt.resolve_resume_path(None)
    if path is None:
        raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
    restored = ckpt.restore(path, trainer._ckpt_state(state))
    state = trainer._from_ckpt_state(restored)
    print(f"[eval] checkpoint epoch {state.epoch} ({meta['kind']})")
    metrics = trainer.evaluate(state)
    print(
        f"[eval e{state.epoch}] "
        + " ".join(f"{k}={v:.5f}" for k, v in sorted(metrics.items()))
    )


if __name__ == "__main__":
    main()
