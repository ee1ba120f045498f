"""CLI for the sequential recommendation family (SASRec / GRU4Rec / BERT4Rec).

The reference repo's name promises sequential recommendation but has no
code for it; this is the training entry point for the TPU-native family:

  python -m gsrs_tpu.seq_cli --dataset gowalla --model sasrec --epochs 50
  python -m gsrs_tpu.seq_cli --synthetic --model gru4rec

Sequences come from per-user interaction order (leave-last-item-out);
metrics are HR@k (recall with one ground-truth item) and NDCG@k over the
full catalog with history masking.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gsrs_tpu.seq")
    p.add_argument(
        "--model", choices=["sasrec", "gru4rec", "bert4rec"], default="sasrec"
    )
    p.add_argument("--dataset", type=str, default="gowalla")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true", help="markov synthetic data")
    p.add_argument("--max_len", type=int, default=50)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--blocks", type=int, default=2, help="attention blocks / GRU layers")
    p.add_argument("--heads", type=int, default=1)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--decay", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--topks", type=str, default="[10,20]")
    p.add_argument("--seed", type=int, default=2020)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data_axis", type=int, default=1)
    p.add_argument("--model_axis", type=int, default=1)
    p.add_argument("--tensorboard", type=int, default=0)
    p.add_argument("--comment", type=str, default="")
    return p


def main(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)

    from gsrs_tpu.config import topks_from_string
    from gsrs_tpu.data.sequences import (
        sequences_from_interactions,
        synthetic_markov_sequences,
    )
    from gsrs_tpu.train.seq_trainer import SeqTrainer

    if args.synthetic:
        seq_data = synthetic_markov_sequences(max_len=args.max_len, seed=args.seed)
    else:
        from gsrs_tpu.data.dataset import load_dataset, load_lastfm

        data_root = args.data_root or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
        )
        ddir = os.path.join(data_root, args.dataset)
        if args.dataset == "lastfm":  # reference-shipped format, no train.txt
            data = load_lastfm(ddir)
        else:
            data = load_dataset(ddir, name=args.dataset)
        seq_data = sequences_from_interactions(data, max_len=args.max_len)
    print(
        f"[seq] {seq_data.name}: {len(seq_data.train_seqs)} sequences, "
        f"{seq_data.m_items} items, max_len {seq_data.max_len}"
    )

    from gsrs_tpu.models.registry import build_seq_model

    model = build_seq_model(
        args.model,
        m_items=seq_data.m_items,
        max_len=args.max_len,
        dim=args.dim,
        hidden=args.hidden,
        blocks=args.blocks,
        heads=args.heads,
        dropout=args.dropout,
        bf16=args.bf16,
    )

    mesh = None
    if args.data_axis * args.model_axis > 1:
        from gsrs_tpu.parallel.mesh import distributed_init, make_mesh

        distributed_init()
        mesh = make_mesh(data_axis=args.data_axis, model_axis=args.model_axis)
        print(f"[seq] mesh: data={args.data_axis} × model={args.model_axis}")

    trainer = SeqTrainer(
        model,
        seq_data,
        batch_size=args.batch,
        lr=args.lr,
        decay=args.decay,
        seed=args.seed,
        topks=topks_from_string(args.topks),
        mesh=mesh,
    )
    trainer.fit(
        epochs=args.epochs,
        checkpoint_dir=args.checkpoint_dir,
        eval_every=args.eval_every,
        resume=args.resume,
        tensorboard=bool(args.tensorboard),
        comment=args.comment,
    )


if __name__ == "__main__":
    main()
