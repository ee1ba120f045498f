"""Sequential-family epoch time on the real TPU chip.

The seq stack's quality numbers come from the CPU planted-order
benchmark (tools/bench_seq_markov.py); this measures what the same
models cost per epoch ON THE CHIP at a production-ish shape
(100k users × 20k items × len-64 sequences, batch 1024, d128) — the
first TPU timing for the family the repo is half-named for. No
reference counterpart exists (the reference ships no sequential code,
SURVEY §0).

Usage: python tools/bench_seq_tpu.py [--epochs 3]
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
    ap.add_argument("--n_users", type=int, default=100_000)
    ap.add_argument("--m_items", type=int, default=20_000)
    ap.add_argument("--max_len", type=int, default=64)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from gsrs_tpu.data.sequences import synthetic_markov_sequences
    from gsrs_tpu.models.registry import build_seq_model
    from gsrs_tpu.train.seq_trainer import SeqTrainer

    data = synthetic_markov_sequences(
        n_users=args.n_users, m_items=args.m_items,
        n_clusters=50, max_len=args.max_len, seed=3,
    )
    for kind in ("sasrec", "gru4rec", "bert4rec"):
        model = build_seq_model(
            kind, m_items=args.m_items, max_len=args.max_len,
            dim=args.dim, hidden=args.dim, blocks=2, heads=2,
            dropout=0.2, bf16=True,
        )
        tr = SeqTrainer(model, data, batch_size=args.batch, lr=1e-3,
                        seed=0, topks=(10,), eval_batch=2048)
        state = tr.init_state()
        state, _ = tr.train_epoch(state)  # compile + warm
        t0 = time.time()
        for _ in range(args.epochs):
            state, loss = tr.train_epoch(state)
        epoch_s = (time.time() - t0) / args.epochs
        tr.evaluate(state)  # compile
        t0 = time.time()
        m = tr.evaluate(state)
        print(json.dumps({
            "model": kind,
            "epoch_s": round(epoch_s, 3),
            "seqs_per_s": round(args.n_users / epoch_s),
            "eval_s": round(time.time() - t0, 3),
            "recall@10": round(m.get("recall@10", 0.0), 5),
        }), flush=True)


if __name__ == "__main__":
    main()
