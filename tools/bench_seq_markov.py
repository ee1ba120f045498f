"""Sequential-family planted-order benchmark (VERDICT r1 item 7 fallback).

MovieLens (the item's requested temporal dataset) is unfetchable in this
environment (zero network egress) and no temporal interaction data
exists in the reference snapshot (lastfm has no timestamps; instacart
was stripped). This benchmark instead PLANTS the order signal: cluster-
Markov walks (gsrs_tpu.data.sequences.synthetic_markov_sequences) where
the next item is predictable only from the recent items' cluster. Models
that exploit sequence order must decisively beat both chance and a
popularity ranker (order-blind); order-weak models cannot.

This gives the seq family a flagship benchmark whose ordering is
guaranteed meaningful, unlike the round-1 lastfm file-order caveat.

Usage: python tools/bench_seq_markov.py [--epochs 60]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def popularity_baseline(data, topks):
    """Order-blind ranker: global item frequency, per-user masking of
    history (same protocol as SeqTrainer.evaluate)."""
    import numpy as np

    counts = np.bincount(
        data.train_seqs.reshape(-1), minlength=data.m_items + 1
    )[1:]  # ids are 1-based in seqs; 0 is padding
    out = {}
    for k in topks:
        hits = ndcg = 0.0
        for u, tgt in zip(data.eval_users, data.eval_targets):
            c = counts.copy()
            hist = data.train_seqs[u]
            c[hist[hist > 0] - 1] = -1  # mask history
            top = np.argpartition(-c, k)[:k]
            top = top[np.argsort(-c[top])]
            rank = np.where(top == (tgt - 1))[0]
            if rank.size:
                hits += 1.0
                ndcg += 1.0 / np.log2(rank[0] + 2)
        n = len(data.eval_users)
        out[f"recall@{k}"] = hits / n
        out[f"ndcg@{k}"] = ndcg / n
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--n_users", type=int, default=4000)
    ap.add_argument("--m_items", type=int, default=1000)
    ap.add_argument("--clusters", type=int, default=20)
    ap.add_argument("--max_len", type=int, default=30)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    from gsrs_tpu.data.sequences import synthetic_markov_sequences
    from gsrs_tpu.models.registry import build_seq_model
    from gsrs_tpu.train.seq_trainer import SeqTrainer

    data = synthetic_markov_sequences(
        n_users=args.n_users, m_items=args.m_items,
        n_clusters=args.clusters, max_len=args.max_len, seed=11,
    )
    topks = (10, 20)
    chance = {f"recall@{k}": k / args.m_items for k in topks}
    print(json.dumps({"model": "chance", **{k: round(v, 5) for k, v in chance.items()}}))
    pop = popularity_baseline(data, topks)
    print(json.dumps({"model": "popularity", **{k: round(v, 5) for k, v in pop.items()}}))

    for kind in ("sasrec", "gru4rec", "bert4rec"):
        model = build_seq_model(
            kind, m_items=args.m_items, max_len=args.max_len,
            dim=args.dim, hidden=args.dim, blocks=2, heads=2, dropout=0.2,
        )
        tr = SeqTrainer(model, data, batch_size=256, lr=1e-3, seed=0,
                        topks=topks, eval_batch=512)
        state = tr.init_state()
        t0 = time.time()
        for _ in range(args.epochs):
            state, loss = tr.train_epoch(state)
        dt = time.time() - t0
        m = tr.evaluate(state)
        print(json.dumps({
            "model": kind,
            **{k: round(v, 5) for k, v in m.items()},
            "train_s": round(dt, 1),
            "epochs": args.epochs,
            "vs_popularity_recall@10": round(
                m["recall@10"] / max(pop["recall@10"], 1e-9), 2
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
