"""BERT4Rec diagnosis sweep on the planted-order benchmark (VERDICT r2
item 3: BERT4Rec trailed its causal siblings 3× — recall@10 0.06775 vs
SASRec 0.2205).

Hypothesis under test: train/eval distribution mismatch. The retrieval
query masks ONLY the last position with clean past context; random cloze
almost never produces that sample (when the last position is masked,
~mask_prob of the context is corrupted too, and the bidirectional model
leans on future items that don't exist at eval). Fix: last-only
next-item samples (BERT4RecConfig.last_only_prob — Sun et al. 2019
§3.4 do the same).

Usage: python tools/diag_bert4rec.py [--epochs 60]
Writes one JSON line per config.
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
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--configs", type=str, default=None,
                    help="comma-sep list of mask_prob:last_only pairs")
    args = ap.parse_args()

    from gsrs_tpu.data.sequences import synthetic_markov_sequences
    from gsrs_tpu.models.registry import build_seq_model
    from gsrs_tpu.train.seq_trainer import SeqTrainer

    data = synthetic_markov_sequences(
        n_users=4000, m_items=1000, n_clusters=20, max_len=30, seed=11,
    )
    if args.configs:
        configs = [
            tuple(float(x) for x in c.split(":"))
            for c in args.configs.split(",")
        ]
    else:
        configs = [
            (0.3, 0.0),  # round-2 behavior (reproduces the 0.068)
            (0.3, 0.1),
            (0.3, 0.3),
            (0.3, 0.5),
            (0.2, 0.3),
        ]
    for mask_prob, last_only in configs:
        model = build_seq_model(
            "bert4rec", m_items=1000, max_len=30, dim=64, hidden=64,
            blocks=2, heads=2, dropout=0.2,
            mask_prob=mask_prob, last_only_prob=last_only,
        )
        tr = SeqTrainer(model, data, batch_size=256, lr=1e-3, seed=0,
                        topks=(10, 20), eval_batch=512)
        state = tr.init_state()
        t0 = time.time()
        for _ in range(args.epochs):
            state, loss = tr.train_epoch(state)
        m = tr.evaluate(state)
        print(json.dumps({
            "mask_prob": mask_prob,
            "last_only_prob": last_only,
            "epochs": args.epochs,
            **{k: round(v, 5) for k, v in m.items()},
            "train_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
