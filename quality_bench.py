"""Re-derive the headline quality numbers from TRACKED artifacts.

Every quality claim in BENCH_NOTES must be traceable to a CSV under
results/ (VERDICT r1 item 4: the round-1 parity log lived in gitignored
checkpoints/ and was lost). This script scans results/*-valid.csv (the
eval trajectories the trainer writes, copied per run) and prints, per
run: best recall@20 / ndcg@20 / precision@20, the epoch of the best, and
the verdict vs the reference's published Gowalla ceiling.

Reference bar (BASELINE.md): best recall@20 0.18250, ndcg@20 0.15456,
precision@20 0.05596 (the reference repo's own TensorBoard-recorded best
3-layer Gowalla run; published table rounds to 0.1824/0.1547/0.05589).

Usage: python quality_bench.py [--results_dir results]
"""

import argparse
import csv
import glob
import json
import os

REFERENCE = {"recall@20": 0.18250, "ndcg@20": 0.15456,
             "precision@20": 0.05596}


def summarize(path):
    rows = list(csv.DictReader(open(path)))
    if not rows:
        return None
    best = {}
    for metric in ("recall@20", "ndcg@20", "precision@20"):
        vals = [(float(r[metric]), int(r["epoch"])) for r in rows if metric in r]
        if vals:
            v, e = max(vals)
            best[metric] = {"value": v, "epoch": e}
    last = rows[-1]
    return {
        "run": os.path.basename(path).replace("-valid.csv", ""),
        "evals": len(rows),
        "last_epoch": int(last["epoch"]),
        "best": best,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results"))
    args = ap.parse_args()

    paths = sorted(glob.glob(os.path.join(args.results_dir, "*-valid.csv")))
    if not paths:
        print("no results/*-valid.csv found")
        return
    for p in paths:
        s = summarize(p)
        if s is None:
            continue
        r = s["best"].get("recall@20", {}).get("value", 0.0)
        s["vs_reference_recall"] = round(r / REFERENCE["recall@20"], 4)
        s["parity"] = bool(r >= REFERENCE["recall@20"])
        print(json.dumps(s))


if __name__ == "__main__":
    main()
