"""Aggregate the b131072 parity seed-replication runs into the
mean ± std table VERDICT r4 item 1 asks for (SURVEY §7 hard-part 4:
parity must be argued statistically because RNG streams differ from the
reference — the bar is the reference's own best recorded run,
/root/reference/LightGCN_work/README.md:87-94).

Reads results/b131072-parity-valid.csv (the recorded r4 seed-2020 run)
plus every results/b131072-seed*-valid.csv; reports per-seed bests and
across-seed mean/std/min for each metric, and whether mean − σ clears
the reference bar.

Usage: python tools/seed_stats.py [--glob 'results/b131072-seed*-valid.csv']
"""

import argparse
import csv
import glob
import json
import math
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_BEST = {"recall@20": 0.18250, "ndcg@20": 0.15456,
                  "precision@20": 0.05596}
REFERENCE_PUBLISHED = {"recall@20": 0.1824, "ndcg@20": 0.1547,
                       "precision@20": 0.05589}


def best_metrics(path):
    rows = list(csv.DictReader(open(path)))
    if not rows:
        return None
    out = {}
    for m in REFERENCE_BEST:
        vals = [(float(r[m]), int(r["epoch"])) for r in rows]
        v, e = max(vals)
        out[m] = v
        out[m + "_epoch"] = e
    out["evals"] = len(rows)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--glob", default=os.path.join(REPO, "results", "b131072-seed*-valid.csv")
    )
    ap.add_argument(
        "--base", default=os.path.join(REPO, "results", "b131072-parity-valid.csv"),
        help="the recorded round-4 seed-2020 run (set '' to exclude)",
    )
    args = ap.parse_args()

    runs = {}
    if args.base and os.path.exists(args.base):
        runs["seed2020(r4)"] = best_metrics(args.base)
    for p in sorted(glob.glob(args.glob)):
        name = os.path.basename(p).replace("-valid.csv", "")
        runs[name] = best_metrics(p)
    runs = {k: v for k, v in runs.items() if v}
    if not runs:
        print(json.dumps({"error": "no seed runs found"}))
        return

    stats = {}
    for m, bar in REFERENCE_BEST.items():
        xs = [v[m] for v in runs.values()]
        n = len(xs)
        mean = sum(xs) / n
        std = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1)) if n > 1 else 0.0
        stats[m] = {
            "n_seeds": n,
            "mean": round(mean, 6),
            "std": round(std, 6),
            "min": round(min(xs), 6),
            "max": round(max(xs), 6),
            "reference_best": bar,
            "reference_published": REFERENCE_PUBLISHED[m],
            "mean_minus_sigma": round(mean - std, 6),
            "clears_ref_best_at_mean_minus_sigma": mean - std > bar,
            "seeds_above_ref_best": sum(x > bar for x in xs),
        }
    print(json.dumps({"per_seed": runs, "stats": stats}, indent=1))


if __name__ == "__main__":
    main()
