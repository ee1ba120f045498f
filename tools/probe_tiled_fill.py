"""Tiled/block-sparse SpMM fill analysis (VERDICT r4 item 3).

The hybrid SpMM's winning idea is: any submatrix whose density clears
~0.073% is cheaper as a streamed dense MXU block than as ELL gathers
(break-even: one gathered row costs 1/300e6 s at the measured issue
rate; one streamed bf16 cell costs 2/819e9 s → rho* = 2*300e6/819e9).
The global-hub split applies that to whole COLUMNS (top-C per
direction) and moves 50-80% of edges onto the MXU. This tool asks the
generalization question OFFLINE (pure numpy, no chip): after reordering
rows and columns, what fraction of edges lands in (tr x tc) TILES above
the same break-even — and at what dense-block HBM cost?

Orders tried:
- native (no reorder) — baseline;
- degree (rows and cols sorted by degree, descending) — concentrates
  mass toward the top-left corner;
- spectral (k-dim truncated SVD of the normalized adjacency, k-means on
  the leading left/right singular vectors, clusters ordered by size) —
  the "cluster if cheap" variant;
- each compared to the hybrid global-hub coverage at C=8192.

Output: one JSON line per (dataset, order, tile) with edge coverage,
dense area, projected per-layer stream vs gather time. Decision rule
(VERDICT): tiles win only if coverage beats global-hub coverage at
comparable HBM budget — otherwise record the refutation in BENCH_NOTES.

Usage: python tools/probe_tiled_fill.py [--dataset gowalla|amazon]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RHO_STAR = 2 * 300e6 / 819e9  # dense-vs-gather break-even density
GATHER_ROWS_PER_S = 300e6
HBM_BPS = 819e9


def tile_stats(rows, cols, n, m, tr, tc, order_r, order_c):
    """Edges (rows, cols) under row order order_r / col order order_c
    (permutations: new_index = order[old_index]); returns per-tile nnz."""
    r = order_r[rows] // tr
    c = order_c[cols] // tc
    nbr = -(-n // tr)
    nbc = -(-m // tc)
    counts = np.bincount(r.astype(np.int64) * nbc + c, minlength=nbr * nbc)
    return counts, nbr, nbc


def analyze(rows, cols, n, m, tr, tc, order_r, order_c, budget_gb=4.0):
    counts, nbr, nbc = tile_stats(rows, cols, n, m, tr, tc, order_r, order_c)
    area = tr * tc
    E = rows.size
    # greedy: take tiles in decreasing density until the HBM budget is
    # spent or density falls below break-even (both directions share the
    # budget; report one direction here, the transpose is symmetric-ish)
    nz = counts[counts > 0]
    dens = np.sort(nz)[::-1] / area
    take = dens >= RHO_STAR
    bytes_per_tile = area * 2  # bf16
    max_tiles = int(budget_gb * 1024**3 / 2 / bytes_per_tile)  # /2: 2 dirs
    taken = np.minimum(take.sum(), max_tiles)
    covered = int((dens[:taken] * area).sum())
    dense_bytes = int(taken) * bytes_per_tile
    resid = E - covered
    t_dense = dense_bytes / HBM_BPS
    t_resid = resid / GATHER_ROWS_PER_S
    t_all_gather = E / GATHER_ROWS_PER_S
    return {
        "tiles_taken": int(taken),
        "coverage": round(covered / E, 4),
        "dense_MiB": round(dense_bytes / 2**20, 1),
        "per_layer_s_tiled": round(t_dense + t_resid, 5),
        "per_layer_s_pure_gather": round(t_all_gather, 5),
        "speedup_vs_gather": round(t_all_gather / (t_dense + t_resid), 2),
    }


def hub_reference(rows, cols, n, m, C=8192):
    """The hybrid global-hub split's coverage/cost at top-C columns."""
    deg = np.bincount(cols, minlength=m)
    top = np.argsort(deg)[::-1][:C]
    in_hub = np.zeros(m, bool)
    in_hub[top] = True
    covered = int(in_hub[cols].sum())
    E = rows.size
    dense_bytes = n * C * 2
    t = dense_bytes / HBM_BPS + (E - covered) / GATHER_ROWS_PER_S
    return {
        "coverage": round(covered / E, 4),
        "dense_MiB": round(dense_bytes / 2**20, 1),
        "per_layer_s_hub": round(t, 5),
        "speedup_vs_gather": round(
            (E / GATHER_ROWS_PER_S) / t, 2
        ),
    }


def spectral_orders(rows, cols, n, m, k=16, seed=0):
    import scipy.sparse as sp
    from scipy.sparse.linalg import svds

    w = np.ones(rows.size, np.float32)
    du = np.bincount(rows, minlength=n).astype(np.float32)
    di = np.bincount(cols, minlength=m).astype(np.float32)
    w /= np.sqrt(np.maximum(du[rows], 1) * np.maximum(di[cols], 1))
    A = sp.coo_matrix((w, (rows, cols)), shape=(n, m)).tocsr()
    u, s, vt = svds(A, k=k)

    def kmeans_order(X, n_clusters=64, iters=10):
        rng = np.random.default_rng(seed)
        cent = X[rng.choice(X.shape[0], n_clusters, replace=False)]
        for _ in range(iters):
            d2 = ((X[:, None, :] - cent[None]) ** 2).sum(-1) \
                if X.shape[0] < 20000 else None
            if d2 is None:
                # blockwise distance for big X
                lab = np.empty(X.shape[0], np.int32)
                for s0 in range(0, X.shape[0], 16384):
                    blk = X[s0:s0 + 16384]
                    dd = ((blk[:, None, :] - cent[None]) ** 2).sum(-1)
                    lab[s0:s0 + 16384] = dd.argmin(1)
            else:
                lab = d2.argmin(1)
            for c in range(n_clusters):
                sel = lab == c
                if sel.any():
                    cent[c] = X[sel].mean(0)
        # order: by cluster, then by norm inside the cluster
        key = lab.astype(np.float64) * 1e6 - (X**2).sum(1)
        order = np.empty(X.shape[0], np.int64)
        order[np.argsort(key, kind="stable")] = np.arange(X.shape[0])
        return order

    return kmeans_order(u * s), kmeans_order(vt.T * s)


def grouped_hub_stats(rows, cols, n, m, order_r, G, C):
    """Per-row-group hub columns: rows grouped into G contiguous groups
    under order_r; each group denses its own top-C columns (arbitrary
    ids — the TPU implementation gathers only G*C source rows, unlike
    contiguous col-block tiles which need a per-tile block-gather copy).
    Strictly generalizes the global-hub split (G=1)."""
    gsz = -(-n // G)
    g = order_r[rows] // gsz
    E = rows.size
    covered = 0
    for gi in range(G):
        sel = g == gi
        if not sel.any():
            continue
        deg = np.bincount(cols[sel], minlength=m)
        c = min(C, m)
        top = np.argpartition(deg, m - c)[m - c:]
        covered += int(deg[top].sum())
    dense_bytes = n * C * 2  # bf16 (each row stores its group's C cols)
    t = dense_bytes / HBM_BPS + (E - covered) / GATHER_ROWS_PER_S \
        + G * C / GATHER_ROWS_PER_S  # + the hub-row gather
    return {
        "coverage": round(covered / E, 4),
        "dense_MiB": round(dense_bytes / 2**20, 1),
        "per_layer_s": round(t, 5),
        "speedup_vs_gather": round((E / GATHER_ROWS_PER_S) / t, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gowalla",
                    choices=["gowalla", "amazon"])
    ap.add_argument("--budget_gb", type=float, default=4.0)
    args = ap.parse_args()

    if args.dataset == "gowalla":
        from gsrs_tpu.data.dataset import load_dataset

        data = load_dataset(os.path.join(REPO, "data", "gowalla"))
        rows = data.train_users.astype(np.int64)
        cols = data.train_items.astype(np.int64)
        n, m = data.n_users, data.m_items
    else:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "stress_pod", os.path.join(REPO, "tools", "stress_pod.py")
        )
        sp_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sp_mod)
        data = sp_mod.big_synthetic(52643, 91599, avg_degree=57, seed=0)
        rows = data.train_users.astype(np.int64)
        cols = data.train_items.astype(np.int64)
        n, m = data.n_users, data.m_items

    E = rows.size
    print(json.dumps({"dataset": args.dataset, "n": n, "m": m, "edges": E,
                      "rho_star": round(RHO_STAR, 6)}), flush=True)
    print(json.dumps({"hub_C8192": hub_reference(rows, cols, n, m)}),
          flush=True)

    ident_r = np.arange(n)
    ident_c = np.arange(m)
    deg_r = np.empty(n, np.int64)
    deg_r[np.argsort(np.bincount(rows, minlength=n))[::-1]] = np.arange(n)
    deg_c = np.empty(m, np.int64)
    deg_c[np.argsort(np.bincount(cols, minlength=m))[::-1]] = np.arange(m)
    orders = {"native": (ident_r, ident_c), "degree": (deg_r, deg_c)}
    try:
        orders["spectral"] = spectral_orders(rows, cols, n, m)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"spectral": f"skipped: {e}"}), flush=True)

    for oname, (orr, orc) in orders.items():
        for tr, tc in ((128, 128), (32, 128), (256, 256), (512, 512),
                       (1024, 1024)):
            res = analyze(rows, cols, n, m, tr, tc, orr, orc,
                          args.budget_gb)
            res.update({"order": oname, "tile": f"{tr}x{tc}"})
            print(json.dumps(res), flush=True)

    # grouped hubs: per-row-group top-C columns (the TPU-implementable
    # generalization — G*C gathered source rows, no per-tile copy)
    for oname, (orr, _) in orders.items():
        for G, C in ((8, 8192), (32, 4096), (64, 2048), (128, 2048),
                     (64, 4096), (256, 1024)):
            res = grouped_hub_stats(rows, cols, n, m, orr, G, C)
            res.update({"order": oname, "scheme": f"G{G}xC{C}"})
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
