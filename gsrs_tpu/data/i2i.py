"""Item-item co-occurrence graph builder (offline).

Vectorized scipy re-implementation of the reference's Instacart i2i
pipeline (reference preprocess_instacart_i2i.py:91-170): basket (= user)
co-occurrence counting, cooc / Jaccard / positive-PMI weighting,
per-item top-k neighbor pruning, max-symmetrization, and symmetric
``D^-1/2 A D^-1/2`` normalization. The result feeds the model's i2i
smoothing term (reference code/model.py:228-229 →
`gsrs_tpu.models.lightgcn.ItemItemGraph`).

Run as a CLI:
  python -m gsrs_tpu.data.i2i --dataset_dir data/instacart \
      --scheme ppmi --topk 20 --out data/instacart/i2i_adj.npz
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from gsrs_tpu.data.dataset import InteractionData


def cooccurrence_counts(data: InteractionData) -> sp.csr_matrix:
    """C[i, j] = number of users (baskets) containing both i and j;
    diagonal zeroed (reference preprocess_instacart_i2i.py:91-108)."""
    R = data.user_item_net
    C = (R.T @ R).tocsr()
    C.setdiag(0)
    C.eliminate_zeros()
    return C.astype(np.float64)


def weight_matrix(
    C: sp.csr_matrix, item_degrees: np.ndarray, scheme: str
) -> sp.csr_matrix:
    """Reweight co-occurrence counts (reference
    preprocess_instacart_i2i.py:111-132):

    - ``cooc``: raw counts,
    - ``jaccard``: c / (d_i + d_j − c),
    - ``ppmi``: max(0, log( (c/T) / ((d_i/T)(d_j/T)) )) with T = total
      interactions; non-positive PMI entries are dropped.
    """
    if scheme == "cooc":
        return C.copy()
    coo = C.tocoo()
    deg = np.asarray(item_degrees, dtype=np.float64)
    di, dj, c = deg[coo.row], deg[coo.col], coo.data
    if scheme == "jaccard":
        vals = c / np.maximum(di + dj - c, 1e-12)
    elif scheme == "ppmi":
        T = deg.sum()
        with np.errstate(divide="ignore"):
            vals = np.log(np.maximum(c * T / np.maximum(di * dj, 1e-12), 1e-300))
        vals = np.maximum(vals, 0.0)
    else:
        raise ValueError(f"unknown i2i weighting scheme: {scheme!r}")
    out = sp.csr_matrix((vals, (coo.row, coo.col)), shape=C.shape)
    out.eliminate_zeros()
    return out


def topk_prune(A: sp.csr_matrix, k: int) -> sp.csr_matrix:
    """Keep each row's k largest-weight entries (reference uses a heap per
    item, preprocess_instacart_i2i.py:136-150; vectorized here per row)."""
    A = A.tocsr()
    keep = np.zeros(A.nnz, dtype=bool)
    for r in range(A.shape[0]):
        s, e = A.indptr[r], A.indptr[r + 1]
        if e - s <= k:
            keep[s:e] = True
        else:
            top = np.argpartition(A.data[s:e], -(k))[-k:]
            keep[s + top] = True
    coo = A.tocoo()
    return sp.csr_matrix(
        (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=A.shape
    )


def symmetrize_and_normalize(A: sp.csr_matrix) -> sp.csr_matrix:
    """max(A, Aᵀ) then symmetric degree normalization D^-1/2 A D^-1/2
    (reference preprocess_instacart_i2i.py:161-168); zero-degree rows
    normalize to zero."""
    M = A.maximum(A.T).tocsr()
    d = np.asarray(M.sum(axis=1)).ravel()
    with np.errstate(divide="ignore"):
        dinv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-300)), 0.0)
    D = sp.diags(dinv)
    return (D @ M @ D).tocsr()


def build_item_item(
    data: InteractionData, scheme: str = "cooc", topk: int = 10
) -> sp.csr_matrix:
    """Full pipeline: counts → weighting → top-k prune → symmetrize +
    normalize. Returns the (m × m) CSR the model's i2i fusion consumes.

    Degrees for the weighting are BINARY basket counts (rows of the
    deduplicated interaction matrix) so they stay consistent with the
    binary co-occurrence counts when train.txt repeats a (user, item)
    pair — `data.item_degrees` counts duplicates."""
    C = cooccurrence_counts(data)
    binary_deg = np.asarray(data.user_item_net.sum(axis=0)).ravel()
    W = weight_matrix(C, binary_deg, scheme)
    P = topk_prune(W, topk)
    return symmetrize_and_normalize(P)


def main(argv=None) -> None:
    import argparse

    from gsrs_tpu.data.dataset import load_dataset

    ap = argparse.ArgumentParser(prog="gsrs_tpu.data.i2i")
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--scheme", choices=["cooc", "jaccard", "ppmi"], default="cooc")
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    data = load_dataset(args.dataset_dir)
    A = build_item_item(data, scheme=args.scheme, topk=args.topk)
    sp.save_npz(args.out, A)
    print(f"[i2i] wrote {args.out}: {A.shape[0]} items, {A.nnz} edges")


if __name__ == "__main__":
    main()
