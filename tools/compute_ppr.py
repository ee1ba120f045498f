"""Personalized-PageRank layer-weight computer.

Port-of-capability for the reference's deprecated compute_ppr.py
(reference code/compute_ppr.py:25-61): per-node PPR mass per hop k —
row sums of alpha(1-alpha)^k T^k for k=0..K over the row-stochastic
transition matrix — row-normalized into an (N, K+1) layer-weight matrix
saved as .npy. The reference discarded this experiment (its live model
uses the uniform 1/(K+1) layer mean, code/model.py:222) and its CLI flags
are parsed but unread; this tool exists for capability parity should the
experiment be revived.

Usage: python tools/compute_ppr.py --dataset_dir data/gowalla --alpha 0.15 --layers 3 --out ppr.npy
"""

import argparse
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsrs_tpu.data.dataset import load_dataset


def compute_ppr_weights(adj: sp.csr_matrix, alpha: float, layers: int) -> np.ndarray:
    """(N, layers+1) row-normalized PPR hop-mass weights."""
    deg = np.asarray(adj.sum(axis=1)).ravel()
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-300), 0.0)
    T = sp.diags(inv) @ adj  # row-stochastic
    n = adj.shape[0]
    weights = np.zeros((n, layers + 1))
    x = np.ones(n)
    for k in range(layers + 1):
        weights[:, k] = alpha * (1 - alpha) ** k * x
        if k < layers:
            x = T @ x
    rowsum = weights.sum(axis=1, keepdims=True)
    return weights / np.maximum(rowsum, 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--alpha", type=float, default=0.15)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--out", default="ppr_weights.npy")
    args = ap.parse_args()

    data = load_dataset(args.dataset_dir)
    n, m = data.n_users, data.m_items
    R = data.user_item_net
    adj = sp.bmat(
        [[None, R], [R.T, None]], format="csr", dtype=np.float64
    )
    assert adj.shape == (n + m, n + m), (adj.shape, n, m)
    W = compute_ppr_weights(adj, args.alpha, args.layers)
    np.save(args.out, W)
    print(f"wrote {args.out}: shape {W.shape}")


if __name__ == "__main__":
    main()
