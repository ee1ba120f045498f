"""Normalized bipartite adjacency as padded, pre-sorted edge arrays.

The reference materializes the (n+m)² symmetric adjacency
``A = [[0, R], [Rᵀ, 0]]`` and normalizes it ``D^-1/2 A D^-1/2`` as a
torch sparse COO tensor (reference code/dataloader.py:203-246). On TPU
we never build the square matrix: propagation is two rectangular SpMMs
over the SAME edge set (user←items and item←users), so the graph is kept
as one canonical edge list stored in BOTH sort orders:

- ``edge_*_by_u``: edges sorted by user id → the user-destination SpMM
  consumes sorted segment ids (user rows),
- ``edge_*_by_i``: the same edges sorted by item id → item-destination.

``perm_by_u`` / ``perm_by_i`` are the argsort permutations from the
canonical (file-order + padding) edge list into each sorted order, so a
per-edge value sampled once in canonical order (e.g. a dropout mask,
`gsrs_tpu.ops.spmm.make_edge_dropout_masks`) can be re-laid-out into both
directions and the dropped graph stays symmetric.

Edge counts are padded up to a multiple (weight 0, endpoints pinned to
the max node id so sortedness holds) so jitted shapes stay static across
datasets/epochs. The normalized weights are cached on disk per dataset
dir (same role as the reference's ``s_pre_adj_mat.npz`` cache,
reference code/dataloader.py:213-237).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np

from gsrs_tpu.data.dataset import InteractionData

CACHE_NAME = "norm_edges_cache.npz"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BipartiteGraph:
    """Normalized bipartite graph in both SpMM sort orders (see module
    docstring). All edge arrays have the same padded length; padding
    entries carry weight 0 and endpoints (n_users-1, m_items-1)."""

    edge_u_by_u: np.ndarray  # (E,) int32 user ids, sorted ascending
    edge_i_by_u: np.ndarray  # (E,) int32 item ids, by-user order
    edge_w_by_u: np.ndarray  # (E,) float32 normalized weights, 0 on pad
    edge_i_by_i: np.ndarray  # (E,) int32 item ids, sorted ascending
    edge_u_by_i: np.ndarray  # (E,) int32 user ids, by-item order
    edge_w_by_i: np.ndarray  # (E,) float32
    perm_by_u: np.ndarray  # (E,) int32: by_u[j] = canonical[perm_by_u[j]]
    perm_by_i: np.ndarray  # (E,) int32
    user_degrees: np.ndarray  # (n,) float32 interaction counts
    item_degrees: np.ndarray  # (m,) float32
    n_users: int = dataclasses.field(metadata=dict(static=True))
    m_items: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def padded_edges(self) -> int:
        return int(self.edge_w_by_u.shape[0])


def normalized_edge_weights(
    users: np.ndarray,
    items: np.ndarray,
    user_degrees: np.ndarray,
    item_degrees: np.ndarray,
) -> np.ndarray:
    """Per-edge symmetric normalization ``1/sqrt(d_u · d_i)`` — exactly
    the nonzero entries of ``D^-1/2 [[0,R],[Rᵀ,0]] D^-1/2`` with the
    reference's zero-degree convention (``d^-1/2`` is 0 where d == 0 via
    the where= trick + inf scrub, reference code/dataloader.py:230-234).
    Float64 for bit-stable caching; cast at the device boundary."""
    du = np.asarray(user_degrees, dtype=np.float64)[users]
    di = np.asarray(item_degrees, dtype=np.float64)[items]
    prod = du * di
    with np.errstate(divide="ignore"):
        w = np.where(prod > 0, 1.0 / np.sqrt(np.maximum(prod, 1e-300)), 0.0)
    return w


def dense_normalized_adjacency(data: InteractionData) -> np.ndarray:
    """Dense (n+m)² oracle of the reference's normalized adjacency
    (reference code/dataloader.py:219-235) — for golden tests only."""
    n, m = data.n_users, data.m_items
    A = np.zeros((n + m, n + m), dtype=np.float64)
    A[data.train_users, n + data.train_items] = 1.0
    A[n + data.train_items, data.train_users] = 1.0
    d = A.sum(axis=1)
    with np.errstate(divide="ignore"):
        dinv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-300)), 0.0)
    return dinv[:, None] * A * dinv[None, :]


def _edge_checksum(users: np.ndarray, items: np.ndarray) -> np.int64:
    """Cheap content fingerprint of the edge list: counts alone miss a
    re-split/re-shuffled dataset with identical sizes, which would
    silently reuse stale normalized weights."""
    h = np.int64(1469598103934665603)  # FNV-ish mix over both endpoints
    mix = (
        users.astype(np.int64) * np.int64(1000003)
        + items.astype(np.int64)
        + np.arange(users.size, dtype=np.int64) * np.int64(31)
    )
    return h ^ np.bitwise_xor.reduce(mix) ^ np.int64(mix.sum())


def _load_cached_weights(
    cache_path: str, data: InteractionData
) -> Optional[np.ndarray]:
    try:
        with np.load(cache_path) as z:
            if (
                int(z["n_users"]) != data.n_users
                or int(z["m_items"]) != data.m_items
                or z["weights"].shape[0] != data.train_size
                or "checksum" not in z.files  # pre-checksum cache: rebuild
                or int(z["checksum"])
                != int(_edge_checksum(data.train_users, data.train_items))
            ):
                return None
            return z["weights"]
    except Exception:
        return None


def build_graph(
    data: InteractionData,
    edge_pad_multiple: int = 8192,
    cache_dir: Optional[str] = None,
) -> BipartiteGraph:
    """Build the padded dual-sorted edge representation from a dataset.

    Canonical edge order = file order, padding appended; padding edges
    have weight 0 and endpoints (n_users-1, m_items-1) so each sorted
    order stays sorted and padding contributes exactly nothing to either
    SpMM direction."""
    users = data.train_users.astype(np.int64)
    items = data.train_items.astype(np.int64)

    w = None
    cache_path = os.path.join(cache_dir, CACHE_NAME) if cache_dir else None
    if cache_path and os.path.exists(cache_path):
        w = _load_cached_weights(cache_path, data)
    if w is None:
        w = normalized_edge_weights(
            users, items, data.user_degrees, data.item_degrees
        )
        if cache_path:
            try:
                np.savez(
                    cache_path,
                    weights=w,
                    n_users=data.n_users,
                    m_items=data.m_items,
                    checksum=_edge_checksum(users, items),
                )
            except OSError:
                pass

    E = users.size
    pad_E = max(edge_pad_multiple, -(-max(E, 1) // edge_pad_multiple) * edge_pad_multiple)
    cu = np.full(pad_E, data.n_users - 1, dtype=np.int32)
    ci = np.full(pad_E, data.m_items - 1, dtype=np.int32)
    cw = np.zeros(pad_E, dtype=np.float32)
    cu[:E] = users
    ci[:E] = items
    cw[:E] = w

    perm_by_u = np.argsort(cu, kind="stable").astype(np.int32)
    perm_by_i = np.argsort(ci, kind="stable").astype(np.int32)
    return BipartiteGraph(
        edge_u_by_u=cu[perm_by_u],
        edge_i_by_u=ci[perm_by_u],
        edge_w_by_u=cw[perm_by_u],
        edge_i_by_i=ci[perm_by_i],
        edge_u_by_i=cu[perm_by_i],
        edge_w_by_i=cw[perm_by_i],
        perm_by_u=perm_by_u,
        perm_by_i=perm_by_i,
        user_degrees=data.user_degrees.astype(np.float32),
        item_degrees=data.item_degrees.astype(np.float32),
        n_users=data.n_users,
        m_items=data.m_items,
        n_edges=int(E),
    )
