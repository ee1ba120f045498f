"""Scatter-free SpMM: bucketed-ELL gather formulation with custom VJP.

Why: on TPU, XLA lowers segment-sum to scatter-add, which runs at a
fraction of HBM bandwidth (~23 GB/s measured on v5e for Gowalla-shaped
edges vs ~3× faster gathers). LightGCN propagation is a pair of transpose
SpMMs over the same edge set, which lets us avoid scatter entirely:

- Forward ``new_u = W @ item_emb`` is computed per-user as a *gather* of
  the user's item rows plus a dense weighted reduction. Rows are grouped
  into width-bucketed rectangles (ELL format), so every bucket is a
  static-shaped (rows, width, d) gather + weighted reduction — pure VPU
  work, no scatter.
- Backward: the cotangent of a gather is normally a scatter-add — but
  d(W @ x)/dx applied to a cotangent ĝ is exactly ``W^T @ ĝ``, i.e. the
  *other side's* gather layout. The custom VJP routes each gradient
  through the opposite-side ELL tables, so backward is also scatter-free.

Bucket padding slots carry weight 0 and column 0, contributing nothing.
Each bucket's (rows, width) shape is static per dataset → one compile.

This is the default TPU SpMM path; `gsrs_tpu.ops.spmm` (segment-sum) is
the reference fallback, and a fused Pallas kernel can slot in behind the
same interface. Replaces the reference's ``torch.sparse.mm`` hot loop
(reference code/model.py:216-218).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllBucket:
    """One degree bucket: `rows[i]` aggregates `cols[i, :]` with `w[i, :]`.

    ``eidx`` maps each slot back to its canonical padded-edge index so a
    per-edge value (dropout mask) can be gathered into this layout;
    padding slots point at index 0 (harmless: their weight is 0)."""

    rows: jax.Array  # (n_b,) int32 destination row ids
    cols: jax.Array  # (n_b, D_b) int32 source row ids, 0-padded
    w: jax.Array  # (n_b, D_b) float32 edge weights, 0-padded
    eidx: jax.Array  # (n_b, D_b) int32 canonical edge index, 0-padded


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllSide:
    """All buckets for one SpMM direction plus the row-assembly gather.

    ``assemble``: (n_rows,) indices into the row-concatenation of all
    bucket outputs with one extra zero row appended at the end; rows with
    zero degree point at the zero row. Output assembly is thus a gather,
    not a scatter."""

    buckets: Tuple[EllBucket, ...]
    assemble: jax.Array  # (n_rows,) int32
    n_rows: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllGraph:
    """Both directions of the normalized bipartite graph in ELL form."""

    by_user: EllSide  # dst=users, src=items  (computes W @ item_emb)
    by_item: EllSide  # dst=items, src=users  (computes W^T @ user_emb)
    n_users: int = dataclasses.field(metadata=dict(static=True))
    m_items: int = dataclasses.field(metadata=dict(static=True))


# ---------------------------------------------------------------- builders


def _build_side(
    dst: np.ndarray,
    src: np.ndarray,
    w: np.ndarray,
    eidx: np.ndarray,
    n_rows: int,
    min_width: int = 4,
) -> EllSide:
    """Group rows by degree into power-of-two-width buckets."""
    order = np.argsort(dst, kind="stable")
    dst, src, w, eidx = dst[order], src[order], w[order], eidx[order]
    degrees = np.bincount(dst, minlength=n_rows)
    row_start = np.concatenate([[0], np.cumsum(degrees)]).astype(np.int64)

    active_rows = np.flatnonzero(degrees > 0)
    # Bucket width per active row. Gathers are issue-rate bound on TPU
    # (~300M rows/s regardless of dtype), so padded slots cost real time:
    # use fine-grained widths (multiples of 4 up to 64, then powers of
    # two) to keep padding waste ~1.2× instead of pow2's ~1.4×.
    deg_active = degrees[active_rows]
    fine = np.maximum(min_width, ((deg_active + 3) // 4) * 4)
    coarse = 1 << np.ceil(np.log2(np.maximum(deg_active, 1))).astype(np.int64)
    widths = np.where(deg_active <= 64, np.minimum(fine, 64), coarse)
    buckets = []
    concat_pos = np.full(n_rows, -1, dtype=np.int64)
    n_assembled = 0
    for width in np.unique(widths):
        rows = active_rows[widths == width]
        n_b = rows.size
        deg = degrees[rows]
        # vectorized rectangle fill: slot (k, j) for the j-th edge of the
        # k-th row in this bucket
        within = np.arange(deg.sum()) - np.repeat(np.cumsum(deg) - deg, deg)
        flat_slot = np.repeat(np.arange(n_b), deg) * width + within
        edge_pos = np.repeat(row_start[rows], deg) + within
        cols = np.zeros(n_b * width, dtype=np.int32)
        ws = np.zeros(n_b * width, dtype=np.float32)
        es = np.zeros(n_b * width, dtype=np.int32)
        cols[flat_slot] = src[edge_pos]
        ws[flat_slot] = w[edge_pos]
        es[flat_slot] = eidx[edge_pos]
        buckets.append(
            EllBucket(
                rows=rows.astype(np.int32),
                cols=cols.reshape(n_b, width),
                w=ws.reshape(n_b, width),
                eidx=es.reshape(n_b, width),
            )
        )
        concat_pos[rows] = n_assembled + np.arange(n_b)
        n_assembled += n_b
    # zero-degree rows → the appended zero row at index n_assembled
    assemble = np.where(concat_pos >= 0, concat_pos, n_assembled).astype(np.int32)
    return EllSide(buckets=tuple(buckets), assemble=assemble, n_rows=n_rows)


def build_ell_graph(
    users: np.ndarray,
    items: np.ndarray,
    weights: np.ndarray,
    n_users: int,
    m_items: int,
    min_width: int = 4,
) -> EllGraph:
    """Build from canonical (unpadded) edge arrays; ``weights`` are the
    symmetric-normalized values from
    `gsrs_tpu.data.adjacency.normalized_edge_weights`."""
    eidx = np.arange(users.size, dtype=np.int32)
    return EllGraph(
        by_user=_build_side(users, items, weights, eidx, n_users, min_width),
        by_item=_build_side(items, users, weights, eidx, m_items, min_width),
        n_users=n_users,
        m_items=m_items,
    )


def ell_from_graph(graph, min_width: int = 4) -> EllGraph:
    """Rebuild the ELL layout from a BipartiteGraph's padded edge arrays
    (inverting the by-user sort back to canonical order, dropping padding)."""
    sorted_u = np.asarray(graph.edge_u_by_u)
    sorted_i = np.asarray(graph.edge_i_by_u)
    sorted_w = np.asarray(graph.edge_w_by_u)
    perm = np.asarray(graph.perm_by_u)
    E = sorted_u.shape[0]
    users = np.empty(E, sorted_u.dtype)
    items = np.empty(E, sorted_i.dtype)
    w = np.empty(E, sorted_w.dtype)
    users[perm] = sorted_u
    items[perm] = sorted_i
    w[perm] = sorted_w
    n = graph.n_edges
    return build_ell_graph(
        users[:n], items[:n], w[:n], graph.n_users, graph.m_items, min_width
    )


def ell_from_interactions(data, min_width: int = 4) -> EllGraph:
    """Build the ELL graph straight from an InteractionData (normalized
    weights computed with the reference's exact zero-degree semantics)."""
    from gsrs_tpu.data.adjacency import normalized_edge_weights

    w = normalized_edge_weights(
        data.train_users, data.train_items, data.user_degrees, data.item_degrees
    )
    return build_ell_graph(
        data.train_users.astype(np.int32),
        data.train_items.astype(np.int32),
        w,
        data.n_users,
        data.m_items,
        min_width=min_width,
    )


# ----------------------------------------------------------------- apply


def _apply_side(
    side: EllSide, x: jax.Array, edge_mask: Optional[jax.Array]
) -> jax.Array:
    """out[r] = Σ_slots w · x[col]  for every row r of this side."""
    partials = []
    for b in side.buckets:
        w = b.w
        if edge_mask is not None:
            w = w * edge_mask[b.eidx]
        gathered = jnp.take(x, b.cols.reshape(-1), axis=0).reshape(
            (*b.cols.shape, x.shape[-1])
        )
        partials.append(
            jnp.einsum(
                "nd,ndk->nk", w.astype(x.dtype), gathered,
            )
        )
    concat = jnp.concatenate(
        partials + [jnp.zeros((1, x.shape[-1]), dtype=x.dtype)], axis=0
    )
    return jnp.take(concat, side.assemble, axis=0)


@jax.custom_vjp
def ell_propagate_layer(
    graph: EllGraph,
    user_emb: jax.Array,
    item_emb: jax.Array,
    edge_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One LightGCN layer, scatter-free in both passes:
    new_user = W @ item_emb, new_item = W^T @ user_emb."""
    new_u = _apply_side(graph.by_user, item_emb, edge_mask)
    new_i = _apply_side(graph.by_item, user_emb, edge_mask)
    return new_u, new_i


def _fwd(graph, user_emb, item_emb, edge_mask):
    out = ell_propagate_layer(graph, user_emb, item_emb, edge_mask)
    return out, (graph, edge_mask)


def _bwd(res, cot):
    graph, edge_mask = res
    g_u, g_i = cot
    # d/d item_emb of (W @ item_emb) applied to ĝ_u is W^T ĝ_u → item-side
    # layout; symmetrically for users. Same masked weights as forward.
    d_item = _apply_side(graph.by_item, g_u, edge_mask)
    d_user = _apply_side(graph.by_user, g_i, edge_mask)
    return None, d_user, d_item, None


ell_propagate_layer.defvjp(_fwd, _bwd)
