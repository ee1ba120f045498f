"""Sparse matrix–dense matrix product over padded edge lists.

The TPU-native replacement for the reference's ``torch.sparse.mm`` hot
loop (reference code/model.py:216-218). An SpMM over E edges with feature
width d is a gather (E×d reads) → scale → segment-sum (E×d accumulates):
pure HBM-bandwidth work on the VPU. On TPU the scatter half runs well
below gather speed, so this segment-sum path is the *fallback*; the
default production path is the scatter-free ELL formulation in
`gsrs_tpu.ops.ell` (selected via ModelConfig.spmm_mode). This path also
serves the shard_map distributed step, where contiguous slices of the
sorted edge arrays shard naturally across devices.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gsrs_tpu.data.adjacency import BipartiteGraph


def spmm_edges(
    seg_ids: jax.Array,  # (E,) int32 destination rows, sorted
    src_ids: jax.Array,  # (E,) int32 source rows
    weights: jax.Array,  # (E,) float — 0 on padding
    x: jax.Array,  # (S, d) source features
    num_segments: int,
) -> jax.Array:
    """out[r] = Σ_{e: seg_ids[e]==r} weights[e] · x[src_ids[e]]."""
    gathered = jnp.take(x, src_ids, axis=0) * weights[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered, seg_ids, num_segments=num_segments, indices_are_sorted=True
    )


def propagate_layer(
    graph: BipartiteGraph,
    user_emb: jax.Array,  # (n, d)
    item_emb: jax.Array,  # (m, d)
    edge_mask: Optional[jax.Array] = None,  # (E,) float drop/keep scale
) -> Tuple[jax.Array, jax.Array]:
    """One LightGCN layer on the bipartite split.

    Equivalent to ``torch.sparse.mm(A_hat, cat(u, i))`` with
    ``A_hat = D^-1/2 [[0, R], [R^T, 0]] D^-1/2`` (reference
    code/model.py:207-218) but computed as two rectangular SpMMs.

    ``edge_mask`` implements edge dropout (the flag the reference parses
    but never implements, reference code/model.py:214): entries are
    0 or 1/keep_prob, applied identically on both directions of an edge so
    the dropped graph stays symmetric.
    """
    w_u = graph.edge_w_by_u
    w_i = graph.edge_w_by_i
    if edge_mask is not None:
        mask_by_u, mask_by_i = edge_mask
        w_u = w_u * mask_by_u
        w_i = w_i * mask_by_i
    new_user = spmm_edges(
        graph.edge_u_by_u, graph.edge_i_by_u, w_u, item_emb, graph.n_users
    )
    new_item = spmm_edges(
        graph.edge_i_by_i, graph.edge_u_by_i, w_i, user_emb, graph.m_items
    )
    return new_user, new_item


def edge_keep_mask(
    key: jax.Array, graph: BipartiteGraph, keep_prob: float, dtype=None
) -> jax.Array:
    """One Bernoulli(keep_prob)/keep_prob decision per *edge* in CANONICAL
    order (inverted dropout) — the single source of the symmetry-critical
    sampling; permute with perm_by_u/perm_by_i for the two SpMM sort
    orders so both directions drop the same edges and the propagated
    graph stays symmetric in expectation.

    Implements the edge dropout the reference exposes as --dropout /
    --keepprob but leaves as a TODO (reference code/model.py:214,
    code/parse.py:30-33).
    """
    dtype = graph.edge_w_by_u.dtype if dtype is None else dtype
    return (
        jax.random.bernoulli(
            key, p=keep_prob, shape=graph.edge_w_by_u.shape
        ).astype(dtype)
        / keep_prob
    )


def make_edge_dropout_masks(
    key: jax.Array, graph: BipartiteGraph, keep_prob: float
) -> Tuple[jax.Array, jax.Array]:
    """`edge_keep_mask` expressed in both SpMM sort orders."""
    keep = edge_keep_mask(key, graph, keep_prob)
    return keep[graph.perm_by_u], keep[graph.perm_by_i]
