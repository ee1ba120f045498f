"""Hybrid SpMM: dense MXU blocks for hub columns + residual ELL.

The ELL gather path is issue-rate bound on TPU (~300M gathered rows/s
measured on v5e regardless of dtype — BENCH_NOTES round 1), which caps
SpMM at an effective ~20-80 GB/s. A dense matmul streams at full HBM
bandwidth (~800 GB/s). Break-even density for replacing gathers with a
dense block is therefore only ~0.08% nonzeros; recommendation graphs are
power-law, so the top few thousand hub columns of each propagation
direction sit at 0.2-1.5% density — 3-5× past break-even.

Split each direction ``W`` (users ← items) into
``W = W_dense + W_residual``:

- ``W_dense``: the submatrix over the top-C highest-degree SOURCE
  columns, materialized as a dense (n_rows, C) matrix in the compute
  dtype. Applying it is ``dense @ x[top_ids]`` — one (n_rows, C)×(C, d)
  MXU matmul; bandwidth-bound on streaming ``dense`` at full HBM speed.
- ``W_residual``: everything else, in the scatter-free bucketed-ELL
  layout (`gsrs_tpu.ops.ell`), with BOTH sort orders over the SAME
  residual edge set so the backward pass stays scatter-free.

The two directions have different hub sets (popular items vs heavy
users), so each direction carries its own residual EllGraph (its
``by_user`` slot = forward gather layout, ``by_item`` slot = transpose
layout for the VJP).

Backward: d(x)ᵀ of the dense part is ``W_denseᵀ @ ĝ`` accumulated into
the C hub rows of the cotangent — a (C, n_rows)×(n_rows, d) matmul plus
a C-row scatter-add (C ≈ 8-16k rows: negligible next to the millions of
edge gathers it replaces). The edge weights are graph constants, so no
gradient flows to ``dense`` itself.

Replaces the same reference hot loop as ops/ell.py
(``torch.sparse.mm``, reference code/model.py:216-218). Edge dropout
works in hybrid mode via the stateless per-edge hash mask
(ops.hashdrop): the keep decision is an elementwise function of each
dense cell's (dst, top_src[c]) pair and each residual slot's
(row, col) pair, so no edge-index matrix is needed and both directions
drop the same edges (round-2's hybrid×dropout exclusion removed).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsrs_tpu.ops.ell import EllGraph, _apply_side, _build_side

# HBM budget for the two dense hub blocks combined (user_from_item is
# (n_users, C), item_from_user is (m_items, C)). 4 GiB leaves room on a
# 16 GB chip for the embedding tables, Adam state, activations and the
# residual ELL. The blocks are O((n+m)·C): fine at gowalla bf16 (~1.1 GB
# at C=8192) but ~0.9 TB at a 50M-user/10M-item pod shape — which is why
# tools/stress_pod.py plans pod scale on pure ELL, and why
# `resolve_hybrid_cols` clamps C (down to 0 = plain ELL behavior) with a
# warning instead of letting `--spmm hybrid` OOM (VERDICT r4 item 6).
# Note `parallel/sharding.py::hybrid_spec` shards the blocks by COLUMNS,
# so per-device memory still scales with n+m — sharding does not lift
# this ceiling.
DENSE_HBM_BUDGET_GB = 4.0


def resolve_hybrid_cols(
    n_users: int,
    m_items: int,
    cols: int,
    dtype,
    hbm_budget_gb: float = DENSE_HBM_BUDGET_GB,
) -> int:
    """Clamp the hub-column count so the two dense blocks fit the HBM
    budget. Returns ``cols`` unchanged when it fits; otherwise the
    largest 128-multiple that does (possibly 0 — the dense blocks become
    empty and the hybrid degenerates to plain ELL), with a warning that
    names the estimate and the pod-scale alternative."""
    itemsize = np.dtype(dtype).itemsize
    rows = n_users + m_items
    budget = int(hbm_budget_gb * 1024**3)
    need = rows * cols * itemsize
    if need <= budget:
        return cols
    fit = (budget // (rows * itemsize) // 128) * 128
    fit = int(max(fit, 0))
    warnings.warn(
        f"hybrid dense blocks at C={cols} would need "
        f"{need / 1024**3:.1f} GiB for {n_users}+{m_items} node rows "
        f"(budget {hbm_budget_gb:.1f} GiB); clamping to C={fit}"
        + (
            " — dense blocks disabled, effectively plain ELL. Use "
            "--spmm ell (and a sharded mesh) at this scale."
            if fit == 0
            else ". Raise hbm_budget_gb only if the chip has headroom."
        ),
        stacklevel=3,
    )
    return fit


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridDirection:
    """One propagation direction (dst ← src)."""

    residual: EllGraph  # by_user = dst-side (forward), by_item = src-side (VJP)
    dense: jax.Array  # (n_dst, C) compute-dtype hub-column weights
    top_src: jax.Array  # (C,) int32 source ids of the dense columns


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HybridGraph:
    user_from_item: HybridDirection  # computes new_u = W @ item_emb
    item_from_user: HybridDirection  # computes new_i = Wᵀ @ user_emb
    n_users: int = dataclasses.field(metadata=dict(static=True))
    m_items: int = dataclasses.field(metadata=dict(static=True))


def _build_direction(
    dst: np.ndarray,
    src: np.ndarray,
    w: np.ndarray,
    n_dst: int,
    n_src: int,
    src_degrees: np.ndarray,
    cols: int,
    dtype,
    min_width: int,
) -> HybridDirection:
    c = int(min(cols, n_src))
    # round down to a lane-friendly multiple (keep small graphs exact)
    if c >= 128 and c < n_src:
        c = (c // 128) * 128
    top = np.argsort(src_degrees, kind="stable")[::-1][:c].astype(np.int32)
    rank = np.full(n_src, -1, dtype=np.int64)
    rank[top] = np.arange(c)
    in_dense = rank[src] >= 0

    dense = np.zeros((n_dst, c), dtype=dtype)
    dense[dst[in_dense], rank[src[in_dense]]] = w[in_dense].astype(dtype)

    res = ~in_dense
    eidx = np.arange(res.sum(), dtype=np.int32)
    residual = EllGraph(
        by_user=_build_side(
            dst[res], src[res], w[res], eidx, n_dst, min_width
        ),
        by_item=_build_side(
            src[res], dst[res], w[res], eidx, n_src, min_width
        ),
        n_users=n_dst,
        m_items=n_src,
    )
    return HybridDirection(
        residual=residual,
        dense=dense,
        top_src=top,
    )


def hybrid_from_interactions(
    data, cols: int = 8192, dtype=np.float32, min_width: int = 4,
    hbm_budget_gb: float = DENSE_HBM_BUDGET_GB,
) -> HybridGraph:
    """Build from an InteractionData with the reference's exact
    normalization (same weights as ops.ell.ell_from_interactions)."""
    from gsrs_tpu.data.adjacency import normalized_edge_weights

    w = normalized_edge_weights(
        data.train_users, data.train_items, data.user_degrees, data.item_degrees
    ).astype(np.float32)
    users = data.train_users.astype(np.int32)
    items = data.train_items.astype(np.int32)
    item_deg = np.bincount(items, minlength=data.m_items)
    user_deg = np.bincount(users, minlength=data.n_users)
    cols = resolve_hybrid_cols(
        data.n_users, data.m_items, cols, dtype, hbm_budget_gb
    )
    return HybridGraph(
        user_from_item=_build_direction(
            users, items, w, data.n_users, data.m_items, item_deg,
            cols, dtype, min_width,
        ),
        item_from_user=_build_direction(
            items, users, w, data.m_items, data.n_users, user_deg,
            cols, dtype, min_width,
        ),
        n_users=data.n_users,
        m_items=data.m_items,
    )


def hybrid_from_graph(
    graph, cols: int = 8192, dtype=np.float32, min_width: int = 4,
    hbm_budget_gb: float = DENSE_HBM_BUDGET_GB,
) -> HybridGraph:
    """Build from a BipartiteGraph's padded edge arrays (inverting the
    by-user sort back to canonical order, dropping padding) — the
    convenience mirror of ops.ell.ell_from_graph."""
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
    users, items, w = users[:n], items[:n], w[:n]
    item_deg = np.bincount(items, minlength=graph.m_items)
    user_deg = np.bincount(users, minlength=graph.n_users)
    cols = resolve_hybrid_cols(
        graph.n_users, graph.m_items, cols, dtype, hbm_budget_gb
    )
    return HybridGraph(
        user_from_item=_build_direction(
            users, items, w, graph.n_users, graph.m_items, item_deg,
            cols, dtype, min_width,
        ),
        item_from_user=_build_direction(
            items, users, w, graph.m_items, graph.n_users, user_deg,
            cols, dtype, min_width,
        ),
        n_users=graph.n_users,
        m_items=graph.m_items,
    )


def _masked_dense(d: HybridDirection, drop, dst_is_user: bool) -> jax.Array:
    """Dense hub block with the stateless per-edge keep mask applied.
    Cell (r, c) is edge (dst=r, src=top_src[c]); the hash sees canonical
    (user, item) order so the drop decision agrees with the residual ELL
    slots and the transpose direction. The mask is a pure elementwise
    function of loop-invariant inputs, so XLA computes the masked block
    once per step and reuses it across layers."""
    if drop is None:
        return d.dense
    from gsrs_tpu.ops.hashdrop import hash_keep

    n_dst = d.dense.shape[0]
    r = jnp.arange(n_dst, dtype=jnp.int32)[:, None]
    c = d.top_src[None, :]
    uu, ii = (r, c) if dst_is_user else (c, r)
    return d.dense * hash_keep(uu, ii, drop, dtype=d.dense.dtype)


def _apply_direction(
    d: HybridDirection, x: jax.Array, drop=None, dst_is_user: bool = True
) -> jax.Array:
    out = _apply_side(d.residual.by_user, x, None, drop, dst_is_user)
    hub = jnp.take(x, d.top_src, axis=0)  # (C, d) — tiny gather
    return out + jnp.dot(
        _masked_dense(d, drop, dst_is_user).astype(x.dtype),
        hub,
        preferred_element_type=out.dtype,
    )


def _apply_direction_t(
    d: HybridDirection, g: jax.Array, drop=None, dst_is_user: bool = True
) -> jax.Array:
    """Wᵀ @ g for one direction: transpose-ELL gather + dense-block
    transpose matmul accumulated into the C hub rows. ``dst_is_user``
    refers to the FORWARD direction's destination (the residual by_item
    side flips it internally)."""
    out = _apply_side(d.residual.by_item, g, None, drop, not dst_is_user)
    hub_cot = jnp.dot(
        _masked_dense(d, drop, dst_is_user).astype(g.dtype).T,
        g,
        preferred_element_type=out.dtype,
    )  # (C, d)
    return out.at[d.top_src].add(hub_cot)


@jax.custom_vjp
def hybrid_propagate_layer(
    hg: HybridGraph,
    user_emb: jax.Array,
    item_emb: jax.Array,
    drop=None,
) -> Tuple[jax.Array, jax.Array]:
    """One LightGCN layer: new_u = W @ item_emb, new_i = Wᵀ @ user_emb,
    hub columns on the MXU, residual edges scatter-free in both passes.
    ``drop`` (ops.hashdrop.HashDrop): stateless per-edge dropout — the
    mechanism that lets the dense block participate without an edge-index
    matrix (VERDICT r2 item 6)."""
    new_u = _apply_direction(hg.user_from_item, item_emb, drop, True)
    new_i = _apply_direction(hg.item_from_user, user_emb, drop, False)
    return new_u, new_i


def _fwd(hg, user_emb, item_emb, drop):
    return hybrid_propagate_layer(hg, user_emb, item_emb, drop), (hg, drop)


def _bwd(res, cot):
    hg, drop = res
    g_u, g_i = cot
    d_item = _apply_direction_t(hg.user_from_item, g_u, drop, True)
    d_user = _apply_direction_t(hg.item_from_user, g_i, drop, False)
    return None, d_user, d_item, None


hybrid_propagate_layer.defvjp(_fwd, _bwd)
