"""UltraGCN — propagation-free graph CF (Mao et al., CIKM 2021).

No reference counterpart (the reference ships only LightGCN,
reference code/model.py:37); this is a beyond-reference model chosen for
being maximally TPU-shaped: there is NO message passing in the training
loop at all. The graph enters only through *precomputed constraint
weights* that approximate the limit of infinite-layer propagation, so a
training step is embedding gathers plus MXU dot products — the SpMM
bottleneck that dominates LightGCN epochs (BENCH_NOTES.md) disappears
entirely.

Objective (paper's eq. 12-17, matching the published operating points):

- user–item constraint ``L_C``: weighted binary cross-entropy over one
  positive and ``ug_neg_num`` uniform negatives per pair, with weights
  ``w1 + w2·β_ui`` (pos) and ``w3 + w4·β_uj`` (neg) where
  ``β_ui = (√(d_u+1)/d_u) · 1/√(d_i+1)`` from the bipartite degrees;
- item–item constraint ``L_I``: for each positive item, pull the user
  toward the item's top-K co-occurrence neighbors, weighted by
  ``ω_ij = (√(g_i+1)/g_i) · G_ij · 1/√(g_j+1)`` with ``G = RᵀR`` and
  ``g = G·1`` (row sums); K = ``ug_ii_k``;
- L2 on the full tables (the trainer's ``--decay`` is the paper's γ).

Negatives are drawn rejection-free with the on-device PRNG — uniform
``randint`` over the catalog, exactly the paper's sampler (it does not
sift positives at its Gowalla operating point). ``ug_neg_sharing='batch'``
shares one negative set across the batch, turning the negative scoring
into a single (B,d)×(d,N) MXU matmul instead of B·N gathered dots.

Serving/eval surface is the raw-table dot product — implemented by
subclassing LightGCN with zero layers (same trick as PureMF), so the
evaluator, checkpointing, export, and sharding paths are all shared.

Precompute of the item–item top-K runs blockwise on the host: ``G = RᵀR``
is never materialized (its nnz is Σ_u d_u², quadratic in user degree);
row sums come from the identity ``g = Rᵀ(R·1)`` and each item block
computes its slice ``R[:,blk]ᵀ R`` independently. Cached on disk next to
the dataset like the adjacency cache (data/adjacency.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from gsrs_tpu.config import ModelConfig
from gsrs_tpu.data.adjacency import BipartiteGraph, _edge_checksum
from gsrs_tpu.models.lightgcn import LightGCN, Params
from gsrs_tpu.ops.bitset import bitset_row_mask

II_CACHE_NAME = "ultragcn_ii_cache.npz"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainBitset:
    """Packed train-positive membership rows, carried to UltraGCN's loss
    through the trainer's ``ell`` argument slot (UltraGCN has no ELL
    graph; the Trainer re-uses the sampler's bitset — no extra HBM)."""

    bitset: jax.Array  # (n_users, ceil(m/32)) uint32


def real_edges(graph: BipartiteGraph) -> Tuple[np.ndarray, np.ndarray]:
    """Unpadded (users, items) interaction pairs recovered from the padded
    edge arrays (padding carries weight 0; every real edge has both
    endpoints of degree ≥ 1, hence weight > 0)."""
    w = np.asarray(graph.edge_w_by_u)
    mask = w > 0
    return (
        np.asarray(graph.edge_u_by_u)[mask],
        np.asarray(graph.edge_i_by_u)[mask],
    )


def build_ii_constraint(
    graph: BipartiteGraph,
    k: int,
    diag_zero: bool = False,
    block: int = 4096,
    cache_dir: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-K item–item constraint (neighbors (m,K) int32, weights (m,K)
    float32) from the co-occurrence graph ``G = RᵀR``, computed blockwise
    so G is never held whole. Rows with fewer than K co-occurring items
    are padded with weight 0 (neighbor id = the item itself, inert).

    ``diag_zero`` drops G's diagonal (an item is trivially its own top
    neighbor; the paper's released configs keep it, so default False).
    """
    import scipy.sparse as sp

    users, items = real_edges(graph)
    checksum = int(_edge_checksum(users.astype(np.int64), items.astype(np.int64)))
    cache_path = (
        os.path.join(cache_dir, II_CACHE_NAME) if cache_dir else None
    )
    if cache_path and os.path.exists(cache_path):
        try:
            with np.load(cache_path) as z:
                if (
                    int(z["k"]) == k
                    and bool(z["diag_zero"]) == diag_zero
                    and int(z["checksum"]) == checksum
                    and z["neighbors"].shape == (graph.m_items, k)
                ):
                    return z["neighbors"], z["weights"]
        except Exception:
            pass

    n, m = graph.n_users, graph.m_items
    R = sp.csr_matrix(
        (np.ones(users.size, np.float32), (users, items)), shape=(n, m)
    )
    # g = G·1 = Rᵀ(R·1): row sums of G without materializing G. With
    # diag_zero the diagonal G_ii = d_i is excluded from g as the paper's
    # builder does (it zeroes the diagonal before summing).
    d_u = np.asarray(R.sum(axis=1)).ravel()
    g = np.asarray(R.T @ d_u).ravel()
    if diag_zero:
        g = g - np.asarray(graph.item_degrees, np.float64)[:m]
    with np.errstate(divide="ignore", invalid="ignore"):
        beta_row = np.where(g > 0, np.sqrt(g + 1.0) / np.maximum(g, 1e-12), 0.0)
    beta_col = 1.0 / np.sqrt(g + 1.0)

    RT = R.T.tocsr()  # (m, n)
    neighbors = np.tile(np.arange(m, dtype=np.int32)[:, None], (1, k))
    weights = np.zeros((m, k), dtype=np.float32)
    # Blockwise G = RᵀR with fully vectorized per-row top-K: no per-row
    # Python (the round-1 builder looped rows with a tolil() diagonal
    # round-trip — fine at Gowalla's 41k items, hopeless at the 10M-item
    # pod target). Per block: one sparse matmul, a masked in-place
    # diagonal zero on the CSR data, one weight computation over all
    # stored entries, one lexsort, and two fancy-index stores.
    for i0 in range(0, m, block):
        i1 = min(i0 + block, m)
        nb = i1 - i0
        Gb = (RT[i0:i1] @ R).tocsr()  # (nb, m) slice of G
        counts = np.diff(Gb.indptr)
        rows = np.repeat(np.arange(nb, dtype=np.int64), counts)
        idx, dat = Gb.indices, Gb.data
        if diag_zero:
            dat = np.where(idx == rows + i0, 0.0, dat)
        w = beta_row[i0 + rows] * dat * beta_col[idx]
        if diag_zero:
            # keep zeroed-diagonal (and any other zero-weight) entries
            # out of the top-K candidates
            valid = w > 0
            rows, idx, w = rows[valid], idx[valid], w[valid]
            counts = np.bincount(rows, minlength=nb)
        # ragged per-row top-K: sort by (row, -weight), keep the first K
        # positions within each row
        order = np.lexsort((-w, rows))
        rows_s, idx_s, w_s = rows[order], idx[order], w[order]
        row_start = np.concatenate([[0], np.cumsum(counts)])
        within = np.arange(rows_s.size) - np.repeat(row_start[:-1], counts)
        take = within < k
        neighbors[i0 + rows_s[take], within[take]] = idx_s[take]
        weights[i0 + rows_s[take], within[take]] = w_s[take]

    if cache_path:
        try:
            np.savez(
                cache_path,
                neighbors=neighbors,
                weights=weights,
                k=k,
                diag_zero=diag_zero,
                checksum=checksum,
            )
        except OSError:
            pass
    return neighbors, weights


class UltraGCN(LightGCN):
    """Inherits the zero-layer scoring/eval surface (like PureMF,
    models/mf.py) and replaces the training objective entirely."""

    needs_step_key = True  # trainer passes a fresh PRNG key every step
    # epochs visit (user, pos) uniformly over interactions (the paper
    # iterates the shuffled edge list; its β weights assume degree-
    # proportional user visits), not uniformly over users as in BPR
    samples_pairs_by_edge = True

    def __init__(
        self,
        cfg: ModelConfig,
        graph: BipartiteGraph,
        i2i=None,
        ell=None,
        ii_cache_dir: Optional[str] = None,
    ):
        if cfg.ug_neg_sharing not in ("none", "batch", "group", "full", "pool"):
            raise ValueError(
                f"ug_neg_sharing must be 'none', 'batch', 'group', 'full' "
                f"or 'pool', got '{cfg.ug_neg_sharing}'"
            )
        if cfg.ug_neg_sharing == "pool" and cfg.ug_neg_pool < 1:
            raise ValueError("ug_neg_pool must be >= 1")
        if cfg.ug_neg_sharing == "group" and cfg.ug_neg_groups < 1:
            raise ValueError("ug_neg_groups must be >= 1")
        if cfg.ug_sift_pos and cfg.ug_neg_sharing not in ("full", "pool"):
            raise ValueError(
                "ug_sift_pos requires ug_neg_sharing='full' or 'pool' "
                "(the other sampled estimators draw uniformly with "
                "collisions, per the paper)"
            )
        cfg = dataclasses.replace(
            cfg, num_layers=0, dropout=False, use_pop_gate=False,
            use_item_item=False,
        )
        super().__init__(cfg, graph, i2i=None, ell=None)
        self._ii_cache_dir = ii_cache_dir
        self._ii_built = False
        self.ii_neighbors = None
        self.ii_weights = None
        # The Trainer fills model.ell with TrainBitset when this is True
        # (re-using the sampler's packed bitset).
        self.wants_train_bitset = cfg.ug_sift_pos

    def _ensure_ii(self) -> None:
        """Build the item–item top-K lazily, at the first loss trace —
        serving/eval rebuild the model via build_model just to read the
        tables (serve.py, tools/eval_checkpoint.py) and must not pay the
        host-side co-occurrence pass."""
        if self._ii_built:
            return
        self._ii_built = True
        cfg = self.cfg
        if cfg.ug_lambda > 0.0 and cfg.ug_ii_k > 0:
            nbrs, w = build_ii_constraint(
                self.graph, cfg.ug_ii_k, cache_dir=self._ii_cache_dir
            )
            # Kept as HOST numpy: this runs at trace time (first bpr_loss
            # call, possibly inside jit), where a device_put would return
            # a tracer and leak into later traces. As numpy they bake into
            # each executable as constants (~m·K·8 bytes — a few MB, small
            # enough not to thread through the trainer's fixed (graph,
            # ell) argument slots).
            self.ii_neighbors = nbrs.astype(np.int32)
            self.ii_weights = w.astype(np.float32)

    # ------------------------------------------------------------------ init
    def init_params(self, key: jax.Array) -> Params:
        """N(0, ug_init_std²) init — the paper trains from 1e-4-scale
        tables (LightGCN's 0.1 init is ~3 orders larger and stalls the
        weighted-BCE objective early)."""
        d = self.cfg.embedding_dim
        k1, k2 = jax.random.split(key)
        s = self.cfg.ug_init_std
        return {
            "user_emb": s * jax.random.normal(k1, (self.n_users, d)),
            "item_emb": s * jax.random.normal(k2, (self.m_items, d)),
        }

    # ------------------------------------------------------------------ loss
    def bpr_loss(
        self,
        params: Params,
        users: jax.Array,
        pos: jax.Array,
        neg: jax.Array,
        dropout_key: Optional[jax.Array] = None,
        graph: Optional[BipartiteGraph] = None,
        ell=None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """UltraGCN objective under the trainer's loss contract: returns
        (L_C + λ·L_I, aux) with aux['reg'] = ½Σ‖tables‖² so the trainer's
        ``loss + decay·reg`` applies the paper's γ‖Θ‖² term. The sampler's
        rejection-sampled ``neg`` is ignored — the paper draws ``neg_num``
        uniform negatives per pair (collisions with positives are part of
        its objective), which is rejection-free and fully on-device.

        Sum reduction over the batch (not mean), matching the paper's
        published learning rates (lr=1e-4 at batch 512 on Gowalla)."""
        if dropout_key is None:
            raise ValueError(
                "UltraGCN draws its negatives from the per-step PRNG key; "
                "pass dropout_key (the Trainer does via needs_step_key)"
            )
        self._ensure_ii()  # host-side precompute, runs once at trace time
        cfg = self.cfg
        graph = self.graph if graph is None else graph
        # β factors from live degree vectors (graph is a jit argument in
        # the trainer, so these stay device buffers, never HLO constants).
        du = jnp.maximum(graph.user_degrees.astype(jnp.float32), 0.0)
        di = jnp.maximum(graph.item_degrees.astype(jnp.float32), 0.0)
        beta_u = jnp.where(du > 0, jnp.sqrt(du + 1.0) / jnp.maximum(du, 1e-12), 0.0)
        beta_i = 1.0 / jnp.sqrt(di + 1.0)

        u = params["user_emb"][users]  # (B, d)
        pe = params["item_emb"][pos]  # (B, d)
        uc = u.astype(jnp.bfloat16) if cfg.bf16_compute else u
        pec = pe.astype(jnp.bfloat16) if cfg.bf16_compute else pe
        pos_scores = jnp.sum(uc * pec, axis=1).astype(jnp.float32)
        w_pos = cfg.ug_w1 + cfg.ug_w2 * beta_u[users] * beta_i[pos]
        # BCE with label 1: -log σ(s) = softplus(-s)
        pos_loss = w_pos * jax.nn.softplus(-pos_scores)

        B = users.shape[0]
        N = cfg.ug_neg_num
        neg_denom = None  # default: mean over the sampled/constructed axis
        if cfg.ug_neg_sharing == "full":
            # Closed-form expectation of the paper's estimator: negatives
            # are uniform over the catalog (collisions included), so
            # E[mean_n w·softplus(s_n)] = mean over ALL m items — one
            # (B,d)×(d,m) MXU matmul, zero sampling variance, and every
            # item gets a negative gradient every step. On TPU this is
            # CHEAPER than gathering N sampled rows (ug_neg_num unused).
            items_t = params["item_emb"]
            itc = (
                items_t.astype(jnp.bfloat16) if cfg.bf16_compute else items_t
            )
            neg_scores = jnp.dot(
                uc, itc.T, preferred_element_type=jnp.float32
            )  # (B, m)
            w_neg = cfg.ug_w3 + cfg.ug_w4 * (
                beta_u[users][:, None] * beta_i[None, :]
            )
            if cfg.ug_sift_pos:
                # Exact sampling_sift_pos: zero the user's known positives
                # (and any phantom padding columns, which the sampler's
                # bitset also sets) out of the negative term and average
                # over the remaining catalog only.
                if not isinstance(ell, TrainBitset):
                    raise ValueError(
                        "ug_sift_pos needs the train bitset: the Trainer "
                        "passes it via the ell slot (TrainBitset), or "
                        "pass ell=TrainBitset(bitset) directly"
                    )
                is_pos = bitset_row_mask(
                    ell.bitset[users], self.m_items
                )  # (B, m) bool
                w_neg = w_neg * (1.0 - is_pos.astype(w_neg.dtype))
                neg_denom = jnp.maximum(
                    self.m_items - jnp.sum(is_pos, axis=1), 1
                ).astype(jnp.float32)
        elif cfg.ug_neg_sharing == "pool":
            # Per-example random subsets of one shared gathered pool —
            # the per-example-draw regularization of the paper's 'none'
            # estimator (same expectation: pool entries are uniform and
            # each example's subset is uniform over the pool) without
            # its B·N-row gather wall. Subsets are sampled by Bernoulli
            # INCLUSION over the (B, P) score matrix, not by index: a
            # first take_along_axis formulation ran at 32.7 s/epoch on
            # the chip because per-element selection gathers (and their
            # scatter-add cotangents) are issue-rate bound; the
            # inclusion mask is pure elementwise VPU work with zero
            # gathers. Each example sees Binomial(P, N/P) ≈ N pool SLOTS
            # (distinct slots, not necessarily distinct item ids — the
            # pool itself is drawn with replacement), so this is
            # approximately the paper's 'none' estimator; normalizing by
            # the realized per-example count is a ratio estimator with
            # O(1/N) bias relative to a fixed-N draw. One P-row gather +
            # one (B,d)×(d,P) MXU matmul per step.
            P = cfg.ug_neg_pool
            k_pool, k_inc = jax.random.split(dropout_key)
            pool = jax.random.randint(k_pool, (P,), 0, self.m_items)
            ne = params["item_emb"][pool]  # (P, d)
            nec = ne.astype(jnp.bfloat16) if cfg.bf16_compute else ne
            neg_scores = jnp.dot(
                uc, nec.T, preferred_element_type=jnp.float32
            )  # (B, P)
            include = jax.random.bernoulli(
                k_inc, min(N / P, 1.0), (B, P)
            )  # each example's own subset, E[|subset|] = N
            w_neg = cfg.ug_w3 + cfg.ug_w4 * (
                beta_u[users][:, None] * beta_i[pool][None, :]
            )
            w_neg = w_neg * include.astype(w_neg.dtype)
            if cfg.ug_sift_pos:
                # exact sampling_sift_pos: drop the user's train
                # positives from their subset — combined with the
                # per-example subsets this is the paper's full sampler
                from gsrs_tpu.ops.bitset import bitset_lookup

                if not isinstance(ell, TrainBitset):
                    raise ValueError(
                        "ug_sift_pos needs the train bitset: the Trainer "
                        "passes it via the ell slot (TrainBitset)"
                    )
                is_pos = bitset_lookup(
                    ell.bitset, users[:, None], pool[None, :]
                )  # (B, P) bool
                include = include & ~is_pos
                w_neg = w_neg * (1.0 - is_pos.astype(w_neg.dtype))
            neg_denom = jnp.maximum(
                jnp.sum(include, axis=1), 1
            ).astype(jnp.float32)
        elif cfg.ug_neg_sharing == "batch":
            negs = jax.random.randint(dropout_key, (N,), 0, self.m_items)
            ne = params["item_emb"][negs]  # (N, d)
            nec = ne.astype(jnp.bfloat16) if cfg.bf16_compute else ne
            neg_scores = jnp.dot(
                uc, nec.T, preferred_element_type=jnp.float32
            )  # (B, N) — one MXU matmul
            w_neg = cfg.ug_w3 + cfg.ug_w4 * (
                beta_u[users][:, None] * beta_i[negs][None, :]
            )
        elif cfg.ug_neg_sharing == "group":
            # One negative set per contiguous group of B/G rows: G·N
            # gathered rows/step (vs B·N for 'none') and G batched MXU
            # matmuls; within-step correlation drops by ~G vs 'batch'.
            G = cfg.ug_neg_groups
            if B % G:
                raise ValueError(
                    f"batch size {B} not divisible by ug_neg_groups {G}"
                )
            negs = jax.random.randint(dropout_key, (G, N), 0, self.m_items)
            ne = params["item_emb"][negs]  # (G, N, d)
            nec = ne.astype(jnp.bfloat16) if cfg.bf16_compute else ne
            ug = uc.reshape(G, B // G, -1)
            neg_scores = jnp.einsum(
                "gbd,gnd->gbn", ug, nec, preferred_element_type=jnp.float32
            ).reshape(B, N)
            w_neg = cfg.ug_w3 + cfg.ug_w4 * (
                beta_u[users][:, None]
                * jnp.repeat(beta_i[negs], B // G, axis=0)
            )
        else:
            negs = jax.random.randint(dropout_key, (B, N), 0, self.m_items)
            ne = params["item_emb"][negs]  # (B, N, d)
            nec = ne.astype(jnp.bfloat16) if cfg.bf16_compute else ne
            neg_scores = jnp.einsum(
                "bd,bnd->bn", uc, nec, preferred_element_type=jnp.float32
            )
            w_neg = cfg.ug_w3 + cfg.ug_w4 * beta_u[users][:, None] * beta_i[negs]
        # BCE with label 0: -log(1-σ(s)) = softplus(s); mean over negatives
        if neg_denom is None:
            neg_loss = jnp.mean(w_neg * jax.nn.softplus(neg_scores), axis=1)
        else:
            neg_loss = (
                jnp.sum(w_neg * jax.nn.softplus(neg_scores), axis=1)
                / neg_denom
            )
        loss_c = jnp.sum(pos_loss + cfg.ug_neg_weight * neg_loss)

        aux: Dict[str, jax.Array] = {"bpr": loss_c}
        loss = loss_c
        if self.ii_neighbors is not None:
            nbrs = jnp.asarray(self.ii_neighbors)[pos]  # (B, K)
            wii = jnp.asarray(self.ii_weights)[pos]  # (B, K)
            nbr_e = params["item_emb"][nbrs]  # (B, K, d)
            nbc = nbr_e.astype(jnp.bfloat16) if cfg.bf16_compute else nbr_e
            s = jnp.einsum(
                "bd,bkd->bk", uc, nbc, preferred_element_type=jnp.float32
            )
            loss_i = jnp.sum(wii * jax.nn.softplus(-s))
            aux["ii"] = loss_i
            loss = loss + cfg.ug_lambda * loss_i
        # γ‖Θ‖²/2 over the FULL tables (paper's norm_loss sums every
        # parameter; Adam's update is dense over the tables anyway).
        reg = 0.5 * (
            jnp.sum(params["user_emb"] ** 2) + jnp.sum(params["item_emb"] ** 2)
        )
        aux["reg"] = reg
        return loss, aux
