"""LightGCN — functional TPU-native implementation.

Re-designs the reference `LightGCN(nn.Module)` (reference
code/model.py:37-231) as a stateless model object with pure jittable
methods over an explicit parameter pytree:

- propagation runs as K bipartite two-SpMM layers with layer-mean readout
  (math-equivalent to K × ``torch.sparse.mm`` on the stacked adjacency +
  mean, reference code/model.py:201-225)
- optional item–item smoothing after readout
  (reference code/model.py:228-229)
- optional popularity-gate fusion of item embeddings
  (reference code/model.py:65-96,139-157)
- BPR loss with the reference's exact regularization convention:
  L2 on the *propagated/fused* batch embeddings, 0.5·Σ‖·‖²/B
  (reference code/model.py:162-183), minus the gate-entropy bonus over
  the batch's pos+neg gates (reference code/model.py:176-181)
- edge dropout implemented for real (the reference parses --dropout/
  --keepprob but leaves it TODO, reference code/model.py:214)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsrs_tpu.config import ModelConfig
from gsrs_tpu.data.adjacency import BipartiteGraph
from gsrs_tpu.ops.ell import EllGraph, ell_from_interactions, ell_propagate_layer
from gsrs_tpu.ops.spmm import edge_keep_mask, propagate_layer, spmm_edges

Params = Dict[str, jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ItemItemGraph:
    """Normalized item–item adjacency as padded edge arrays, sorted by
    destination item (reference loads this as a torch sparse CSR,
    code/model.py:98-109; built offline by `gsrs_tpu.data.i2i`)."""

    dst: jax.Array  # (E,) int32, sorted
    src: jax.Array  # (E,) int32
    w: jax.Array  # (E,) float32, 0 on padding
    m_items: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_scipy(mat, edge_pad_multiple: int = 8192) -> "ItemItemGraph":
        coo = mat.tocoo()
        order = np.argsort(coo.row, kind="stable")
        dst = coo.row[order].astype(np.int32)
        src = coo.col[order].astype(np.int32)
        w = coo.data[order].astype(np.float32)
        pad = -(-max(dst.size, 1) // edge_pad_multiple) * edge_pad_multiple
        def p(x, fill):
            out = np.full(pad, fill, dtype=x.dtype)
            out[: x.size] = x
            return out
        # pad dst with the LAST node id (not 0) so the sorted order the
        # segment-sum relies on (indices_are_sorted=True in spmm_edges)
        # survives padding — same convention as data/adjacency.py; the
        # zero weight keeps the padding a no-op
        last = np.int32(mat.shape[0] - 1)
        return ItemItemGraph(
            dst=p(dst, last), src=p(src, last), w=p(w, 0.0),
            m_items=int(mat.shape[0]),
        )


def popularity_scalar(item_degrees: jax.Array) -> jax.Array:
    """Standardized log1p(item interaction count), (m,) — the pop-gate
    input feature (reference code/model.py:73-78; torch .std() is
    Bessel-corrected, so ddof=1 here)."""
    pop = jnp.log1p(jnp.maximum(item_degrees.astype(jnp.float32), 0.0))
    mean = jnp.mean(pop)
    n = pop.shape[0]
    std = jnp.sqrt(jnp.sum((pop - mean) ** 2) / jnp.maximum(n - 1, 1))
    return (pop - mean) / (std + 1e-8)


class LightGCN:
    """Stateless model: holds config + graph constants, exposes pure fns."""

    def __init__(
        self,
        cfg: ModelConfig,
        graph: BipartiteGraph,
        i2i: Optional[ItemItemGraph] = None,
        ell: Optional[EllGraph] = None,
    ):
        if cfg.spmm_mode not in ("ell", "hybrid", "tiled", "segment"):
            raise ValueError(
                f"spmm_mode must be 'ell', 'hybrid', 'tiled' or 'segment', "
                f"got '{cfg.spmm_mode}' (an unknown mode would silently "
                f"run the slow segment path)"
            )
        self.cfg = cfg
        self.graph = graph
        # the scatter-free ELL layout is the default propagation path; the
        # segment-sum path stays available via cfg.spmm_mode='segment'.
        # Auto-derive it from the edge arrays when the caller didn't pass
        # one (costs one host-side rebuild; callers on the hot path pass
        # ell_from_interactions(data) directly).
        if ell is None and cfg.spmm_mode == "ell" and cfg.num_layers > 0:
            from gsrs_tpu.ops.ell import ell_from_graph

            ell = ell_from_graph(graph)
        if ell is None and cfg.spmm_mode == "hybrid" and cfg.num_layers > 0:
            from gsrs_tpu.ops.hybrid import hybrid_from_graph

            ell = hybrid_from_graph(
                graph,
                cols=cfg.hybrid_cols,
                dtype=jnp.bfloat16 if cfg.bf16_compute else jnp.float32,
            )
        if ell is None and cfg.spmm_mode == "tiled" and cfg.num_layers > 0:
            from gsrs_tpu.ops.tiled import tiled_from_graph

            ell = tiled_from_graph(
                graph,
                groups=cfg.tiled_groups,
                cols=cfg.tiled_cols,
                dtype=jnp.bfloat16 if cfg.bf16_compute else jnp.float32,
            )
        self.ell = ell
        self.i2i = i2i if (cfg.use_item_item and i2i is not None) else None
        self.n_users = graph.n_users
        self.m_items = graph.m_items

    # ------------------------------------------------------------------ init
    def init_params(self, key: jax.Array) -> Params:
        """N(0, 0.1²) embedding init (reference code/model.py:57-60) plus
        Glorot-initialized pop-gate MLPs when enabled."""
        d = self.cfg.embedding_dim
        ks = jax.random.split(key, 8)
        params: Params = {
            "user_emb": 0.1 * jax.random.normal(ks[0], (self.n_users, d)),
            "item_emb": 0.1 * jax.random.normal(ks[1], (self.m_items, d)),
        }
        if self.cfg.use_pop_gate:
            h, g = self.cfg.pop_hidden, self.cfg.gate_hidden

            def linear(k, fan_in, fan_out):
                # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
                bound = 1.0 / np.sqrt(fan_in)
                kw, kb = jax.random.split(k)
                return (
                    jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound),
                    jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound),
                )

            params["pop_w1"], params["pop_b1"] = linear(ks[2], 1, h)
            params["pop_w2"], params["pop_b2"] = linear(ks[3], h, d)
            params["gate_w1"], params["gate_b1"] = linear(ks[4], 2 * d, g)
            params["gate_w2"], params["gate_b2"] = linear(ks[5], g, 1)
        return params

    # ----------------------------------------------------------- propagation
    def propagate(
        self,
        params: Params,
        dropout_key: Optional[jax.Array] = None,
        graph: Optional[BipartiteGraph] = None,
        ell: Optional[EllGraph] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """K-layer propagation + mean over layers 0..K, then optional i2i
        smoothing. Pop-gate fusion is applied separately (`_fuse`)
        to mirror the reference's computer()/_fuse split.

        ``graph`` may be passed explicitly so jitted callers trace it as an
        argument instead of a closure constant (large closed-over arrays
        are embedded into the lowered HLO, bloating compile uploads);
        defaults to the graph bound at construction."""
        graph = self.graph if graph is None else graph
        ell = self.ell if ell is None else ell
        use_ell = (
            self.cfg.spmm_mode in ("ell", "hybrid", "tiled")
            and self.cfg.num_layers > 0
        )
        if use_ell and ell is None:
            raise ValueError(
                f"spmm_mode='{self.cfg.spmm_mode}' but the model was built "
                "without a graph layout; pass ell=ell_from_interactions("
                "data) / hybrid_from_interactions(data) or use 'segment'"
            )
        use_hybrid = use_tiled = False
        if use_ell:
            from gsrs_tpu.ops.hybrid import HybridGraph, hybrid_propagate_layer
            from gsrs_tpu.ops.tiled import TiledGraph, tiled_propagate_layer

            use_hybrid = isinstance(ell, HybridGraph)
            use_tiled = isinstance(ell, TiledGraph)
        u = params["user_emb"]
        i = params["item_emb"]
        if self.cfg.bf16_compute:
            u, i = u.astype(jnp.bfloat16), i.astype(jnp.bfloat16)

        # Edge dropout (inverted, sampled once per step in canonical edge
        # order via ops.spmm.edge_keep_mask so both SpMM directions drop
        # the same edges); the permuted views are hoisted out of the loop.
        # Hybrid mode instead uses the stateless per-edge hash mask
        # (ops.hashdrop) — the dense hub block has no edge-index matrix,
        # so the keep decision is recomputed elementwise per cell.
        keep = edge_masks = hdrop = None
        if dropout_key is not None and self.cfg.dropout:
            if use_hybrid or use_tiled:
                from gsrs_tpu.ops.hashdrop import hashdrop_from_key

                hdrop = hashdrop_from_key(dropout_key, self.cfg.keep_prob)
            else:
                keep = edge_keep_mask(
                    dropout_key, graph, self.cfg.keep_prob, dtype=u.dtype
                )
                if not use_ell:
                    edge_masks = (keep[graph.perm_by_u], keep[graph.perm_by_i])

        acc_u, acc_i = u, i
        cur_u, cur_i = u, i
        for _ in range(self.cfg.num_layers):
            if use_hybrid:
                cur_u, cur_i = hybrid_propagate_layer(ell, cur_u, cur_i, hdrop)
            elif use_tiled:
                cur_u, cur_i = tiled_propagate_layer(ell, cur_u, cur_i, hdrop)
            elif use_ell:
                cur_u, cur_i = ell_propagate_layer(ell, cur_u, cur_i, keep)
            else:
                cur_u, cur_i = propagate_layer(graph, cur_u, cur_i, edge_masks)
            acc_u = acc_u + cur_u
            acc_i = acc_i + cur_i
        scale = 1.0 / (self.cfg.num_layers + 1)
        all_users = (acc_u * scale).astype(jnp.float32)
        all_items = (acc_i * scale).astype(jnp.float32)

        if self.i2i is not None and self.cfg.i2i_alpha > 0.0:
            smoothed = spmm_edges(
                self.i2i.dst, self.i2i.src, self.i2i.w, all_items, self.m_items
            )
            all_items = all_items + self.cfg.i2i_alpha * smoothed
        return all_users, all_items

    # ------------------------------------------------------------- pop gate
    def _pop_vec(self, params: Params, graph: Optional[BipartiteGraph] = None) -> jax.Array:
        graph = self.graph if graph is None else graph
        pop_feat = popularity_scalar(graph.item_degrees)[:, None]  # (m,1)
        h = jax.nn.relu(pop_feat @ params["pop_w1"] + params["pop_b1"])
        return h @ params["pop_w2"] + params["pop_b2"]  # (m,d)

    def _fuse(
        self, params: Params, all_items: jax.Array,
        graph: Optional[BipartiteGraph] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        pop_vec = self._pop_vec(params, graph)
        gate_in = jnp.concatenate([all_items, pop_vec], axis=1)
        h = jax.nn.relu(gate_in @ params["gate_w1"] + params["gate_b1"])
        logit = h @ params["gate_w2"] + params["gate_b2"]  # (m,1)
        if self.cfg.pop_gate_temp != 1.0:
            logit = logit / self.cfg.pop_gate_temp
        gate = jax.nn.sigmoid(logit)
        fused = gate * all_items + (1.0 - gate) * pop_vec
        return fused, gate[:, 0]

    # ------------------------------------------------------------ embeddings
    def final_embeddings(
        self,
        params: Params,
        dropout_key: Optional[jax.Array] = None,
        graph: Optional[BipartiteGraph] = None,
        ell: Optional[EllGraph] = None,
    ) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
        """(all_users, item_embeddings_for_scoring, gates)."""
        all_users, all_items = self.propagate(params, dropout_key, graph, ell)
        if self.cfg.use_pop_gate:
            items, gate = self._fuse(params, all_items, graph)
            return all_users, items, gate
        return all_users, all_items, None

    # ------------------------------------------------------------------ loss
    def bpr_loss(
        self,
        params: Params,
        users: jax.Array,
        pos: jax.Array,
        neg: jax.Array,
        dropout_key: Optional[jax.Array] = None,
        graph: Optional[BipartiteGraph] = None,
        ell: Optional[EllGraph] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Returns (loss, aux) where loss = BPR − ent_coeff·entropy and
        aux['reg'] is the L2 term the trainer scales by --decay, exactly
        as the reference splits them (code/model.py:162-183 +
        code/utils.py:53-64)."""
        all_users, items, gate = self.final_embeddings(
            params, dropout_key, graph, ell
        )
        return self._pairwise_bpr(
            all_users, items, gate, users, pos, neg, params=params
        )

    def _pairwise_bpr(
        self,
        all_users: jax.Array,
        items: jax.Array,
        gate: Optional[jax.Array],
        users: jax.Array,
        pos: jax.Array,
        neg: jax.Array,
        params: Optional[Params] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """BPR + reg (+ gate-entropy bonus) on already-propagated/fused
        embeddings — shared by every graph model's loss.

        reg_mode 'propagated' (default) matches the reference fork's
        committed math (L2 on the computer() outputs, reference
        code/model.py:125-134,173); 'ego' matches upstream
        LightGCN-pytorch (L2 on the raw table rows — the code whose
        published 0.1825 Gowalla recall@20 the fork's README quotes).
        Requires ``params`` when 'ego'."""
        u = all_users[users]
        pe = items[pos]
        ne = items[neg]
        pos_scores = jnp.sum(u * pe, axis=1)
        neg_scores = jnp.sum(u * ne, axis=1)
        bpr = -jnp.mean(jax.nn.log_sigmoid(pos_scores - neg_scores))
        batch = users.shape[0]
        if self.cfg.reg_mode == "ego":
            if params is None:
                raise ValueError("reg_mode='ego' needs params at the loss")
            u0 = params["user_emb"][users]
            p0 = params["item_emb"][pos]
            n0 = params["item_emb"][neg]
            reg = 0.5 * (
                jnp.sum(u0 * u0) + jnp.sum(p0 * p0) + jnp.sum(n0 * n0)
            ) / batch
        else:
            reg = 0.5 * (
                jnp.sum(u * u) + jnp.sum(pe * pe) + jnp.sum(ne * ne)
            ) / batch
        loss = bpr
        aux = {"bpr": bpr, "reg": reg}
        if gate is not None:
            g = jnp.clip(
                jnp.concatenate([gate[pos], gate[neg]]), 1e-6, 1.0 - 1e-6
            )
            entropy = -jnp.mean(g * jnp.log(g) + (1 - g) * jnp.log(1 - g))
            loss = loss - self.cfg.gate_entropy_coeff * entropy
            aux["gate_entropy"] = entropy
        return loss, aux

    # ----------------------------------------------------------------- heads
    def users_rating(
        self, params: Params, users: jax.Array
    ) -> jax.Array:
        """Full-catalog raw scores for a user batch (reference
        code/model.py:114-123; no activation in this fork)."""
        all_users, items, _ = self.final_embeddings(params)
        return jnp.dot(
            all_users[users], items.T, preferred_element_type=jnp.float32
        )

    def forward(
        self, params: Params, users: jax.Array, item_ids: jax.Array
    ) -> jax.Array:
        """Pairwise dot scores (reference code/model.py:188-196)."""
        all_users, items, _ = self.final_embeddings(params)
        return jnp.sum(all_users[users] * items[item_ids], axis=1)
