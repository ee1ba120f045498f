"""NGCF — Neural Graph Collaborative Filtering (Wang et al. 2019).

Second graph-family member beyond the reference's LightGCN (the reference
registry only ever exposes 'lgn', reference code/register.py:40-47).
LightGCN is the ablation of this model; providing both lets users compare
the families the literature compares.

TPU formulation: the NGCF layer

    e_u' = LeakyReLU( W1 (e_u + Σ_i ŵ_ui e_i) + W2 ((Σ_i ŵ_ui e_i) ⊙ e_u) )

uses the identity Σ_i ŵ_ui (e_i ⊙ e_u) = (Σ_i ŵ_ui e_i) ⊙ e_u — the
user-side factor is constant across the neighbor sum — so the bilinear
message term needs NO per-edge feature products: each layer is exactly
one bipartite two-SpMM (the same scatter-free ELL / segment-sum kernels
LightGCN uses, `gsrs_tpu.ops.ell` / `gsrs_tpu.ops.spmm`) followed by two
dense (MXU) transforms. ŵ is the same symmetric normalization
``1/sqrt(d_u d_i)`` as LightGCN's.

Readout: per-layer L2 normalization then concatenation over layers
0..K (the paper's evaluation recipe), so the scoring dim is d·(K+1).
The pop-gate / i2i extensions are LightGCN-fork-specific (they assume a
d-dim item readout) and are disabled here.

Shares everything downstream unchanged: sampler, Trainer, Evaluator,
sharding layouts (the per-layer W1/W2 are small and replicate like the
gate MLPs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsrs_tpu.config import ModelConfig
from gsrs_tpu.data.adjacency import BipartiteGraph
from gsrs_tpu.models.lightgcn import LightGCN, Params
from gsrs_tpu.ops.ell import ell_propagate_layer
from gsrs_tpu.ops.linalg import l2_normalize
from gsrs_tpu.ops.spmm import edge_keep_mask, propagate_layer


class NGCF(LightGCN):
    def __init__(self, cfg: ModelConfig, graph: BipartiteGraph, i2i=None, ell=None):
        # reg_mode is pinned to 'ego' (the NGCF paper's convention):
        # under 'propagated' the readout is a concat of L2-normalized
        # layers, so every row has constant squared norm K+1 and the L2
        # term would have zero gradient — --decay would be a silent no-op.
        cfg = dataclasses.replace(
            cfg, use_pop_gate=False, use_item_item=False, reg_mode="ego"
        )
        super().__init__(cfg, graph, i2i=None, ell=ell)

    # ------------------------------------------------------------------ init
    def init_params(self, key: jax.Array) -> Params:
        params = super().init_params(key)
        d = self.cfg.embedding_dim
        ks = jax.random.split(jax.random.fold_in(key, 1), 2 * self.cfg.num_layers)
        for k in range(self.cfg.num_layers):
            glorot = np.sqrt(2.0 / (d + d))
            params[f"ngcf_w1_{k}"] = glorot * jax.random.normal(ks[2 * k], (d, d))
            params[f"ngcf_w2_{k}"] = glorot * jax.random.normal(ks[2 * k + 1], (d, d))
            params[f"ngcf_b1_{k}"] = jnp.zeros((d,))
            params[f"ngcf_b2_{k}"] = jnp.zeros((d,))
        return params

    # ----------------------------------------------------------- propagation
    def propagate(
        self,
        params: Params,
        dropout_key: Optional[jax.Array] = None,
        graph: Optional[BipartiteGraph] = None,
        ell=None,
    ) -> Tuple[jax.Array, jax.Array]:
        graph = self.graph if graph is None else graph
        ell = self.ell if ell is None else ell
        use_ell = self.cfg.spmm_mode == "ell" and self.cfg.num_layers > 0
        if use_ell and ell is None:
            raise ValueError(
                "spmm_mode='ell' but the model was built without an EllGraph;"
                " pass ell=ell_from_interactions(data) or use 'segment'"
            )

        u = params["user_emb"]
        i = params["item_emb"]
        compute_dtype = jnp.bfloat16 if self.cfg.bf16_compute else jnp.float32
        u, i = u.astype(compute_dtype), i.astype(compute_dtype)

        keep = masks = None
        if dropout_key is not None and self.cfg.dropout:
            keep = edge_keep_mask(
                dropout_key, graph, self.cfg.keep_prob, dtype=u.dtype
            )
            if not use_ell:
                masks = (keep[graph.perm_by_u], keep[graph.perm_by_i])

        _norm = l2_normalize
        outs_u = [_norm(u.astype(jnp.float32))]
        outs_i = [_norm(i.astype(jnp.float32))]
        cur_u, cur_i = u, i
        for k in range(self.cfg.num_layers):
            if use_ell:
                agg_u, agg_i = ell_propagate_layer(ell, cur_u, cur_i, keep)
            else:
                agg_u, agg_i = propagate_layer(graph, cur_u, cur_i, masks)
            w1 = params[f"ngcf_w1_{k}"].astype(compute_dtype)
            w2 = params[f"ngcf_w2_{k}"].astype(compute_dtype)
            b1 = params[f"ngcf_b1_{k}"].astype(compute_dtype)
            b2 = params[f"ngcf_b2_{k}"].astype(compute_dtype)
            cur_u = jax.nn.leaky_relu(
                (cur_u + agg_u) @ w1 + b1 + (agg_u * cur_u) @ w2 + b2,
                negative_slope=0.2,
            )
            cur_i = jax.nn.leaky_relu(
                (cur_i + agg_i) @ w1 + b1 + (agg_i * cur_i) @ w2 + b2,
                negative_slope=0.2,
            )
            outs_u.append(_norm(cur_u.astype(jnp.float32)))
            outs_i.append(_norm(cur_i.astype(jnp.float32)))

        return (
            jnp.concatenate(outs_u, axis=1),
            jnp.concatenate(outs_i, axis=1),
        )
