"""XSimGCL — graph contrastive learning on LightGCN propagation.

Quality-oriented graph-family member (Yu et al. 2022, "XSimGCL: Towards
Extremely Simple Graph Contrastive Learning for Recommendation"): plain
LightGCN propagation, but during training each layer output is perturbed
with small random noise, and an InfoNCE contrastive loss ties the final
(layer-mean) representation to one intermediate layer's representation.
The contrastive term regularizes the embedding geometry toward uniformity
and consistently improves recall/NDCG over plain LightGCN on the
reference's benchmark datasets — the framework's "beat the baseline"
model. No reference counterpart (the reference is LightGCN-only).

Why it is nearly free on TPU: unlike SimGCL (two extra noisy
propagations), XSimGCL extracts BOTH contrastive views from the ONE
propagation the BPR loss already needs — per step the only extra work is
two (B×B) cosine-similarity matmuls on the MXU.

Noise (paper eq. 4): e' = e + ε · sign(e) ⊙ normalize(U(0,1)); applied
per layer to both node partitions. Evaluation runs noiseless, which makes
this model's eval path IDENTICAL to LightGCN's (tested invariant).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from gsrs_tpu.config import ModelConfig
from gsrs_tpu.data.adjacency import BipartiteGraph
from gsrs_tpu.models.lightgcn import LightGCN, Params
from gsrs_tpu.ops.ell import ell_propagate_layer
from gsrs_tpu.ops.spmm import propagate_layer


def _l2norm(x: jax.Array) -> jax.Array:
    return x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-12)
    )


def info_nce(z1: jax.Array, z2: jax.Array, temp: float) -> jax.Array:
    """Mean InfoNCE over rows: positives are the aligned pairs, negatives
    the rest of the batch (in-batch, duplicates kept — the official
    XSimGCL recipe)."""
    z1, z2 = _l2norm(z1), _l2norm(z2)
    logits = (z1 @ z2.T) / temp  # (B, B)
    return -jnp.mean(
        jnp.diag(logits) - jax.nn.logsumexp(logits, axis=1)
    )


class XSimGCL(LightGCN):
    # Trainer passes the per-step PRNG key whenever this is set, even with
    # edge dropout off — the noise views need it (train/trainer.py).
    needs_step_key = True

    def __init__(self, cfg: ModelConfig, graph: BipartiteGraph, i2i=None, ell=None):
        super().__init__(cfg, graph, i2i=i2i, ell=ell)

    # ----------------------------------------------------------- propagation
    def _propagate_views(
        self,
        params: Params,
        noise_key: Optional[jax.Array],
        graph: Optional[BipartiteGraph] = None,
        ell=None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """One propagation → (final_u, final_i, view_u, view_i): the
        layer-mean readout plus the cl_layer'th layer as the second view.
        ``noise_key=None`` (eval) is exactly LightGCN.propagate."""
        graph = self.graph if graph is None else graph
        ell = self.ell if ell is None else ell
        use_ell = self.cfg.spmm_mode == "ell" and ell is not None
        cfg = self.cfg

        u = params["user_emb"]
        i = params["item_emb"]
        if cfg.bf16_compute:
            u, i = u.astype(jnp.bfloat16), i.astype(jnp.bfloat16)

        keep = None
        if noise_key is not None and cfg.dropout:
            keep = jax.random.bernoulli(
                jax.random.fold_in(noise_key, -1),
                p=cfg.keep_prob,
                shape=graph.edge_w_by_u.shape,
            ).astype(u.dtype) / cfg.keep_prob

        def perturb(x, key):
            noise = jax.random.uniform(key, x.shape, dtype=jnp.float32)
            return x + (
                cfg.cl_eps * jnp.sign(x.astype(jnp.float32)) * _l2norm(noise)
            ).astype(x.dtype)

        acc_u, acc_i = u, i
        cur_u, cur_i = u, i
        view_u, view_i = u, i
        cl_layer = min(max(cfg.cl_layer, 1), max(cfg.num_layers, 1))
        for k in range(cfg.num_layers):
            if use_ell:
                cur_u, cur_i = ell_propagate_layer(ell, cur_u, cur_i, keep)
            else:
                masks = (
                    None
                    if keep is None
                    else (keep[graph.perm_by_u], keep[graph.perm_by_i])
                )
                cur_u, cur_i = propagate_layer(graph, cur_u, cur_i, masks)
            if noise_key is not None:
                ku, ki = jax.random.split(jax.random.fold_in(noise_key, k))
                cur_u, cur_i = perturb(cur_u, ku), perturb(cur_i, ki)
            acc_u = acc_u + cur_u
            acc_i = acc_i + cur_i
            if k + 1 == cl_layer:
                view_u, view_i = cur_u, cur_i
        scale = 1.0 / (cfg.num_layers + 1)
        return (
            (acc_u * scale).astype(jnp.float32),
            (acc_i * scale).astype(jnp.float32),
            view_u.astype(jnp.float32),
            view_i.astype(jnp.float32),
        )

    def propagate(self, params, dropout_key=None, graph=None, ell=None):
        fu, fi, _, _ = self._propagate_views(params, dropout_key, graph, ell)
        return fu, fi

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
        """BPR (same convention as LightGCN) + λ·(InfoNCE over the batch's
        users and positive items between the two propagation views)."""
        all_u, all_i, view_u, view_i = self._propagate_views(
            params, dropout_key, graph, ell
        )
        if self.cfg.use_pop_gate:
            items, gate = self._fuse(params, all_i, graph)
        else:
            items, gate = all_i, None
        u = all_u[users]
        pe = items[pos]
        ne = items[neg]
        pos_scores = jnp.sum(u * pe, axis=1)
        neg_scores = jnp.sum(u * ne, axis=1)
        bpr = -jnp.mean(jax.nn.log_sigmoid(pos_scores - neg_scores))
        batch = users.shape[0]
        reg = 0.5 * (
            jnp.sum(u * u) + jnp.sum(pe * pe) + jnp.sum(ne * ne)
        ) / batch
        loss = bpr
        aux: Dict[str, jax.Array] = {"bpr": bpr, "reg": reg}
        if dropout_key is not None and self.cfg.cl_lambda > 0.0:
            cl = info_nce(
                all_u[users], view_u[users], self.cfg.cl_temp
            ) + info_nce(all_i[pos], view_i[pos], self.cfg.cl_temp)
            loss = loss + self.cfg.cl_lambda * cl
            aux["cl"] = cl
        if gate is not None:
            g = jnp.clip(
                jnp.concatenate([gate[pos], gate[neg]]), 1e-6, 1.0 - 1e-6
            )
            entropy = -jnp.mean(g * jnp.log(g) + (1 - g) * jnp.log(1 - g))
            loss = loss - self.cfg.gate_entropy_coeff * entropy
            aux["gate_entropy"] = entropy
        return loss, aux
