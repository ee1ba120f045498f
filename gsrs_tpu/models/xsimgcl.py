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

from gsrs_tpu.data.adjacency import BipartiteGraph
from gsrs_tpu.models.lightgcn import LightGCN, Params
from gsrs_tpu.ops.ell import ell_propagate_layer
from gsrs_tpu.ops.linalg import l2_normalize
from gsrs_tpu.ops.spmm import edge_keep_mask, propagate_layer, spmm_edges


def info_nce(z1: jax.Array, z2: jax.Array, temp: float) -> jax.Array:
    """Mean InfoNCE over rows: positives are the aligned pairs, negatives
    the rest of the batch."""
    z1, z2 = l2_normalize(z1), l2_normalize(z2)
    logits = (z1 @ z2.T) / temp  # (B, B)
    return -jnp.mean(
        jnp.diag(logits) - jax.nn.logsumexp(logits, axis=1)
    )


def info_nce_unique(
    ids: jax.Array, view1: jax.Array, view2: jax.Array, temp: float
) -> jax.Array:
    """InfoNCE over the UNIQUE ids in a batch — the official XSimGCL
    recipe (`torch.unique` on the batch's user/item ids before the CL
    loss). Duplicates matter: a repeated id would appear as its own
    in-batch negative with identical embedding, an unsatisfiable pair
    whose gradient grows with batch size (at B=8192 over ~30k gowalla
    users the duplicate rate is ~24%). XLA needs static shapes, so
    uniqueness is done by sorting and masking duplicate rows out of the
    numerator and duplicate columns out of the denominator.

    ``view1``/``view2`` are full node tables; rows are gathered here."""
    ids_s = jnp.sort(ids)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]]
    )
    z1 = l2_normalize(view1[ids_s])
    z2 = l2_normalize(view2[ids_s])
    logits = (z1 @ z2.T) / temp  # (B, B)
    logits = jnp.where(first[None, :], logits, -jnp.inf)
    per_row = jnp.diag(logits) - jax.nn.logsumexp(logits, axis=1)
    return -jnp.sum(jnp.where(first, per_row, 0.0)) / jnp.maximum(
        jnp.sum(first), 1
    )


class XSimGCL(LightGCN):
    # Trainer passes the per-step PRNG key whenever this is set, even with
    # edge dropout off — the noise views need it (train/trainer.py).
    needs_step_key = True

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
        cfg = self.cfg
        use_ell = cfg.spmm_mode == "ell" and cfg.num_layers > 0
        if use_ell and ell is None:
            raise ValueError(
                "spmm_mode='ell' but the model was built without an EllGraph;"
                " pass ell=ell_from_interactions(data) or use 'segment'"
            )

        u = params["user_emb"]
        i = params["item_emb"]
        if cfg.bf16_compute:
            u, i = u.astype(jnp.bfloat16), i.astype(jnp.bfloat16)

        keep = masks = None
        if noise_key is not None and cfg.dropout:
            keep = edge_keep_mask(
                jax.random.fold_in(noise_key, -1), graph, cfg.keep_prob,
                dtype=u.dtype,
            )
            if not use_ell:
                masks = (keep[graph.perm_by_u], keep[graph.perm_by_i])

        def perturb(x, key):
            noise = jax.random.uniform(key, x.shape, dtype=jnp.float32)
            return x + (
                cfg.cl_eps * jnp.sign(x.astype(jnp.float32)) * l2_normalize(noise)
            ).astype(x.dtype)

        acc_u, acc_i = u, i
        cur_u, cur_i = u, i
        view_u, view_i = u, i
        cl_layer = min(max(cfg.cl_layer, 1), max(cfg.num_layers, 1))
        for k in range(cfg.num_layers):
            if use_ell:
                cur_u, cur_i = ell_propagate_layer(ell, cur_u, cur_i, keep)
            else:
                cur_u, cur_i = propagate_layer(graph, cur_u, cur_i, masks)
            if noise_key is not None:
                ku, ki = jax.random.split(jax.random.fold_in(noise_key, k))
                cur_u, cur_i = perturb(cur_u, ku), perturb(cur_i, ki)
            acc_u = acc_u + cur_u
            acc_i = acc_i + cur_i
            if k + 1 == cl_layer:
                view_u, view_i = cur_u, cur_i
        scale = 1.0 / (cfg.num_layers + 1)
        all_users = (acc_u * scale).astype(jnp.float32)
        all_items = (acc_i * scale).astype(jnp.float32)
        if self.i2i is not None and cfg.i2i_alpha > 0.0:
            smoothed = spmm_edges(
                self.i2i.dst, self.i2i.src, self.i2i.w, all_items, self.m_items
            )
            all_items = all_items + cfg.i2i_alpha * smoothed
        return (
            all_users,
            all_items,
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
        loss, aux = self._pairwise_bpr(
            all_u, items, gate, users, pos, neg, params=params
        )
        if dropout_key is not None and self.cfg.cl_lambda > 0.0:
            cl = info_nce_unique(
                users, all_u, view_u, self.cfg.cl_temp
            ) + info_nce_unique(pos, all_i, view_i, self.cfg.cl_temp)
            loss = loss + self.cfg.cl_lambda * cl
            aux = {**aux, "cl": cl}
        return loss, aux
