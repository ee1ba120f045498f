"""GRU4Rec-style recurrent sequential recommender.

Second member of the sequential family (with `gsrs_tpu.models.sasrec`):
a GRU over the item-embedding sequence predicting the next item at every
position (Hidasi et al. 2016 session-based style, adapted to the same
leave-last-item-out protocol). TPU-native construction: the recurrence is
a `jax.lax.scan` over time (compiler-friendly, static shapes), matmuls on
the MXU, and it plugs into the same `SeqTrainer` + shared masked-top-k
eval stack via the identical model surface (`init_params`,
`next_item_bpr_loss`, `user_representations`, `score_catalog`)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class GRU4RecConfig:
    m_items: int
    max_len: int = 50
    embedding_dim: int = 64
    hidden_dim: int = 64
    num_layers: int = 1
    dropout_rate: float = 0.1
    bf16_compute: bool = False


class GRU4Rec:
    def __init__(self, cfg: GRU4RecConfig):
        self.cfg = cfg

    def init_params(self, key: jax.Array) -> Params:
        c = self.cfg
        ks = iter(jax.random.split(key, 2 + 3 * c.num_layers))
        params: Params = {
            "item_emb": 0.1 * jax.random.normal(next(ks), (c.m_items + 1, c.embedding_dim)),
            "out_proj": jax.random.normal(next(ks), (c.hidden_dim, c.embedding_dim))
            * np.sqrt(2.0 / (c.hidden_dim + c.embedding_dim)),
        }
        for l in range(c.num_layers):
            in_dim = c.embedding_dim if l == 0 else c.hidden_dim
            h = c.hidden_dim
            # fused gate weights: [reset, update, candidate]
            params[f"l{l}_wx"] = jax.random.normal(next(ks), (in_dim, 3 * h)) * np.sqrt(
                2.0 / (in_dim + 3 * h)
            )
            params[f"l{l}_wh"] = jax.random.normal(next(ks), (h, 3 * h)) * np.sqrt(
                2.0 / (h + 3 * h)
            )
            params[f"l{l}_b"] = jnp.zeros((3 * h,))
        return params

    # --------------------------------------------------------------- encoder
    def encode(
        self,
        params: Params,
        seqs: jax.Array,  # (B, L) int32, PAD=0
        dropout_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """→ (B, L, hidden) hidden states; PAD steps carry state through
        unchanged so left padding does not perturb the recurrence."""
        c = self.cfg
        compute_dtype = jnp.bfloat16 if c.bf16_compute else jnp.float32
        x = params["item_emb"][seqs].astype(compute_dtype)  # (B, L, d)
        if dropout_key is not None and c.dropout_rate > 0.0:
            keep = jax.random.bernoulli(
                dropout_key, 1.0 - c.dropout_rate, x.shape
            )
            x = jnp.where(keep, x / (1.0 - c.dropout_rate), 0.0).astype(compute_dtype)
        valid = (seqs != 0).astype(compute_dtype)[:, :, None]  # (B, L, 1)

        h_seq = x
        for l in range(c.num_layers):
            wx = params[f"l{l}_wx"].astype(compute_dtype)
            wh = params[f"l{l}_wh"].astype(compute_dtype)
            b = params[f"l{l}_b"].astype(compute_dtype)
            hdim = c.hidden_dim

            # precompute input projections for the whole sequence (MXU)
            xproj = h_seq @ wx + b  # (B, L, 3h)

            def step(h_prev, inputs):
                xp, v = inputs  # (B, 3h), (B, 1)
                hp = h_prev @ wh  # (B, 3h)
                r = jax.nn.sigmoid(xp[:, :hdim] + hp[:, :hdim])
                z = jax.nn.sigmoid(xp[:, hdim : 2 * hdim] + hp[:, hdim : 2 * hdim])
                n = jnp.tanh(xp[:, 2 * hdim :] + r * hp[:, 2 * hdim :])
                h_new = (1 - z) * n + z * h_prev
                h_new = v * h_new + (1 - v) * h_prev  # PAD: carry state
                return h_new, h_new

            B = h_seq.shape[0]
            h0 = jnp.zeros((B, hdim), compute_dtype)
            _, outs = jax.lax.scan(
                step,
                h0,
                (
                    jnp.swapaxes(xproj, 0, 1),  # (L, B, 3h)
                    jnp.swapaxes(valid, 0, 1),  # (L, B, 1)
                ),
            )
            h_seq = jnp.swapaxes(outs, 0, 1)  # (B, L, h)
        return h_seq.astype(jnp.float32)

    # ------------------------------------------------------------------ loss
    def next_item_bpr_loss(
        self,
        params: Params,
        seqs: jax.Array,
        pos: jax.Array,
        neg: jax.Array,
        dropout_key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        h = self.encode(params, seqs, dropout_key) @ params["out_proj"]
        pe = params["item_emb"][pos]
        ne = params["item_emb"][neg]
        pos_scores = jnp.sum(h * pe, axis=-1)
        neg_scores = jnp.sum(h * ne, axis=-1)
        valid = (pos != 0).astype(jnp.float32)
        bpr = -jnp.sum(
            jax.nn.log_sigmoid(pos_scores - neg_scores) * valid
        ) / jnp.maximum(jnp.sum(valid), 1.0)
        reg = 0.5 * (jnp.sum(pe * pe) + jnp.sum(ne * ne)) / seqs.shape[0]
        return bpr, {"bpr": bpr, "reg": reg}

    # ------------------------------------------------------------- retrieval
    def user_representations(self, params: Params, seqs: jax.Array) -> jax.Array:
        h = self.encode(params, seqs)
        return h[:, -1, :] @ params["out_proj"]

    def score_catalog(self, params: Params, seqs: jax.Array) -> jax.Array:
        # slice exactly m_items real rows: tolerant of a row-padded table
        # (the mesh trainer pads item_emb to the model-axis multiple)
        q = self.user_representations(params, seqs)
        return jnp.dot(
            q,
            params["item_emb"][1 : self.cfg.m_items + 1].T,
            preferred_element_type=jnp.float32,
        )
