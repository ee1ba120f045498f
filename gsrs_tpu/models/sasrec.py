"""SASRec-style sequential recommender — TPU-native.

The reference repo's name promises sequential recommendation but contains
no code for it (SURVEY.md §0); this supplies that model family for the
TPU build as a self-attention next-item predictor (Kang & McAuley 2018
style), built the same way as the LightGCN core: a stateless model object
with pure jittable functions over an explicit parameter pytree. Design
points for TPU:

- static (B, L) shapes, causal mask via a constant triangular bool —
  no dynamic control flow under jit
- pre-LayerNorm transformer blocks on the MXU, bf16-compatible
- training objective: BPR on (next-item positive, uniform negative) at
  every valid position — the same pairwise loss family as the graph
  model, sharing the trainer's conventions
- retrieval: final hidden state @ item-embedding table — the exact same
  masked top-k eval path as LightGCN (`gsrs_tpu.ops.topk`), so the
  evaluator/metrics stack is reused as-is
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class SASRecConfig:
    m_items: int  # real item count; embedding table has m_items+1 rows (PAD=0)
    max_len: int = 50
    embedding_dim: int = 64
    num_blocks: int = 2
    num_heads: int = 1
    ffn_hidden: int = 64
    dropout_rate: float = 0.2
    bf16_compute: bool = False


class SASRec:
    def __init__(self, cfg: SASRecConfig):
        self.cfg = cfg

    # ------------------------------------------------------------------ init
    def init_params(self, key: jax.Array) -> Params:
        c = self.cfg
        d = c.embedding_dim
        ks = iter(jax.random.split(key, 4 + 8 * c.num_blocks))
        params: Params = {
            # row 0 is PAD and stays ~0 through masking
            "item_emb": 0.1 * jax.random.normal(next(ks), (c.m_items + 1, d)),
            "pos_emb": 0.1 * jax.random.normal(next(ks), (c.max_len, d)),
            "ln_f_scale": jnp.ones((d,)),
            "ln_f_bias": jnp.zeros((d,)),
        }
        for b in range(c.num_blocks):
            glorot = lambda k, i, o: jax.random.normal(k, (i, o)) * np.sqrt(2.0 / (i + o))
            params[f"b{b}_wq"] = glorot(next(ks), d, d)
            params[f"b{b}_wk"] = glorot(next(ks), d, d)
            params[f"b{b}_wv"] = glorot(next(ks), d, d)
            params[f"b{b}_wo"] = glorot(next(ks), d, d)
            params[f"b{b}_ffn1"] = glorot(next(ks), d, c.ffn_hidden)
            params[f"b{b}_ffn1_b"] = jnp.zeros((c.ffn_hidden,))
            params[f"b{b}_ffn2"] = glorot(next(ks), c.ffn_hidden, d)
            params[f"b{b}_ffn2_b"] = jnp.zeros((d,))
            for ln in ("ln1", "ln2"):
                params[f"b{b}_{ln}_scale"] = jnp.ones((d,))
                params[f"b{b}_{ln}_bias"] = jnp.zeros((d,))
        return params

    # --------------------------------------------------------------- encoder
    @staticmethod
    def _layer_norm(x, scale, bias, eps=1e-6):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    def encode(
        self,
        params: Params,
        seqs: jax.Array,  # (B, L) int32, PAD=0
        dropout_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """→ (B, L, d) hidden states; position t attends to ≤ t."""
        c = self.cfg
        d = c.embedding_dim
        compute_dtype = jnp.bfloat16 if c.bf16_compute else jnp.float32

        pad_mask = (seqs != 0)[:, :, None]  # (B, L, 1)
        x = params["item_emb"][seqs] * np.sqrt(d) + params["pos_emb"][None, :, :]
        x = jnp.where(pad_mask, x, 0.0).astype(compute_dtype)

        causal = jnp.tril(jnp.ones((c.max_len, c.max_len), bool))
        key_valid = (seqs != 0)[:, None, :]  # (B, 1, L)
        attn_mask = causal[None, :, :] & key_valid  # (B, L, L)

        drop_i = 0

        def dropout(t):
            nonlocal drop_i
            if dropout_key is None or c.dropout_rate == 0.0:
                return t
            drop_i += 1
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_key, drop_i), 1.0 - c.dropout_rate, t.shape
            )
            return jnp.where(keep, t / (1.0 - c.dropout_rate), 0.0).astype(t.dtype)

        x = dropout(x)
        H = c.num_heads
        hd = d // H
        for b in range(c.num_blocks):
            h = self._layer_norm(
                x, params[f"b{b}_ln1_scale"], params[f"b{b}_ln1_bias"]
            ).astype(compute_dtype)
            q = (h @ params[f"b{b}_wq"].astype(compute_dtype)).reshape(-1, c.max_len, H, hd)
            k = (h @ params[f"b{b}_wk"].astype(compute_dtype)).reshape(-1, c.max_len, H, hd)
            v = (h @ params[f"b{b}_wv"].astype(compute_dtype)).reshape(-1, c.max_len, H, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            logits = logits / np.sqrt(hd)
            logits = jnp.where(attn_mask[:, None, :, :], logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
            attn = attn.reshape(-1, c.max_len, d).astype(compute_dtype)
            x = x + dropout(attn @ params[f"b{b}_wo"].astype(compute_dtype))

            h = self._layer_norm(
                x, params[f"b{b}_ln2_scale"], params[f"b{b}_ln2_bias"]
            ).astype(compute_dtype)
            ffn = jax.nn.relu(
                h @ params[f"b{b}_ffn1"].astype(compute_dtype)
                + params[f"b{b}_ffn1_b"].astype(compute_dtype)
            )
            ffn = ffn @ params[f"b{b}_ffn2"].astype(compute_dtype) + params[
                f"b{b}_ffn2_b"
            ].astype(compute_dtype)
            x = x + dropout(ffn)
            x = jnp.where(pad_mask, x, 0.0)

        x = self._layer_norm(
            x.astype(jnp.float32), params["ln_f_scale"], params["ln_f_bias"]
        )
        return x

    # ------------------------------------------------------------------ loss
    def next_item_bpr_loss(
        self,
        params: Params,
        seqs: jax.Array,  # (B, L) history
        pos: jax.Array,  # (B, L) next-item targets per position (PAD=0 where invalid)
        neg: jax.Array,  # (B, L) sampled negatives
        dropout_key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        h = self.encode(params, seqs, dropout_key)  # (B, L, d)
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
        """(B, d) final-position hidden state (the next-item query)."""
        h = self.encode(params, seqs)
        return h[:, -1, :]

    def score_catalog(self, params: Params, seqs: jax.Array) -> jax.Array:
        """(B, m_items) full-catalog scores over REAL item ids (0-based,
        PAD row dropped) — plugs into the shared masked top-k eval.
        Slices exactly m_items rows so a row-padded table (mesh trainer
        pads item_emb to the model-axis multiple) scores identically."""
        q = self.user_representations(params, seqs)
        return jnp.dot(
            q,
            params["item_emb"][1 : self.cfg.m_items + 1].T,
            preferred_element_type=jnp.float32,
        )


def make_training_arrays(
    train_seqs: np.ndarray, m_items: int, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(input, pos, neg) arrays for next-item BPR: input = seq shifted
    right by one position; pos = the original sequence; negatives uniform
    over real ids (collision with the positive at a position is possible
    but rare — standard SASRec practice)."""
    inp = np.zeros_like(train_seqs)
    inp[:, 1:] = train_seqs[:, :-1]
    pos = train_seqs.copy()
    neg = rng.integers(1, m_items + 1, train_seqs.shape).astype(np.int32)
    neg = np.where(pos == 0, 0, neg)
    return inp, pos, neg
