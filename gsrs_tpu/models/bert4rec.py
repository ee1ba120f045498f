"""BERT4Rec-style sequential recommender — TPU-native.

Third member of the sequential family (with `gsrs_tpu.models.sasrec` and
`gsrs_tpu.models.gru4rec`; the reference repo's name promises sequential
recommendation but ships no code for it, SURVEY.md §0). A bidirectional
transformer trained with a cloze (masked-item) objective in the style of
Sun et al. 2019, built to the family's TPU conventions:

- static (B, L) shapes; the cloze mask is sampled on-device from the
  step key inside the jitted train step (no host-side mask generation,
  no dynamic shapes — masked-position losses are weighted, not gathered)
- bidirectional attention restricted to non-PAD keys
- shares `gsrs_tpu.train.seq_trainer.SeqTrainer` unchanged: the trainer
  hands (inp, pos=full sequence, neg, key) to ``next_item_bpr_loss``;
  this model ignores ``inp`` (no causal shift in cloze training),
  re-masks ``pos`` internally, and scores masked positions pairwise
  against the provided negatives — the same BPR loss family as the rest
  of the framework
- retrieval: the last position is replaced by the [MASK] token and its
  hidden state queries the item table — the exact masked top-k eval path
  the family shares (`gsrs_tpu.ops.topk`)

Vocabulary: 0 = PAD, 1..m = items (shifted ids, as everywhere in the
sequence stack), m+1 = [MASK].
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class BERT4RecConfig:
    m_items: int  # real item count; table has m_items+2 rows (PAD, items, MASK)
    max_len: int = 50
    embedding_dim: int = 64
    num_blocks: int = 2
    num_heads: int = 1
    ffn_hidden: int = 64
    dropout_rate: float = 0.2
    mask_prob: float = 0.3
    bf16_compute: bool = False

    @property
    def mask_token(self) -> int:
        return self.m_items + 1


class BERT4Rec:
    def __init__(self, cfg: BERT4RecConfig):
        self.cfg = cfg

    # ------------------------------------------------------------------ init
    def init_params(self, key: jax.Array) -> Params:
        c = self.cfg
        d = c.embedding_dim
        ks = iter(jax.random.split(key, 4 + 8 * c.num_blocks))
        params: Params = {
            "item_emb": 0.1 * jax.random.normal(next(ks), (c.m_items + 2, d)),
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
        seqs: jax.Array,  # (B, L) int32; PAD=0, may contain MASK tokens
        dropout_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """→ (B, L, d) hidden states; every position attends to every
        non-PAD position (bidirectional — the defining difference from
        `gsrs_tpu.models.sasrec.SASRec.encode`)."""
        c = self.cfg
        d = c.embedding_dim
        compute_dtype = jnp.bfloat16 if c.bf16_compute else jnp.float32

        pad_mask = (seqs != 0)[:, :, None]
        x = params["item_emb"][seqs] * np.sqrt(d) + params["pos_emb"][None, :, :]
        x = jnp.where(pad_mask, x, 0.0).astype(compute_dtype)
        attn_mask = (seqs != 0)[:, None, :]  # (B, 1, L): keys must be real

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
            ffn = jax.nn.gelu(
                h @ params[f"b{b}_ffn1"].astype(compute_dtype)
                + params[f"b{b}_ffn1_b"].astype(compute_dtype)
            )
            ffn = ffn @ params[f"b{b}_ffn2"].astype(compute_dtype) + params[
                f"b{b}_ffn2_b"
            ].astype(compute_dtype)
            x = x + dropout(ffn)
            x = jnp.where(pad_mask, x, 0.0)

        return self._layer_norm(
            x.astype(jnp.float32), params["ln_f_scale"], params["ln_f_bias"]
        )

    # ------------------------------------------------------------------ cloze
    def cloze_mask(
        self, key: jax.Array, seqs: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Sample the cloze corruption on device: each real position is
        replaced by [MASK] w.p. ``mask_prob``; sequences where nothing got
        masked force-mask the final (most recent) position — which also
        keeps training distribution close to the eval query, where the
        final position is always [MASK]."""
        c = self.cfg
        valid = seqs != 0
        masked = jax.random.bernoulli(key, c.mask_prob, seqs.shape) & valid
        none_masked = ~jnp.any(masked, axis=1)
        last = jnp.zeros_like(masked).at[:, -1].set(True) & valid
        masked = masked | (none_masked[:, None] & last)
        corrupted = jnp.where(masked, c.mask_token, seqs)
        return corrupted, masked

    # ------------------------------------------------------------------ loss
    def next_item_bpr_loss(
        self,
        params: Params,
        seqs: jax.Array,  # ignored (the causal shift; cloze re-masks `pos`)
        pos: jax.Array,  # (B, L) the FULL sequence (SeqTrainer convention)
        neg: jax.Array,  # (B, L) uniform negatives
        dropout_key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        del seqs
        if dropout_key is None:
            # the cloze objective is stochastic by construction — a
            # fabricated fixed key would sample the identical corruption
            # every call and apply dropout on a path the family contract
            # defines as deterministic
            raise ValueError(
                "BERT4Rec.next_item_bpr_loss requires a PRNG key: the "
                "cloze corruption must be re-sampled per step (SeqTrainer "
                "always passes one)"
            )
        k_mask, k_drop = jax.random.split(dropout_key)
        corrupted, masked = self.cloze_mask(k_mask, pos)
        h = self.encode(
            params, corrupted, k_drop if self.cfg.dropout_rate > 0 else None
        )
        pe = params["item_emb"][pos]
        ne = params["item_emb"][neg]
        pos_scores = jnp.sum(h * pe, axis=-1)
        neg_scores = jnp.sum(h * ne, axis=-1)
        w = masked.astype(jnp.float32)
        bpr = -jnp.sum(
            jax.nn.log_sigmoid(pos_scores - neg_scores) * w
        ) / jnp.maximum(jnp.sum(w), 1.0)
        reg = 0.5 * (jnp.sum(pe * pe) + jnp.sum(ne * ne)) / pos.shape[0]
        return bpr, {"bpr": bpr, "reg": reg}

    # ------------------------------------------------------------- retrieval
    def user_representations(self, params: Params, seqs: jax.Array) -> jax.Array:
        """(B, d): shift the history left one slot, append [MASK], and use
        its hidden state as the next-item query (the BERT4Rec eval recipe)."""
        c = self.cfg
        query = jnp.concatenate(
            [
                seqs[:, 1:],
                jnp.full((seqs.shape[0], 1), c.mask_token, seqs.dtype),
            ],
            axis=1,
        )
        h = self.encode(params, query)
        return h[:, -1, :]

    def score_catalog(self, params: Params, seqs: jax.Array) -> jax.Array:
        """(B, m_items) full-catalog scores over REAL 0-based item ids
        (PAD and MASK rows dropped) — plugs into the shared masked top-k
        eval."""
        q = self.user_representations(params, seqs)
        return jnp.dot(
            q,
            params["item_emb"][1 : self.cfg.m_items + 1].T,
            preferred_element_type=jnp.float32,
        )
