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

from gsrs_tpu.models._transformer import encode_transformer, init_encoder_params

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
        return init_encoder_params(
            key,
            vocab_rows=c.m_items + 1,  # PAD + items
            max_len=c.max_len,
            d=c.embedding_dim,
            num_blocks=c.num_blocks,
            ffn_hidden=c.ffn_hidden,
        )

    # --------------------------------------------------------------- encoder
    def encode(
        self,
        params: Params,
        seqs: jax.Array,  # (B, L) int32, PAD=0
        dropout_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """→ (B, L, d) hidden states; position t attends to ≤ t (the
        causal mask is what distinguishes this from BERT4Rec — the
        encoder itself is the shared `models._transformer`)."""
        c = self.cfg
        causal = jnp.tril(jnp.ones((c.max_len, c.max_len), bool))
        key_valid = (seqs != 0)[:, None, :]  # (B, 1, L)
        attn_mask = causal[None, :, :] & key_valid  # (B, L, L)
        return encode_transformer(
            params,
            seqs,
            attn_mask,
            max_len=c.max_len,
            num_blocks=c.num_blocks,
            num_heads=c.num_heads,
            dropout_rate=c.dropout_rate,
            bf16_compute=c.bf16_compute,
            activation=jax.nn.relu,
            dropout_key=dropout_key,
        )

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
