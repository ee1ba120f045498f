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

from gsrs_tpu.models._transformer import encode_transformer, init_encoder_params

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
    # Fraction of sequences per batch trained as NEXT-ITEM samples: only
    # the final position is masked, all past context left clean — the
    # exact conditioning the retrieval query uses. Sun et al. 2019 §3.4
    # append such last-only samples precisely because random cloze almost
    # never shows the model the eval distribution (when the last position
    # happens to be masked, ~mask_prob of its context is corrupted too).
    # Round-2's 3× gap to SASRec on the planted-order benchmark traced to
    # this train/eval mismatch (VERDICT r2 item 3): the A/B sweep
    # (tools/diag_bert4rec.py, results/diag_bert4rec*.log) moved
    # recall@10 0.0708 → 0.2103 (last_only 0.6, 150 epochs — matching
    # GRU4Rec's 0.217). 0.5–0.7 are equivalent; 1.0 collapses (one
    # target/sequence/epoch starves training), 0.0 reproduces the gap.
    last_only_prob: float = 0.6
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
        return init_encoder_params(
            key,
            vocab_rows=c.m_items + 2,  # PAD + items + MASK
            max_len=c.max_len,
            d=c.embedding_dim,
            num_blocks=c.num_blocks,
            ffn_hidden=c.ffn_hidden,
        )

    # --------------------------------------------------------------- encoder
    def encode(
        self,
        params: Params,
        seqs: jax.Array,  # (B, L) int32; PAD=0, may contain MASK tokens
        dropout_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """→ (B, L, d) hidden states; every position attends to every
        non-PAD position (the bidirectional mask + GELU FFN are what
        distinguish this from SASRec — the encoder itself is the shared
        `models._transformer`)."""
        c = self.cfg
        attn_mask = (seqs != 0)[:, None, :]  # (B, 1, L): keys must be real
        return encode_transformer(
            params,
            seqs,
            attn_mask,
            max_len=c.max_len,
            num_blocks=c.num_blocks,
            num_heads=c.num_heads,
            dropout_rate=c.dropout_rate,
            bf16_compute=c.bf16_compute,
            activation=jax.nn.gelu,
            dropout_key=dropout_key,
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
        k_pos, k_last = jax.random.split(key)
        valid = seqs != 0
        masked = jax.random.bernoulli(k_pos, c.mask_prob, seqs.shape) & valid
        last = jnp.zeros_like(masked).at[:, -1].set(True) & valid
        # last-only next-item samples (see last_only_prob): these
        # sequences mask EXACTLY the final position with clean context
        last_only = jax.random.bernoulli(
            k_last, c.last_only_prob, (seqs.shape[0],)
        )
        masked = jnp.where(last_only[:, None], last, masked)
        none_masked = ~jnp.any(masked, axis=1)
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
