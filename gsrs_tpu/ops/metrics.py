"""Vectorized ranking metrics.

Batch implementations of the reference's per-user numpy metric kernels
(reference code/utils.py:173-217) — identical math, but computed for a
whole user batch at once on device instead of a serial Python loop over
batches-of-one (reference code/Procedure.py:100-121,186-188).

Conventions (matching the reference exactly):
- ``labels`` r[b, j] = 1 iff the j-th ranked item of user b is a test
  positive (reference ``getLabel``, code/utils.py:212-217).
- recall@k  = Σ_j<k r / |GT|            (code/utils.py:173-184)
- precision@k = Σ_j<k r / k
- ndcg@k: DCG = Σ_j<k r_j / log2(j+2); IDCG = Σ_{j<min(k,|GT|)} 1/log2(j+2)
  with 0/0 → 0                           (code/utils.py:187-200)
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def topk_labels(
    topk_items: jax.Array,  # (B, K) int32 ranked item ids
    test_bitset: jax.Array,  # (n_users, W) uint32 packed test positives
    users: jax.Array,  # (B,) int32
) -> jax.Array:
    """(B, K) float32 hit labels via packed-bitset membership."""
    from gsrs_tpu.ops.bitset import bitset_lookup

    return bitset_lookup(test_bitset, users[:, None], topk_items).astype(jnp.float32)


def recall_precision_at_k(
    labels: jax.Array, gt_counts: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-user (recall@k, precision@k). gt_counts: (B,) number of test
    positives per user (>=1 for real test users)."""
    hits = jnp.sum(labels[:, :k], axis=1)
    recall = hits / jnp.maximum(gt_counts, 1)
    precision = hits / k
    return recall, precision


def ndcg_at_k(labels: jax.Array, gt_counts: jax.Array, k: int) -> jax.Array:
    """Per-user NDCG@k with the reference's ideal-DCG convention."""
    j = jnp.arange(k, dtype=jnp.float32)
    discounts = 1.0 / jnp.log2(j + 2.0)
    dcg = jnp.sum(labels[:, :k] * discounts[None, :], axis=1)
    # IDCG: first min(k, |GT|) slots all relevant
    ideal_len = jnp.minimum(gt_counts, k).astype(jnp.float32)
    idcg = jnp.sum(
        jnp.where(j[None, :] < ideal_len[:, None], discounts[None, :], 0.0), axis=1
    )
    return jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-12), 0.0)


def batch_metrics(
    labels: jax.Array,  # (B, K_max)
    gt_counts: jax.Array,  # (B,)
    user_weights: jax.Array,  # (B,) 1.0 for real users, 0.0 for padding
    topks: Sequence[int],
) -> Dict[str, jax.Array]:
    """Summed (not yet averaged) metrics for one user batch; divide by the
    total number of test users afterwards, matching the reference's
    mean-over-users aggregation (reference code/Procedure.py:191-192)."""
    out: Dict[str, jax.Array] = {}
    for k in topks:
        rec, prec = recall_precision_at_k(labels, gt_counts, k)
        nd = ndcg_at_k(labels, gt_counts, k)
        out[f"recall@{k}"] = jnp.sum(rec * user_weights)
        out[f"precision@{k}"] = jnp.sum(prec * user_weights)
        out[f"ndcg@{k}"] = jnp.sum(nd * user_weights)
    return out


def auc(scores: jax.Array, pos_mask: jax.Array) -> jax.Array:
    """AUC over the full catalog for one user: P(score_pos > score_neg)
    via the rank-sum identity — matches sklearn.roc_auc_score semantics
    used by the reference's (main-path-unused) AUC helper
    (reference code/utils.py:203-209). Ties get half credit.

    scores: (m,) float; pos_mask: (m,) bool.
    """
    m = scores.shape[0]
    order = jnp.argsort(scores)  # ascending
    # tie-averaged ranks: group equal scores into runs, give every member
    # the run's mean 1-based rank (sklearn's tie convention)
    sorted_scores = scores[order]
    new_run = jnp.concatenate(
        [
            jnp.ones(1, jnp.int32),
            (sorted_scores[1:] != sorted_scores[:-1]).astype(jnp.int32),
        ]
    )
    group_id = jnp.cumsum(new_run) - 1
    pos = jnp.arange(1, m + 1, dtype=jnp.float32)
    sums = jax.ops.segment_sum(pos, group_id, m)
    counts = jax.ops.segment_sum(jnp.ones(m), group_id, m)
    mean_rank_sorted = sums[group_id] / jnp.maximum(counts[group_id], 1)
    ranks = jnp.zeros(m).at[order].set(mean_rank_sorted)
    n_pos = jnp.sum(pos_mask)
    n_neg = m - n_pos
    rank_sum = jnp.sum(jnp.where(pos_mask, ranks, 0.0))
    return jnp.where(
        (n_pos > 0) & (n_neg > 0),
        (rank_sum - n_pos * (n_pos + 1) / 2.0) / jnp.maximum(n_pos * n_neg, 1),
        0.0,
    )
