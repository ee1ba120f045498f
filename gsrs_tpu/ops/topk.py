"""Masked full-catalog top-k retrieval.

Replaces the reference's score-then-mask-then-topk eval inner loop
(reference code/Procedure.py:174-183): scores are a (B, m) matmul of user
embeddings against the item table, train positives are pushed to -inf via
the packed train bitset (the reference writes -(1<<10) into python-indexed
positions), and ranking uses `jax.lax.top_k`.

The sharded variant (catalog split over the `model` mesh axis) computes a
local top-k per shard and merges via all-gather — see
`gsrs_tpu.parallel.dist_train.make_eval_scores_fn` and the mesh-enabled
`gsrs_tpu.serve.Retriever`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gsrs_tpu.ops.bitset import bitset_row_mask

NEG_INF = jnp.float32(-1e9)


def score_users(
    user_emb: jax.Array,  # (B, d) final (propagated) user embeddings
    item_emb: jax.Array,  # (m, d) final item embeddings
) -> jax.Array:
    """Full-catalog raw dot-product scores U @ I^T, matching the
    reference's rating head exactly (no activation —
    reference code/model.py:114-123)."""
    return jnp.dot(user_emb, item_emb.T, preferred_element_type=jnp.float32)


def mask_train_positives(
    scores: jax.Array,  # (B, m)
    train_bitset_rows: jax.Array,  # (B, W) uint32 rows of the train bitset
    m_items: int,
) -> jax.Array:
    mask = bitset_row_mask(train_bitset_rows, m_items)
    return jnp.where(mask, NEG_INF, scores)


def topk_scores(
    scores: jax.Array, k: int, method: str = "exact", recall_target: float = 0.95
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise top-k with selectable implementation.

    - 'exact': `jax.lax.top_k` — sort-based on TPU, exact but slow for
      large catalogs (the reference's torch.topk equivalent,
      code/Procedure.py:183).
    - 'approx': `jax.lax.approx_max_k` — the TPU-native PartialReduce
      two-phase top-k. Orders of magnitude faster on wide catalogs;
      per-row recall of the true top-k ≥ recall_target in expectation.
    - 'threshold': exact threshold-select (`topk_threshold`) — exact
      always (batch falls back to lax.top_k in the pathological
      all-ties case). Chip-measured 8-20x SLOWER than 'exact': the
      candidate-extraction passes (cumsum + vmapped searchsorted) have
      no efficient TPU lowering (results/probe_topk_threshold.log).
      Kept as the recorded negative result, BENCH_NOTES round 5.
    """
    if method == "approx":
        return jax.lax.approx_max_k(
            scores, k, recall_target=recall_target, aggregate_to_topk=True
        )
    if method == "threshold":
        return topk_threshold(scores, k)
    return jax.lax.top_k(scores, k)


def _threshold_candidates(scores, t, c, k, cap):
    """Extract (up to cap) candidate columns with score >= t[row], in
    ascending column order, then exact-sort them. Correctness: when
    c[row] = count(score >= t) is in [k, cap], every true top-k element
    has value >= the true kth >= t, so all of them are candidates and the
    small sort is exact. Tie-break matches lax.top_k (lowest column
    first) because candidates arrive in ascending column order and
    lax.top_k is stable."""
    mask = (scores >= t[:, None]).astype(jnp.int32)
    csum = jnp.cumsum(mask, axis=1)  # (B, m)
    targets = jnp.arange(1, cap + 1, dtype=csum.dtype)  # ranks 1..cap
    cols = jax.vmap(
        lambda cs: jnp.searchsorted(cs, targets, side="left")
    )(csum)  # (B, cap) column of the j-th candidate
    valid = targets[None, :] <= c[:, None]
    cols = jnp.where(valid, cols, 0).astype(jnp.int32)
    cand = jnp.take_along_axis(scores, cols, axis=1)
    cand = jnp.where(valid, cand, -jnp.inf)
    vals, pos = jax.lax.top_k(cand, k)
    idx = jnp.take_along_axis(cols, pos, axis=1)
    return vals, idx


def topk_threshold(
    scores: jax.Array,  # (B, m) masked scores (train positives at NEG_INF)
    k: int,
    cap: int = 256,
    max_iters: int = 6,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k via threshold selection — the would-be
    bandwidth-bound alternative to sort-based `lax.top_k` for wide
    catalogs (VERDICT r4 item 2; same hot op as reference
    code/Procedure.py:183). CHIP VERDICT: REFUTED — 8-20x slower than
    lax.top_k (169 ms vs 8.6 ms at (2048, 40960),
    results/probe_topk_threshold.log): the count/bisection passes are
    cheap but step 3's extraction (cumsum + vmapped searchsorted) has
    no efficient TPU lowering. Kept exact and available as the recorded
    negative result; do not use for speed.

    lax.top_k on TPU costs ~15x the HBM floor at amazon-book scale
    (results/profile_eval_phases.log). This runs a few elementwise /
    reduction passes instead, intended to be at HBM speed:

    1. one fused stats pass (count/mean/var/max of the unmasked scores),
    2. a Gaussian-quantile threshold guess + count pass, refined by
       bisection only for rows whose candidate count is outside
       [min(k, finite), cap] (a wide band, so refinement is rare),
    3. one cumsum + vmapped-searchsorted pass extracting the <= cap
       candidates per row in column order, and an exact lax.top_k over
       the tiny (B, cap) candidate matrix.

    Exact by construction whenever the per-row candidate count lands in
    [k, cap]: all true top-k elements score >= the threshold. Rows that
    cannot land there (> cap ties at the kth value — pathological for
    matmul scores) fall back to full lax.top_k for the whole batch via
    lax.cond, so the result is exact ALWAYS, just slower on that batch.

    Degenerate rows (fewer than k unmasked scores) fill phantom slots
    with -inf values and column 0 — same post-masking contract the
    evaluator and server already handle."""
    B, m = scores.shape
    if k >= m or m <= max(1024, 2 * cap):
        return jax.lax.top_k(scores, k)
    cap = min(cap, m)
    floor_t = NEG_INF * 0.5  # above the mask value, below any real score

    finite = scores > floor_t
    x = jnp.where(finite, scores, 0.0)
    cnt = jnp.sum(finite, axis=1)
    mu = jnp.sum(x, axis=1) / jnp.maximum(cnt, 1)
    var = jnp.maximum(
        jnp.sum(x * x, axis=1) / jnp.maximum(cnt, 1) - mu * mu, 0.0
    )
    sigma = jnp.sqrt(var) + 1e-20
    rmax = jnp.max(scores, axis=1)

    need = jnp.minimum(cnt, k)  # rows with < k finite scores need them all
    # Gaussian guess at the (k+cap)/2-th largest; generous cap makes the
    # acceptance band ~an order of magnitude wide in tail probability
    from jax.scipy.special import ndtri

    q = jnp.clip((k + cap) / 2.0 / jnp.maximum(cnt, 1), 1e-9, 0.5)
    t0 = mu + ndtri(1.0 - q) * sigma
    # rows whose finite scores all fit in cap need no search at all
    t0 = jnp.where(cnt <= cap, floor_t, jnp.minimum(t0, rmax))
    t0 = jnp.maximum(t0, floor_t)

    def count_at(t):
        return jnp.sum(scores >= t[:, None], axis=1)

    def cond(state):
        it, _, _, _, ok = state
        return (it < max_iters) & ~jnp.all(ok)

    def body(state):
        it, lo, hi, t, ok = state
        c = count_at(t)
        good = (c >= need) & (c <= cap)
        ok = ok | good
        # bisection: too many candidates -> raise threshold, too few ->
        # lower it (count is monotone decreasing in t)
        lo = jnp.where(~ok & (c > cap), t, lo)
        hi = jnp.where(~ok & (c < need), t, hi)
        t = jnp.where(ok, t, 0.5 * (lo + hi))
        return it + 1, lo, hi, t, ok

    lo0 = jnp.full((B,), floor_t, scores.dtype)
    hi0 = rmax
    it, lo, hi, t, ok = jax.lax.while_loop(
        cond, body, (0, lo0, hi0, t0, jnp.zeros((B,), bool))
    )
    # final count at the settled thresholds (rows already ok keep theirs)
    c = count_at(t)
    ok = (c >= need) & (c <= cap)

    def threshold_path(_):
        return _threshold_candidates(scores, t, c, k, cap)

    def fallback_path(_):
        return tuple(jax.lax.top_k(scores, k))

    vals, idx = jax.lax.cond(
        jnp.all(ok), threshold_path, fallback_path, operand=None
    )
    return vals, idx


def masked_topk(
    user_emb: jax.Array,
    item_emb: jax.Array,
    train_bitset_rows: jax.Array,
    k: int,
    method: str = "exact",
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """→ (top scores (B,k), top item ids (B,k))."""
    scores = score_users(user_emb, item_emb)
    scores = mask_train_positives(scores, train_bitset_rows, item_emb.shape[0])
    return topk_scores(scores, k, method, recall_target)
