"""Metric-kernel golden tests vs an independent numpy transcription of the
reference formulas (reference code/utils.py:173-217)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsrs_tpu.ops.metrics import (
    auc,
    batch_metrics,
    ndcg_at_k,
    recall_precision_at_k,
    topk_labels,
)


def ref_recall_precision(r, gt_counts, k):
    """reference RecallPrecision_ATk (code/utils.py:173-184)."""
    right = r[:, :k].sum(1)
    recall = right / gt_counts
    precision = right.sum() / (k * len(r))
    return recall, precision


def ref_ndcg(r, gt_counts, k):
    """reference NDCGatK_r (code/utils.py:187-200)."""
    out = []
    for row, n_gt in zip(r, gt_counts):
        pred = row[:k]
        ideal = np.zeros(k)
        ideal[: min(int(n_gt), k)] = 1
        idcg = (ideal / np.log2(np.arange(2, k + 2))).sum()
        dcg = (pred / np.log2(np.arange(2, k + 2))).sum()
        out.append(0.0 if idcg == 0 else dcg / idcg)
    return np.asarray(out)


@pytest.fixture
def labels_fixture(rng):
    B, K = 64, 25
    labels = (rng.random((B, K)) < 0.3).astype(np.float32)
    gt_counts = rng.integers(1, 40, B).astype(np.float32)
    return labels, gt_counts


def test_recall_precision_match_reference(labels_fixture):
    labels, gt = labels_fixture
    for k in (5, 20):
        rec, prec = recall_precision_at_k(jnp.asarray(labels), jnp.asarray(gt), k)
        ref_rec, ref_prec_mean = ref_recall_precision(labels, gt, k)
        np.testing.assert_allclose(np.asarray(rec), ref_rec, rtol=1e-6)
        np.testing.assert_allclose(
            float(np.asarray(prec).mean()), ref_prec_mean, rtol=1e-6
        )


def test_ndcg_matches_reference(labels_fixture):
    labels, gt = labels_fixture
    for k in (5, 20):
        nd = ndcg_at_k(jnp.asarray(labels), jnp.asarray(gt), k)
        np.testing.assert_allclose(
            np.asarray(nd), ref_ndcg(labels, gt, k), rtol=1e-5
        )


def test_ndcg_zero_ground_truth_gives_zero():
    labels = np.ones((2, 5), np.float32)
    gt = np.array([0.0, 2.0])
    nd = np.asarray(ndcg_at_k(jnp.asarray(labels), jnp.asarray(gt), 5))
    assert nd[0] == 0.0 and nd[1] > 0.0


def test_batch_metrics_padding_users_excluded(labels_fixture):
    labels, gt = labels_fixture
    weights = np.ones(len(labels), np.float32)
    weights[10:] = 0.0
    sums = batch_metrics(
        jnp.asarray(labels), jnp.asarray(gt), jnp.asarray(weights), (20,)
    )
    rec, _ = recall_precision_at_k(jnp.asarray(labels[:10]), jnp.asarray(gt[:10]), 20)
    np.testing.assert_allclose(
        float(sums["recall@20"]), float(np.asarray(rec).sum()), rtol=1e-6
    )


def test_topk_labels_bitset(tiny_data, rng):
    from gsrs_tpu.ops.bitset import build_bitset

    te_u = np.concatenate(
        [np.full(len(v), k) for k, v in tiny_data.test_dict.items()]
    )
    te_i = np.concatenate(list(tiny_data.test_dict.values()))
    bs = jnp.asarray(
        build_bitset(te_u, te_i, tiny_data.n_users, tiny_data.m_items)
    )
    users = np.asarray(sorted(tiny_data.test_dict))[:8].astype(np.int32)
    topk = rng.integers(0, tiny_data.m_items, (8, 10)).astype(np.int32)
    # plant the true item at position 3 for each user
    for r, u in enumerate(users):
        topk[r, 3] = tiny_data.test_dict[int(u)][0]
    labels = np.asarray(topk_labels(jnp.asarray(topk), bs, jnp.asarray(users)))
    assert (labels[:, 3] == 1).all()


def test_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    m = 200
    scores = rng.standard_normal(m).astype(np.float32)
    pos = rng.random(m) < 0.2
    if pos.sum() == 0:
        pos[0] = True
    got = float(auc(jnp.asarray(scores), jnp.asarray(pos)))
    expect = roc_auc_score(pos.astype(int), scores)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_auc_with_ties(rng):
    from sklearn.metrics import roc_auc_score

    m = 100
    scores = rng.integers(0, 5, m).astype(np.float32)  # heavy ties
    pos = rng.random(m) < 0.3
    got = float(auc(jnp.asarray(scores), jnp.asarray(pos)))
    expect = roc_auc_score(pos.astype(int), scores)
    np.testing.assert_allclose(got, expect, rtol=1e-5)
