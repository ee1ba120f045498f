"""Threshold-select exact top-k (ops/topk.py::topk_threshold): must be
bit-identical to `lax.top_k` (values AND tie-broken indices) on every
non-degenerate row, across masking, ties, and adversarial shapes —
it replaces the hot op of reference code/Procedure.py:183 in the eval
and serving paths (VERDICT r4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrs_tpu.ops.topk import NEG_INF, topk_scores, topk_threshold


def _ref(scores, k):
    v, i = jax.lax.top_k(jnp.asarray(scores), k)
    return np.asarray(v), np.asarray(i)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("shape", [(33, 3000), (8, 5000), (128, 2100)])
def test_matches_lax_topk_random(seed, shape):
    rng = np.random.default_rng(seed)
    scores = rng.standard_normal(shape).astype(np.float32) * 3.0
    v, i = jax.jit(topk_threshold, static_argnums=1)(jnp.asarray(scores), 20)
    rv, ri = _ref(scores, 20)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_matches_with_neg_inf_mask():
    rng = np.random.default_rng(3)
    scores = rng.standard_normal((17, 4096)).astype(np.float32)
    # mask ~30% of entries the way mask_train_positives does
    mask = rng.random(scores.shape) < 0.3
    scores[mask] = float(NEG_INF)
    v, i = topk_threshold(jnp.asarray(scores), 10)
    rv, ri = _ref(scores, 10)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_exact_under_heavy_ties():
    """Quantized scores: many exact ties including at the kth value.
    Tie-break must match lax.top_k (lowest column first)."""
    rng = np.random.default_rng(4)
    scores = np.round(
        rng.standard_normal((9, 3000)) * 2
    ).astype(np.float32)  # ~13 distinct values
    v, i = topk_threshold(jnp.asarray(scores), 25)
    rv, ri = _ref(scores, 25)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_all_ties_falls_back_exact():
    """> cap ties at the kth value: no threshold can land in [k, cap];
    the batch must fall back to lax.top_k and stay exact."""
    scores = np.zeros((5, 3000), np.float32)
    scores[:, :7] = 1.0  # top-7 distinct, the rest all tie at 0
    v, i = topk_threshold(jnp.asarray(scores), 20)
    rv, ri = _ref(scores, 20)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_degenerate_rows_fill_phantom_slots():
    """Rows with fewer than k unmasked entries: the real candidates come
    out exactly, phantom slots carry -inf (below the NEG_INF sentinel
    threshold serve.recommend uses)."""
    rng = np.random.default_rng(5)
    scores = np.full((4, 3000), float(NEG_INF), np.float32)
    scores[0, [10, 500, 2999]] = [3.0, 2.0, 1.0]  # 3 finite < k=5
    scores[1] = rng.standard_normal(3000)  # normal row
    # rows 2,3 fully masked
    v, i = topk_threshold(jnp.asarray(scores), 5)
    v, i = np.asarray(v), np.asarray(i)
    np.testing.assert_allclose(v[0, :3], [3.0, 2.0, 1.0])
    np.testing.assert_array_equal(i[0, :3], [10, 500, 2999])
    assert (v[0, 3:] <= float(NEG_INF) / 2).all()
    assert (v[2:] <= float(NEG_INF) / 2).all()
    rv, ri = _ref(scores[1:2], 5)
    np.testing.assert_array_equal(v[1:2], rv)
    np.testing.assert_array_equal(i[1:2], ri)


def test_small_catalog_uses_direct_topk():
    rng = np.random.default_rng(6)
    scores = rng.standard_normal((7, 500)).astype(np.float32)
    v, i = topk_threshold(jnp.asarray(scores), 5)
    rv, ri = _ref(scores, 5)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_topk_scores_threshold_method():
    rng = np.random.default_rng(7)
    scores = rng.standard_normal((16, 4000)).astype(np.float32)
    v, i = topk_scores(jnp.asarray(scores), 20, method="threshold")
    rv, ri = _ref(scores, 20)
    np.testing.assert_array_equal(np.asarray(v), rv)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_shifted_and_scaled_distributions():
    """Gaussian guess robustness: wildly shifted / scaled / skewed score
    distributions must still converge inside the bisection budget (or
    fall back) — always exact."""
    rng = np.random.default_rng(8)
    for dist in (
        lambda: rng.standard_normal((11, 3000)) * 1e-4 + 50.0,
        lambda: rng.standard_normal((11, 3000)) * 1e4,
        lambda: rng.exponential(2.0, (11, 3000)) - 100.0,
        lambda: rng.pareto(3.0, (11, 3000)),
    ):
        scores = dist().astype(np.float32)
        v, i = topk_threshold(jnp.asarray(scores), 20)
        rv, ri = _ref(scores, 20)
        np.testing.assert_array_equal(np.asarray(v), rv)
        np.testing.assert_array_equal(np.asarray(i), ri)
