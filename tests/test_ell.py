"""Golden tests for the scatter-free ELL SpMM (gsrs_tpu.ops.ell) vs the
dense reference-math oracle and the segment-sum path."""

import jax
import numpy as np

from gsrs_tpu.data.adjacency import (
    build_graph,
    dense_normalized_adjacency,
    normalized_edge_weights,
)
from gsrs_tpu.ops.ell import (
    build_ell_graph,
    ell_from_graph,
    ell_from_interactions,
    ell_propagate_layer,
)
from gsrs_tpu.ops.spmm import propagate_layer


def _ell(data):
    return ell_from_interactions(data)


def test_ell_forward_matches_dense(tiny_data, rng):
    ell = _ell(tiny_data)
    A = dense_normalized_adjacency(tiny_data)
    n = tiny_data.n_users
    u = rng.standard_normal((n, 8)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 8)).astype(np.float32)
    nu, ni = ell_propagate_layer(ell, u, i, None)
    expect = A @ np.concatenate([u, i])
    np.testing.assert_allclose(np.asarray(nu), expect[:n], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ni), expect[n:], atol=1e-5)


def test_ell_matches_segment_path(tiny_data, rng):
    """The two SpMM implementations must agree to float tolerance."""
    g = build_graph(tiny_data, edge_pad_multiple=64)
    ell = _ell(tiny_data)
    u = rng.standard_normal((tiny_data.n_users, 8)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 8)).astype(np.float32)
    seg_u, seg_i = propagate_layer(g, u, i)
    ell_u, ell_i = ell_propagate_layer(ell, u, i, None)
    np.testing.assert_allclose(np.asarray(ell_u), np.asarray(seg_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ell_i), np.asarray(seg_i), atol=1e-5)


def test_ell_custom_vjp_matches_dense(tiny_data, rng):
    ell = _ell(tiny_data)
    A = jax_dense = dense_normalized_adjacency(tiny_data).astype(np.float32)
    n = tiny_data.n_users
    u = rng.standard_normal((n, 4)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 4)).astype(np.float32)

    def loss_ell(u, i):
        nu, ni = ell_propagate_layer(ell, u, i, None)
        return (nu ** 2).sum() + (ni * 3).sum()

    import jax.numpy as jnp

    def loss_dense(u, i):
        y = jnp.asarray(A) @ jnp.concatenate([u, i])
        return (y[:n] ** 2).sum() + (y[n:] * 3).sum()

    g_ell = jax.grad(loss_ell, argnums=(0, 1))(u, i)
    g_dense = jax.grad(loss_dense, argnums=(0, 1))(u, i)
    np.testing.assert_allclose(np.asarray(g_ell[0]), np.asarray(g_dense[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_ell[1]), np.asarray(g_dense[1]), atol=2e-4)


def test_ell_from_graph_equals_from_interactions(tiny_data, rng):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    e1 = ell_from_graph(g)
    e2 = ell_from_interactions(tiny_data)
    u = rng.standard_normal((tiny_data.n_users, 4)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 4)).astype(np.float32)
    o1 = ell_propagate_layer(e1, u, i, None)
    o2 = ell_propagate_layer(e2, u, i, None)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1[1]), np.asarray(o2[1]), atol=1e-6)


def test_ell_edge_mask_consistency(tiny_data, rng):
    """A canonical-order edge mask must zero the same edges in both
    directions: masking edge e kills its contribution to new_u AND new_i."""
    ell = _ell(tiny_data)
    n_edges = tiny_data.train_size
    # drop everything except edge 0
    mask = np.zeros(n_edges, np.float32)
    mask[0] = 1.0
    u = rng.standard_normal((tiny_data.n_users, 4)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 4)).astype(np.float32)
    nu, ni = ell_propagate_layer(ell, u, i, mask)
    w = normalized_edge_weights(
        tiny_data.train_users,
        tiny_data.train_items,
        tiny_data.user_degrees,
        tiny_data.item_degrees,
    )
    u0, i0 = tiny_data.train_users[0], tiny_data.train_items[0]
    expect_u = np.zeros_like(u[:, :])
    expect_u[u0] = w[0] * i[i0]
    expect_i = np.zeros_like(i[:, :])
    expect_i[i0] = w[0] * u[u0]
    np.testing.assert_allclose(np.asarray(nu), expect_u, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ni), expect_i, atol=1e-6)


def test_ell_bucket_shapes_cover_all_edges(tiny_data):
    ell = _ell(tiny_data)
    w = normalized_edge_weights(
        tiny_data.train_users,
        tiny_data.train_items,
        tiny_data.user_degrees,
        tiny_data.item_degrees,
    )
    # BOTH directions must carry every edge exactly once (padding is
    # zero-weight, so total weight is the invariant)
    for side, n_rows in (
        (ell.by_user, tiny_data.n_users),
        (ell.by_item, tiny_data.m_items),
    ):
        assert side.assemble.shape == (n_rows,)
        total_w = sum(float(np.asarray(b.w).sum()) for b in side.buckets)
        np.testing.assert_allclose(total_w, w.sum(), rtol=1e-5)
