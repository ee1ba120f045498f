"""Golden tests: normalized adjacency + bipartite SpMM vs the reference
math (dense scipy oracle reproducing code/dataloader.py:219-235 and
code/model.py:201-225)."""

import numpy as np
import pytest

from gsrs_tpu.data.adjacency import (
    build_graph,
    dense_normalized_adjacency,
    normalized_edge_weights,
)
from gsrs_tpu.ops.spmm import propagate_layer


def test_edge_weights_match_dense_normalization(tiny_data):
    A = dense_normalized_adjacency(tiny_data)  # (n+m, n+m)
    n = tiny_data.n_users
    w = normalized_edge_weights(
        tiny_data.train_users,
        tiny_data.train_items,
        tiny_data.user_degrees,
        tiny_data.item_degrees,
    )
    expect = A[tiny_data.train_users, n + tiny_data.train_items]
    np.testing.assert_allclose(w, expect, rtol=1e-6)


def test_propagate_layer_matches_dense(tiny_data, rng):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    n, m, d = tiny_data.n_users, tiny_data.m_items, 8
    u = rng.standard_normal((n, d)).astype(np.float32)
    i = rng.standard_normal((m, d)).astype(np.float32)
    A = dense_normalized_adjacency(tiny_data)
    dense_out = A @ np.concatenate([u, i], axis=0)
    new_u, new_i = propagate_layer(g, u, i)
    np.testing.assert_allclose(np.asarray(new_u), dense_out[:n], atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_i), dense_out[n:], atol=1e-5)


def test_zero_degree_rows_propagate_to_zero(rng):
    from tests.conftest import random_interactions

    data = random_interactions(rng, n_users=10, m_items=500, density=0.01)
    # items with zero degree must receive exactly zero from propagation
    g = build_graph(data, edge_pad_multiple=64)
    u = rng.standard_normal((data.n_users, 4)).astype(np.float32)
    i = rng.standard_normal((data.m_items, 4)).astype(np.float32)
    _, new_i = propagate_layer(g, u, i)
    cold = data.item_degrees == 0
    assert cold.any(), "test needs at least one zero-degree item"
    np.testing.assert_array_equal(np.asarray(new_i)[cold], 0.0)


def test_graph_cache_roundtrip(tmp_path, tiny_data):
    g1 = build_graph(tiny_data, edge_pad_multiple=64, cache_dir=str(tmp_path))
    assert (tmp_path / "norm_edges_cache.npz").exists()
    g2 = build_graph(tiny_data, edge_pad_multiple=64, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(g1.edge_w_by_u), np.asarray(g2.edge_w_by_u))
    np.testing.assert_array_equal(np.asarray(g1.edge_i_by_i), np.asarray(g2.edge_i_by_i))


def test_padding_contributes_nothing(tiny_data, rng):
    g_small = build_graph(tiny_data, edge_pad_multiple=1)
    g_big = build_graph(tiny_data, edge_pad_multiple=4096)
    assert g_big.padded_edges > g_small.padded_edges
    u = rng.standard_normal((tiny_data.n_users, 4)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 4)).astype(np.float32)
    a = propagate_layer(g_small, u, i)
    b = propagate_layer(g_big, u, i)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)
