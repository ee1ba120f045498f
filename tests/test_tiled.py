"""Tiled SpMM (per-row-group hub blocks + residual ELL, ops/tiled.py):
must be numerically equivalent to the pure-ELL formulation in the
forward pass and the scatter-free custom VJP, with hashdrop agreeing
across the dense/residual split and both directions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsrs_tpu.data.adjacency import build_graph
from gsrs_tpu.data.synthetic import clustered
from gsrs_tpu.ops.ell import ell_from_interactions, ell_propagate_layer
from gsrs_tpu.ops.tiled import tiled_from_interactions, tiled_propagate_layer


@pytest.fixture(scope="module")
def setup():
    data = clustered(64, 96, n_clusters=4, seed=3)
    graph = build_graph(data, edge_pad_multiple=256)
    return data, graph


@pytest.mark.parametrize("groups,cols", [(1, 8), (4, 16), (8, 96), (4, 8192)])
def test_tiled_layer_matches_ell(setup, groups, cols):
    data, _ = setup
    ell = ell_from_interactions(data)
    tg = tiled_from_interactions(data, groups=groups, cols=cols)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))
    ref_u, ref_i = ell_propagate_layer(ell, u, x, None)
    got_u, got_i = tiled_propagate_layer(tg, u, x)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i), atol=1e-5)


def test_tiled_every_edge_exactly_once(setup):
    """Dense + residual partition the edge set: total weight mass agrees
    with the ELL layout (no edge dropped or double-counted)."""
    data, _ = setup
    tg = tiled_from_interactions(data, groups=4, cols=16)
    d = tg.user_from_item
    dense_sum = float(np.asarray(d.dense, np.float64).sum())
    res_sum = float(
        sum(np.asarray(b.w, np.float64).sum()
            for b in d.residual.by_user.buckets)
    )
    from gsrs_tpu.data.adjacency import normalized_edge_weights

    w = normalized_edge_weights(
        data.train_users, data.train_items,
        data.user_degrees, data.item_degrees,
    )
    np.testing.assert_allclose(dense_sum + res_sum, w.sum(), rtol=1e-6)
    assert dense_sum > 0 and res_sum >= 0


def test_tiled_vjp_matches_ell(setup):
    data, _ = setup
    ell = ell_from_interactions(data)
    tg = tiled_from_interactions(data, groups=4, cols=24)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))

    def loss_ell(uu, xx):
        nu, ni = ell_propagate_layer(ell, uu, xx, None)
        return jnp.sum(nu * nu) + jnp.sum(jnp.sin(ni))

    def loss_tiled(uu, xx):
        nu, ni = tiled_propagate_layer(tg, uu, xx)
        return jnp.sum(nu * nu) + jnp.sum(jnp.sin(ni))

    gu_ref, gx_ref = jax.grad(loss_ell, argnums=(0, 1))(u, x)
    gu, gx = jax.grad(loss_tiled, argnums=(0, 1))(u, x)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)


def test_tiled_hashdrop_matches_ell_hashdrop(setup):
    """The stateless hash mask drops the SAME canonical edges in the
    grouped dense cells, the residual slots, and the ELL reference."""
    from gsrs_tpu.ops.hashdrop import hashdrop_from_key

    data, _ = setup
    ell = ell_from_interactions(data)
    tg = tiled_from_interactions(data, groups=4, cols=24)
    drop = hashdrop_from_key(jax.random.key(5), keep_prob=0.7)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))

    # ELL reference with the same hash mask
    from gsrs_tpu.ops.ell import _apply_side as ell_apply

    ref_u = ell_apply(ell.by_user, x, None, drop, True)
    ref_i = ell_apply(ell.by_item, u, None, drop, False)
    got_u, got_i = tiled_propagate_layer(tg, u, x, drop)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i), atol=1e-5)

    # and the VJP under dropout agrees too
    def loss_ell(uu, xx):
        nu = ell_apply(ell.by_user, xx, None, drop, True)
        ni = ell_apply(ell.by_item, uu, None, drop, False)
        return jnp.sum(nu * nu) + jnp.sum(jnp.sin(ni))

    def loss_tiled(uu, xx):
        nu, ni = tiled_propagate_layer(tg, uu, xx, drop)
        return jnp.sum(nu * nu) + jnp.sum(jnp.sin(ni))

    gu_ref, gx_ref = jax.grad(loss_ell, argnums=(0, 1))(u, x)
    gu, gx = jax.grad(loss_tiled, argnums=(0, 1))(u, x)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)


def test_tiled_build_deterministic(setup):
    data, _ = setup
    a = tiled_from_interactions(data, groups=4, cols=16, seed=7)
    b = tiled_from_interactions(data, groups=4, cols=16, seed=7)
    np.testing.assert_array_equal(np.asarray(a.user_from_item.dense),
                                  np.asarray(b.user_from_item.dense))
    np.testing.assert_array_equal(np.asarray(a.user_from_item.top_src),
                                  np.asarray(b.user_from_item.top_src))
    np.testing.assert_array_equal(np.asarray(a.item_from_user.order_dst),
                                  np.asarray(b.item_from_user.order_dst))


def test_tiled_train_step_matches_ell(setup):
    """End-to-end: one optimizer step through the model must agree between
    spmm_mode='tiled' and 'ell' (same init, same batch)."""
    import dataclasses as dc

    import optax

    from gsrs_tpu.config import ModelConfig, TrainConfig
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.train.optim import make_optimizer

    data, graph = setup
    cfg_ell = ModelConfig(num_layers=2, embedding_dim=8)
    cfg_t = dc.replace(cfg_ell, spmm_mode="tiled", tiled_groups=4,
                       tiled_cols=16)
    m_ell = build_model(cfg_ell, graph, ell=ell_from_interactions(data))
    m_t = build_model(
        cfg_t, graph, ell=tiled_from_interactions(data, groups=4, cols=16)
    )
    params = m_ell.init_params(jax.random.key(0))
    optimizer, _ = make_optimizer(TrainConfig(lr=1e-2), steps_per_epoch=1)
    rng = np.random.default_rng(9)
    users = jnp.asarray(rng.integers(0, data.n_users, 64, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, data.m_items, 64, dtype=np.int32))
    neg = jnp.asarray(rng.integers(0, data.m_items, 64, dtype=np.int32))

    def one_step(model, p):
        def loss_fn(pp):
            loss, aux = model.bpr_loss(pp, users, pos, neg)
            return loss + 1e-4 * aux["reg"], aux

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        upd, _ = optimizer.update(grads, optimizer.init(p), p)
        return optax.apply_updates(p, upd), float(loss)

    p_ref, l_ref = one_step(m_ell, params)
    p_t, l_t = one_step(m_t, params)
    np.testing.assert_allclose(l_t, l_ref, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p_t["user_emb"]), np.asarray(p_ref["user_emb"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_t["item_emb"]), np.asarray(p_ref["item_emb"]), atol=1e-5
    )


def test_tiled_hbm_guard(setup):
    """The tiled builder shares hybrid's HBM guard: an oversized C clamps
    with a warning instead of OOMing."""
    data, _ = setup
    with pytest.warns(UserWarning, match="clamping to C="):
        g = tiled_from_interactions(
            data, groups=2, cols=8192, hbm_budget_gb=1e-7
        )
    assert g.user_from_item.dense.shape[1] == 0
    # and the degenerate C=0 graph still propagates correctly (all edges
    # in the residual)
    ell = ell_from_interactions(data)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))
    ref_u, ref_i = ell_propagate_layer(ell, u, x, None)
    got_u, got_i = tiled_propagate_layer(g, u, x)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i), atol=1e-5)
