"""Hybrid SpMM (dense hub blocks + residual ELL, ops/hybrid.py): must be
numerically equivalent to the pure-ELL / segment-sum formulations in both
the forward pass and the custom-VJP backward pass, end-to-end through the
model and the GSPMD distributed step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gsrs_tpu.config import ModelConfig, TrainConfig
from gsrs_tpu.data.adjacency import build_graph
from gsrs_tpu.data.synthetic import clustered
from gsrs_tpu.models.registry import build_model
from gsrs_tpu.ops.ell import ell_from_interactions, ell_propagate_layer
from gsrs_tpu.ops.hybrid import (
    HybridGraph,
    hybrid_from_interactions,
    hybrid_propagate_layer,
)
from gsrs_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def setup():
    data = clustered(64, 96, n_clusters=4, seed=3)
    graph = build_graph(data, edge_pad_multiple=256)
    return data, graph


@pytest.mark.parametrize("cols", [8, 32, 96, 8192])
def test_hybrid_layer_matches_ell(setup, cols):
    data, graph = setup
    ell = ell_from_interactions(data)
    hg = hybrid_from_interactions(data, cols=cols)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))
    ref_u, ref_i = ell_propagate_layer(ell, u, x, None)
    got_u, got_i = hybrid_propagate_layer(hg, u, x)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i), atol=1e-5)


def test_hybrid_vjp_matches_ell(setup):
    """The scatter-free custom VJP (transpose-ELL + dense-transpose
    matmul) must produce the same input gradients as the ELL custom VJP."""
    data, graph = setup
    ell = ell_from_interactions(data)
    hg = hybrid_from_interactions(data, cols=32)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))

    def f_ell(u, x):
        nu, ni = ell_propagate_layer(ell, u, x, None)
        return jnp.sum(nu**2) + jnp.sum(jnp.sin(ni))

    def f_hyb(u, x):
        nu, ni = hybrid_propagate_layer(hg, u, x)
        return jnp.sum(nu**2) + jnp.sum(jnp.sin(ni))

    gu_ref, gx_ref = jax.grad(f_ell, argnums=(0, 1))(u, x)
    gu, gx = jax.grad(f_hyb, argnums=(0, 1))(u, x)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4)


def test_hybrid_train_step_matches_ell(setup):
    """One full BPR optimizer step through the model must agree between
    spmm_mode='hybrid' and 'ell' (same init, same batch)."""
    data, graph = setup
    cfg_ell = ModelConfig(num_layers=3, embedding_dim=8, spmm_mode="ell")
    cfg_hyb = dataclasses.replace(cfg_ell, spmm_mode="hybrid", hybrid_cols=16)
    m_ell = build_model(cfg_ell, graph, ell=ell_from_interactions(data))
    m_hyb = build_model(
        cfg_hyb, graph, ell=hybrid_from_interactions(data, cols=16)
    )
    params = m_ell.init_params(jax.random.key(0))
    optimizer, _ = make_optimizer(TrainConfig(lr=1e-2), steps_per_epoch=1)
    rng = np.random.default_rng(2)
    users = jnp.asarray(rng.integers(0, data.n_users, 64, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, data.m_items, 64, dtype=np.int32))
    neg = jnp.asarray(rng.integers(0, data.m_items, 64, dtype=np.int32))

    def one_step(model, p):
        def loss_fn(p):
            loss, aux = model.bpr_loss(p, users, pos, neg)
            return loss + 1e-4 * aux["reg"]

        loss, grads = jax.value_and_grad(loss_fn)(p)
        opt_state = optimizer.init(p)
        updates, _ = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), float(loss)

    p_ell, l_ell = one_step(m_ell, params)
    p_hyb, l_hyb = one_step(m_hyb, params)
    np.testing.assert_allclose(l_hyb, l_ell, rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_hyb[k]), np.asarray(p_ell[k]), atol=1e-5, err_msg=k
        )


def test_hybrid_auto_derive_and_validation(setup):
    data, graph = setup
    cfg = ModelConfig(num_layers=2, embedding_dim=8, spmm_mode="hybrid",
                      hybrid_cols=16)
    model = build_model(cfg, graph)  # auto-derives the HybridGraph
    assert isinstance(model.ell, HybridGraph)


@pytest.mark.parametrize("cols", [8, 32])
def test_hybrid_hashdrop_matches_ell_hashdrop(setup, cols):
    """Stateless per-edge dropout: the SAME (key, keep_prob) must drop the
    same edge set whether an edge landed in the dense hub block or the
    residual ELL — so hybrid-with-hashdrop equals pure-ELL-with-hashdrop
    exactly, forward and backward (VERDICT r2 item 6)."""
    from gsrs_tpu.ops.hashdrop import hashdrop_from_key

    data, graph = setup
    ell = ell_from_interactions(data)
    hg = hybrid_from_interactions(data, cols=cols)
    drop = hashdrop_from_key(jax.random.key(11), 0.6)
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))
    ref_u, ref_i = ell_propagate_layer(ell, u, x, None, drop)
    got_u, got_i = hybrid_propagate_layer(hg, u, x, drop)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i), atol=1e-5)

    def f_ell(u, x):
        nu, ni = ell_propagate_layer(ell, u, x, None, drop)
        return jnp.sum(nu**2) + jnp.sum(jnp.sin(ni))

    def f_hyb(u, x):
        nu, ni = hybrid_propagate_layer(hg, u, x, drop)
        return jnp.sum(nu**2) + jnp.sum(jnp.sin(ni))

    gu_ref, gx_ref = jax.grad(f_ell, argnums=(0, 1))(u, x)
    gu, gx = jax.grad(f_hyb, argnums=(0, 1))(u, x)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(gu_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-4)


def test_hashdrop_expectation_and_rate(setup):
    """Inverted hash dropout preserves the propagation mean over keys, and
    the empirical keep rate tracks keep_prob."""
    from gsrs_tpu.ops.hashdrop import hash_keep, hashdrop_from_key

    data, graph = setup
    hg = hybrid_from_interactions(data, cols=16)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))
    base_u, _ = hybrid_propagate_layer(hg, u, x)
    acc = np.zeros_like(np.asarray(base_u))
    n = 300
    for s in range(n):
        drop = hashdrop_from_key(jax.random.key(s), 0.7)
        acc += np.asarray(hybrid_propagate_layer(hg, u, x, drop)[0])
    np.testing.assert_allclose(
        acc / n, np.asarray(base_u), atol=0.15 * float(np.abs(base_u).max())
    )
    # keep rate over a large (u, i) grid
    uu = jnp.arange(2000, dtype=jnp.int32)[:, None]
    ii = jnp.arange(500, dtype=jnp.int32)[None, :]
    m = np.asarray(hash_keep(uu, ii, hashdrop_from_key(jax.random.key(0), 0.7)))
    assert abs((m > 0).mean() - 0.7) < 0.01


def test_hybrid_model_dropout_end_to_end(setup):
    """spmm_mode='hybrid' + dropout trains: same key reproduces the loss,
    different keys differ, no-dropout differs from dropout."""
    data, graph = setup
    cfg = ModelConfig(
        num_layers=2, embedding_dim=8, spmm_mode="hybrid", hybrid_cols=16,
        dropout=True, keep_prob=0.6,
    )
    model = build_model(cfg, graph, ell=hybrid_from_interactions(data, cols=16))
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(6)
    users = jnp.asarray(rng.integers(0, data.n_users, 32, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, data.m_items, 32, dtype=np.int32))
    neg = jnp.asarray(rng.integers(0, data.m_items, 32, dtype=np.int32))
    l1, _ = model.bpr_loss(params, users, pos, neg, dropout_key=jax.random.key(1))
    l1b, _ = model.bpr_loss(params, users, pos, neg, dropout_key=jax.random.key(1))
    l2, _ = model.bpr_loss(params, users, pos, neg, dropout_key=jax.random.key(2))
    l0, _ = model.bpr_loss(params, users, pos, neg)
    assert float(l1) == float(l1b)
    assert float(l1) != float(l2)
    assert float(l1) != float(l0)


def test_hybrid_dense_residual_split_covers_all_edges(setup):
    """Every interaction appears exactly once across dense + residual of
    each direction (no edge lost, none double-counted)."""
    data, graph = setup
    hg = hybrid_from_interactions(data, cols=32)
    E = data.train_users.size
    for d in (hg.user_from_item, hg.item_from_user):
        n_dense = int((np.asarray(d.dense) != 0).sum())
        n_res = sum(
            int((np.asarray(b.w) != 0).sum())
            for b in d.residual.by_user.buckets
        )
        assert n_dense + n_res == E, (n_dense, n_res, E)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)
@pytest.mark.parametrize("mesh_shape", [(2, 4), (8, 1)])
def test_hybrid_gspmd_step_matches_single_device(setup, mesh_shape):
    from gsrs_tpu.parallel.dist_train import make_train_step
    from gsrs_tpu.parallel.mesh import make_mesh
    from gsrs_tpu.parallel.sharding import GraphShardings

    data, graph = setup
    cfg = ModelConfig(num_layers=2, embedding_dim=8, spmm_mode="hybrid",
                      hybrid_cols=16)
    hg = hybrid_from_interactions(data, cols=16)
    model = build_model(cfg, graph, ell=hg)
    params = model.init_params(jax.random.key(0))
    optimizer, _ = make_optimizer(TrainConfig(lr=1e-2), steps_per_epoch=1)
    rng = np.random.default_rng(4)
    users = jnp.asarray(rng.integers(0, data.n_users, 64, dtype=np.int32))
    pos = jnp.asarray(rng.integers(0, data.m_items, 64, dtype=np.int32))
    neg = jnp.asarray(rng.integers(0, data.m_items, 64, dtype=np.int32))

    def loss_fn(p):
        loss, aux = model.bpr_loss(p, users, pos, neg)
        return loss + 1e-4 * aux["reg"], aux

    opt_state0 = optimizer.init(params)
    (ref_loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, _ = optimizer.update(grads, opt_state0, params)
    ref_params = optax.apply_updates(params, updates)

    mesh = make_mesh(data_axis=mesh_shape[0], model_axis=mesh_shape[1])
    sh = GraphShardings(mesh)
    p_sharded = sh.place_params(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    )
    model_sh = build_model(cfg, sh.place_graph(graph), ell=sh.place_ell(hg))
    opt_state = optimizer.init(p_sharded)
    step = make_train_step(model_sh, optimizer, mesh, decay=1e-4)(
        p_sharded, opt_state
    )
    batch_s = sh.batch_spec()
    new_params, _, loss = step(
        p_sharded, opt_state, model_sh.graph, model_sh.ell,
        jax.device_put(users, batch_s),
        jax.device_put(pos, batch_s),
        jax.device_put(neg, batch_s),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["user_emb"]),
        np.asarray(ref_params["user_emb"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["item_emb"]),
        np.asarray(ref_params["item_emb"]),
        atol=1e-5,
    )


def test_hybrid_hbm_guard_clamps_with_warning(setup):
    """VERDICT r4 item 6: `--spmm hybrid` at a too-large shape must
    degrade gracefully (clamped hub count + warning), never OOM. With a
    tiny budget the clamp lands at C=0 — dense blocks empty — and the
    propagation must still equal pure ELL (all edges in the residual)."""
    from gsrs_tpu.ops.hybrid import resolve_hybrid_cols

    data, graph = setup
    # direct resolver math: 1 GiB budget, fp32, 1M+1M rows → 8192 cols
    # would need 64 GiB; largest fitting 128-multiple is 128·⌊…⌋
    with pytest.warns(UserWarning, match="clamping to C="):
        c = resolve_hybrid_cols(10**6, 10**6, 8192, np.float32, 1.0)
    assert c % 128 == 0 and 0 < c < 8192
    assert 2 * 10**6 * c * 4 <= 1.0 * 1024**3

    # end-to-end C=0 degenerate: budget too small for even 128 columns
    with pytest.warns(UserWarning, match="dense blocks disabled"):
        hg = hybrid_from_interactions(data, cols=8192, hbm_budget_gb=1e-7)
    assert hg.user_from_item.dense.shape[1] == 0
    ell = ell_from_interactions(data)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(data.n_users, 8)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(data.m_items, 8)).astype(np.float32))
    ref_u, ref_i = ell_propagate_layer(ell, u, x, None)
    got_u, got_i = hybrid_propagate_layer(hg, u, x)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i), atol=1e-5)
    # within budget: untouched, no warning
    assert resolve_hybrid_cols(1000, 1000, 512, np.float32, 1.0) == 512
