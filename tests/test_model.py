"""Model-level golden tests: K-layer propagation + layer-mean readout and
BPR loss vs independent numpy oracles of the reference math
(code/model.py:162-183,201-225)."""

import dataclasses

import jax
import numpy as np

from gsrs_tpu.config import ModelConfig
from gsrs_tpu.data.adjacency import build_graph, dense_normalized_adjacency
from gsrs_tpu.models.lightgcn import LightGCN
from gsrs_tpu.models.mf import PureMF


def _dense_propagate(data, u, i, k):
    A = dense_normalized_adjacency(data)
    x = np.concatenate([u, i], axis=0)
    acc = x.copy()
    cur = x
    for _ in range(k):
        cur = A @ cur
        acc += cur
    out = acc / (k + 1)
    return out[: data.n_users], out[data.n_users :]


def test_propagation_layer_mean(tiny_data):
    cfg = ModelConfig(num_layers=3, embedding_dim=8)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = LightGCN(cfg, g)
    params = model.init_params(jax.random.key(0))
    au, ai = model.propagate(params)
    eu, ei = _dense_propagate(
        tiny_data, np.asarray(params["user_emb"]), np.asarray(params["item_emb"]), 3
    )
    np.testing.assert_allclose(np.asarray(au), eu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ai), ei, atol=1e-5)


def test_bpr_loss_matches_numpy_oracle(tiny_data, rng):
    cfg = ModelConfig(num_layers=2, embedding_dim=8)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = LightGCN(cfg, g)
    params = model.init_params(jax.random.key(1))
    B = 16
    users = rng.integers(0, tiny_data.n_users, B)
    pos = rng.integers(0, tiny_data.m_items, B)
    neg = rng.integers(0, tiny_data.m_items, B)

    loss, aux = model.bpr_loss(params, users, pos, neg)

    au, ai = _dense_propagate(
        tiny_data, np.asarray(params["user_emb"]), np.asarray(params["item_emb"]), 2
    )
    u, pe, ne = au[users], ai[pos], ai[neg]
    diff = np.sum(u * pe, 1) - np.sum(u * ne, 1)
    expect_bpr = -np.mean(np.log(1.0 / (1.0 + np.exp(-diff))))
    expect_reg = 0.5 * ((u ** 2).sum() + (pe ** 2).sum() + (ne ** 2).sum()) / B
    np.testing.assert_allclose(float(loss), expect_bpr, rtol=1e-5)
    np.testing.assert_allclose(float(aux["reg"]), expect_reg, rtol=1e-5)


def test_pop_gate_shapes_and_entropy(tiny_data):
    cfg = ModelConfig(num_layers=1, embedding_dim=8, use_pop_gate=True)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = LightGCN(cfg, g)
    params = model.init_params(jax.random.key(2))
    assert params["pop_w1"].shape == (1, cfg.pop_hidden)
    assert params["gate_w1"].shape == (16, cfg.gate_hidden)
    au, items, gate = model.final_embeddings(params)
    assert items.shape == (tiny_data.m_items, 8)
    assert gate.shape == (tiny_data.m_items,)
    assert bool(((np.asarray(gate) > 0) & (np.asarray(gate) < 1)).all())
    users = np.arange(4)
    loss, aux = model.bpr_loss(params, users, users, users + 1)
    assert "gate_entropy" in aux
    assert np.isfinite(float(loss))


def test_edge_dropout_expectation(tiny_data):
    """Inverted edge dropout preserves the propagation mean."""
    cfg = ModelConfig(num_layers=1, embedding_dim=4, dropout=True, keep_prob=0.7)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = LightGCN(cfg, g)
    params = model.init_params(jax.random.key(3))
    clean_u, _ = LightGCN(
        dataclasses.replace(cfg, dropout=False), g
    ).propagate(params)

    prop = jax.jit(lambda k: model.propagate(params, dropout_key=k)[0])
    keys = jax.random.split(jax.random.key(42), 200)
    acc = np.zeros_like(np.asarray(clean_u))
    for k in keys:
        acc += np.asarray(prop(k))
    acc /= len(keys)
    # loose statistical tolerance: mean over masks ≈ clean propagation
    np.testing.assert_allclose(acc, np.asarray(clean_u), atol=0.06)


def test_pure_mf_is_zero_layer(tiny_data):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = PureMF(ModelConfig(model="mf", num_layers=3, embedding_dim=8), g)
    assert model.cfg.num_layers == 0
    params = model.init_params(jax.random.key(0))
    au, ai = model.propagate(params)
    np.testing.assert_allclose(np.asarray(au), np.asarray(params["user_emb"]))


def test_i2i_fusion(tiny_data, rng):
    import scipy.sparse as sp

    from gsrs_tpu.models.lightgcn import ItemItemGraph

    m = tiny_data.m_items
    dense = (rng.random((m, m)) < 0.05).astype(np.float32)
    i2i_mat = sp.csr_matrix(dense)
    cfg = ModelConfig(num_layers=1, embedding_dim=4, use_item_item=True, i2i_alpha=0.3)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = LightGCN(cfg, g, i2i=ItemItemGraph.from_scipy(i2i_mat, edge_pad_multiple=64))
    params = model.init_params(jax.random.key(5))
    _, ai = model.propagate(params)

    base = LightGCN(dataclasses.replace(cfg, use_item_item=False), g)
    _, ai_base = base.propagate(params)
    expect = np.asarray(ai_base) + 0.3 * (dense @ np.asarray(ai_base))
    np.testing.assert_allclose(np.asarray(ai), expect, atol=1e-5)


# --------------------------------------------------------------------- ngcf


def _dense_ngcf_propagate(data, params, k_layers):
    """Numpy oracle of the NGCF layer over the dense normalized adjacency."""
    A = dense_normalized_adjacency(data)
    n = data.n_users
    x = np.concatenate(
        [np.asarray(params["user_emb"]), np.asarray(params["item_emb"])], axis=0
    )

    def norm(v):
        return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-6)

    outs = [norm(x)]
    cur = x
    for k in range(k_layers):
        agg = A @ cur
        w1, w2 = np.asarray(params[f"ngcf_w1_{k}"]), np.asarray(params[f"ngcf_w2_{k}"])
        b1, b2 = np.asarray(params[f"ngcf_b1_{k}"]), np.asarray(params[f"ngcf_b2_{k}"])
        pre = (cur + agg) @ w1 + b1 + (agg * cur) @ w2 + b2
        cur = np.where(pre > 0, pre, 0.2 * pre)
        outs.append(norm(cur))
    out = np.concatenate(outs, axis=1)
    return out[:n], out[n:]


def test_ngcf_propagation_matches_dense_oracle(tiny_data):
    from gsrs_tpu.models.ngcf import NGCF

    cfg = ModelConfig(model="ngcf", num_layers=2, embedding_dim=8)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = NGCF(cfg, g)
    params = model.init_params(jax.random.key(0))
    au, ai = model.propagate(params)
    assert au.shape == (tiny_data.n_users, 8 * 3)
    eu, ei = _dense_ngcf_propagate(tiny_data, params, 2)
    np.testing.assert_allclose(np.asarray(au), eu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ai), ei, atol=1e-4)


def test_ngcf_trains_via_registry(tiny_data):
    import optax

    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions

    cfg = ModelConfig(model="ngcf", num_layers=2, embedding_dim=8)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = build_model(cfg, g, ell=ell_from_interactions(tiny_data))
    params = model.init_params(jax.random.key(0))
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    users = np.arange(16) % tiny_data.n_users
    pos = np.array([tiny_data.positives_of(u)[0] for u in users])
    neg = (pos + 7) % tiny_data.m_items

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            loss, aux = model.bpr_loss(p, users, pos, neg)
            return loss + 1e-4 * aux["reg"]

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


def test_reg_mode_ego_vs_propagated(tiny_data):
    """reg_mode='ego' regularizes raw table rows (upstream LightGCN
    convention); 'propagated' the post-propagation embeddings (the
    reference fork's committed math, code/model.py:125-134,173)."""
    import jax.numpy as jnp

    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions

    g = build_graph(tiny_data, edge_pad_multiple=64)
    ell = ell_from_interactions(tiny_data)
    cfg = ModelConfig(num_layers=2, embedding_dim=8)
    model = build_model(cfg, g, ell=ell)
    params = model.init_params(jax.random.key(0))
    users = jnp.array([0, 1, 2])
    pos = jnp.array([1, 2, 3])
    neg = jnp.array([4, 5, 6])

    _, aux_prop = model.bpr_loss(params, users, pos, neg)
    au, ai = model.propagate(params)
    expect_prop = 0.5 * (
        float(jnp.sum(au[users] ** 2))
        + float(jnp.sum(ai[pos] ** 2))
        + float(jnp.sum(ai[neg] ** 2))
    ) / 3
    np.testing.assert_allclose(float(aux_prop["reg"]), expect_prop, rtol=1e-5)

    ego_model = build_model(
        dataclasses.replace(cfg, reg_mode="ego"), g, ell=ell
    )
    _, aux_ego = ego_model.bpr_loss(params, users, pos, neg)
    expect_ego = 0.5 * (
        float(jnp.sum(params["user_emb"][users] ** 2))
        + float(jnp.sum(params["item_emb"][pos] ** 2))
        + float(jnp.sum(params["item_emb"][neg] ** 2))
    ) / 3
    np.testing.assert_allclose(float(aux_ego["reg"]), expect_ego, rtol=1e-5)
    # the BPR part is identical between modes
    np.testing.assert_allclose(
        float(aux_ego["bpr"]), float(aux_prop["bpr"]), rtol=1e-6
    )


def test_ngcf_reg_has_gradient(tiny_data):
    """NGCF pins reg_mode='ego': under 'propagated' the L2-normalized
    concat readout has constant row norms and the reg term would have
    zero gradient (silent no-op of --decay)."""
    import jax
    import jax.numpy as jnp

    from gsrs_tpu.config import ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.ops.ell import ell_from_interactions

    cfg = ModelConfig(model="ngcf", num_layers=2, embedding_dim=8)
    graph = build_graph(tiny_data, edge_pad_multiple=256)
    model = build_model(cfg, graph, ell=ell_from_interactions(tiny_data))
    assert model.cfg.reg_mode == "ego"
    params = model.init_params(jax.random.key(0))
    users = jnp.arange(8, dtype=jnp.int32)
    pos = jnp.arange(8, dtype=jnp.int32)
    neg = (jnp.arange(8, dtype=jnp.int32) + 9) % tiny_data.m_items

    def reg_only(p):
        _, aux = model.bpr_loss(p, users, pos, neg)
        return aux["reg"]

    g = jax.grad(reg_only)(params)
    assert float(jnp.abs(g["user_emb"]).sum()) > 0.0
    assert float(jnp.abs(g["item_emb"]).sum()) > 0.0
