"""XSimGCL tests: the noiseless path must equal LightGCN exactly (the
eval-path invariant), the contrastive term must be active during
training, and the model must train end-to-end through the Trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsrs_tpu.config import (
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from gsrs_tpu.data.adjacency import build_graph
from gsrs_tpu.data.synthetic import clustered
from gsrs_tpu.models.lightgcn import LightGCN
from gsrs_tpu.models.xsimgcl import XSimGCL, info_nce
from gsrs_tpu.ops.ell import ell_from_interactions
from gsrs_tpu.train.trainer import Trainer


def test_noiseless_propagation_equals_lightgcn(tiny_data):
    cfg = ModelConfig(model="xsimgcl", num_layers=3, embedding_dim=8)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    ell = ell_from_interactions(tiny_data)
    xs = XSimGCL(cfg, g, ell=ell)
    lgn = LightGCN(ModelConfig(num_layers=3, embedding_dim=8), g, ell=ell)
    params = lgn.init_params(jax.random.key(0))
    au_x, ai_x = xs.propagate(params)  # no key → noiseless
    au_l, ai_l = lgn.propagate(params)
    np.testing.assert_array_equal(np.asarray(au_x), np.asarray(au_l))
    np.testing.assert_array_equal(np.asarray(ai_x), np.asarray(ai_l))


def test_info_nce_prefers_aligned_views():
    rng = np.random.default_rng(0)
    z = rng.standard_normal((32, 8)).astype(np.float32)
    aligned = float(info_nce(jnp.asarray(z), jnp.asarray(z * 1.1), 0.2))
    shuffled = float(
        info_nce(jnp.asarray(z), jnp.asarray(z[::-1].copy() * 1.1), 0.2)
    )
    assert aligned < shuffled


def test_cl_term_present_with_key(tiny_data):
    cfg = ModelConfig(model="xsimgcl", num_layers=2, embedding_dim=8)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = XSimGCL(cfg, g, ell=ell_from_interactions(tiny_data))
    params = model.init_params(jax.random.key(0))
    users = jnp.arange(16, dtype=jnp.int32) % tiny_data.n_users
    pos = jnp.arange(16, dtype=jnp.int32) % tiny_data.m_items
    neg = (pos + 5) % tiny_data.m_items
    loss_nk, aux_nk = model.bpr_loss(params, users, pos, neg)
    assert "cl" not in aux_nk
    loss_k, aux_k = model.bpr_loss(
        params, users, pos, neg, jax.random.key(1)
    )
    assert "cl" in aux_k and np.isfinite(float(aux_k["cl"]))
    assert float(loss_k) != pytest.approx(float(loss_nk))


def test_xsimgcl_trains_and_beats_chance(tmp_path):
    data = clustered(120, 160, n_clusters=4, seed=3)
    cfg = ExperimentConfig(
        model=ModelConfig(
            model="xsimgcl", num_layers=2, embedding_dim=16, cl_lambda=0.1
        ),
        train=TrainConfig(
            batch_size=512, lr=5e-2, checkpoint_dir=str(tmp_path),
            tensorboard=False,
        ),
        eval=EvalConfig(test_batch=64, topks=(20,)),
    )
    graph = build_graph(data, edge_pad_multiple=512)
    from gsrs_tpu.models.registry import build_model

    model = build_model(cfg.model, graph, ell=ell_from_interactions(data))
    trainer = Trainer(cfg, data, graph, model)
    state = trainer.init_state()
    losses = []
    for _ in range(8):
        state, loss = trainer.train_epoch(state)
        losses.append(loss)
    assert losses[-1] < losses[0]
    metrics = trainer.evaluate(state)
    assert metrics["recall@20"] > 0.2, metrics


def test_xsimgcl_applies_i2i_smoothing(tiny_data):
    """Regression: --use_item_item must not be a silent no-op on xsimgcl."""
    import scipy.sparse as sp

    from gsrs_tpu.data.i2i import build_item_item
    from gsrs_tpu.models.lightgcn import ItemItemGraph

    A = build_item_item(tiny_data, scheme="cooc", topk=3)
    g = build_graph(tiny_data, edge_pad_multiple=64)
    ell = ell_from_interactions(tiny_data)
    cfg = ModelConfig(
        model="xsimgcl", num_layers=2, embedding_dim=8,
        use_item_item=True, i2i_alpha=0.5,
    )
    with_i2i = XSimGCL(cfg, g, i2i=ItemItemGraph.from_scipy(A, 64), ell=ell)
    without = XSimGCL(
        ModelConfig(model="xsimgcl", num_layers=2, embedding_dim=8), g, ell=ell
    )
    params = without.init_params(jax.random.key(0))
    _, ai = with_i2i.propagate(params)
    _, ai0 = without.propagate(params)
    expect = np.asarray(ai0) + 0.5 * (A.toarray() @ np.asarray(ai0))
    np.testing.assert_allclose(np.asarray(ai), expect, atol=1e-5)


def test_info_nce_unique_ignores_duplicates():
    """A batch with duplicated ids must give the same CL loss as the
    deduplicated batch (the official torch.unique semantics)."""
    from gsrs_tpu.models.xsimgcl import info_nce_unique

    rng = np.random.default_rng(0)
    v1 = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)
    uniq = jnp.asarray([3, 7, 11, 15], jnp.int32)
    dup = jnp.asarray([3, 7, 7, 11, 3, 15, 15, 15], jnp.int32)
    a = float(info_nce_unique(uniq, v1, v2, 0.2))
    b = float(info_nce_unique(dup, v1, v2, 0.2))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    assert np.isfinite(a)
