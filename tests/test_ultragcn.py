"""UltraGCN tests: constraint-weight math vs a dense numpy oracle, the
loss contract (needs a key, both negative-sharing modes), end-to-end tiny
training above chance, and the disk cache for the item–item top-K."""

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
from gsrs_tpu.models.ultragcn import UltraGCN, build_ii_constraint, real_edges
from gsrs_tpu.train.trainer import Trainer


def _cfg(**kw):
    return ModelConfig(model="ultragcn", embedding_dim=8, **kw)


def test_real_edges_strips_padding(tiny_data):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    u, i = real_edges(g)
    got = set(zip(u.tolist(), i.tolist()))
    want = set(zip(tiny_data.train_users.tolist(), tiny_data.train_items.tolist()))
    assert got == want


def test_ii_constraint_matches_dense_oracle(tiny_data):
    """Blockwise top-K against the dense ω = β_row·G·β_col formula."""
    g = build_graph(tiny_data, edge_pad_multiple=64)
    k = 4
    nbrs, w = build_ii_constraint(g, k, block=7)  # odd block: exercise edges
    n, m = tiny_data.n_users, tiny_data.m_items
    R = np.zeros((n, m))
    R[tiny_data.train_users, tiny_data.train_items] = 1.0
    G = R.T @ R
    gsum = G.sum(axis=1)
    beta_row = np.where(gsum > 0, np.sqrt(gsum + 1) / np.maximum(gsum, 1e-12), 0)
    beta_col = 1.0 / np.sqrt(gsum + 1)
    omega = beta_row[:, None] * G * beta_col[None, :]
    for i in range(m):
        row = omega[i]
        nz = np.flatnonzero(G[i])
        kk = min(k, nz.size)
        top_w = np.sort(row[nz])[::-1][:kk]
        np.testing.assert_allclose(np.sort(w[i][:kk])[::-1], top_w, rtol=1e-5)
        assert np.all(w[i][kk:] == 0)
        # returned neighbor weights must equal omega at those indices
        np.testing.assert_allclose(
            w[i][:kk], omega[i][nbrs[i][:kk]], rtol=1e-5
        )


def test_ii_constraint_cache_roundtrip(tiny_data, tmp_path):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    n1, w1 = build_ii_constraint(g, 3, cache_dir=str(tmp_path))
    assert (tmp_path / "ultragcn_ii_cache.npz").exists()
    n2, w2 = build_ii_constraint(g, 3, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(w1, w2)
    # different K must miss the cache, not return stale shapes
    n3, _ = build_ii_constraint(g, 5, cache_dir=str(tmp_path))
    assert n3.shape == (tiny_data.m_items, 5)


def test_edge_uniform_pair_sampler(tiny_data):
    """Pairs must be real interactions, visited ∝ user degree."""
    from gsrs_tpu.ops.sampling import make_sampler_state, sample_pairs_by_edge

    state = make_sampler_state(tiny_data)
    S = 20000
    u, p = jax.jit(sample_pairs_by_edge, static_argnums=2)(
        jax.random.key(0), state, S
    )
    u, p = np.asarray(u), np.asarray(p)
    net = tiny_data.user_item_net
    assert all(net[uu, pp] for uu, pp in zip(u[:500], p[:500]))
    counts = np.bincount(u, minlength=tiny_data.n_users)
    expect = tiny_data.user_degrees / tiny_data.user_degrees.sum() * S
    # chi-square-ish sanity: observed within 4σ of the multinomial mean
    sd = np.sqrt(np.maximum(expect, 1))
    assert np.all(np.abs(counts - expect) < 4 * sd + 10)


def test_loss_requires_step_key(tiny_data):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = UltraGCN(_cfg(), g)
    params = model.init_params(jax.random.key(0))
    u = jnp.array([0, 1])
    with pytest.raises(ValueError, match="PRNG key"):
        model.bpr_loss(params, u, u, u)


def test_pool_estimator_expectation_matches_full(tiny_data):
    """'pool' draws per-example distinct subsets from a shared uniform
    pool — in expectation (over keys) its negative term equals the 'full'
    closed form (mean over the whole catalog), like 'none' does."""
    import dataclasses as dc

    g = build_graph(tiny_data, edge_pad_multiple=64)
    cfg = _cfg(ug_neg_num=32, ug_neg_sharing="pool", ug_neg_pool=256,
               ug_lambda=0.0)
    model = UltraGCN(cfg, g)
    params = model.init_params(jax.random.key(0))
    # non-trivial embeddings so scores vary
    params = {k: 50.0 * v for k, v in params.items()}
    users = jnp.array([0, 1, 2, 3])
    pos = jnp.array([1, 2, 3, 4])
    full_model = UltraGCN(dc.replace(cfg, ug_neg_sharing="full"), g)
    ref, _ = full_model.bpr_loss(
        params, users, pos, pos, dropout_key=jax.random.key(0)
    )
    f = jax.jit(
        lambda k: model.bpr_loss(params, users, pos, pos, dropout_key=k)[0]
    )
    n = 400
    acc = sum(float(f(jax.random.key(s))) for s in range(n)) / n
    np.testing.assert_allclose(acc, float(ref), rtol=0.05)


@pytest.mark.parametrize("sharing", ["none", "batch", "group", "full", "pool"])
def test_loss_finite_and_grads_flow(tiny_data, sharing):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = UltraGCN(
        _cfg(ug_neg_num=16, ug_neg_sharing=sharing, ug_neg_groups=2), g
    )
    params = model.init_params(jax.random.key(0))
    users = jnp.array([0, 1, 2, 3])
    pos = jnp.array([1, 2, 3, 4])

    def f(p):
        loss, aux = model.bpr_loss(
            p, users, pos, pos, dropout_key=jax.random.key(7)
        )
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"bpr", "ii", "reg"} <= set(aux)
    for name in ("user_emb", "item_emb"):
        assert np.isfinite(np.asarray(grads[name])).all()
        assert float(jnp.abs(grads[name]).sum()) > 0


def test_zero_layers_eval_surface(tiny_data):
    """Scoring must be the raw-table dot product (no propagation)."""
    g = build_graph(tiny_data, edge_pad_multiple=64)
    model = UltraGCN(_cfg(), g)
    params = model.init_params(jax.random.key(0))
    users = jnp.array([0, 3])
    scores = model.users_rating(params, users)
    expect = np.asarray(params["user_emb"])[np.asarray(users)] @ np.asarray(
        params["item_emb"]
    ).T
    np.testing.assert_allclose(np.asarray(scores), expect, atol=1e-6)


def test_ultragcn_trains_and_beats_chance(tmp_path):
    data = clustered(120, 160, n_clusters=4, seed=3)
    cfg = ExperimentConfig(
        model=ModelConfig(
            model="ultragcn",
            embedding_dim=16,
            ug_neg_num=64,
            ug_neg_weight=32.0,
            ug_lambda=1.0,
            ug_ii_k=8,
            ug_init_std=1e-2,
        ),
        train=TrainConfig(
            batch_size=256, lr=5e-2, decay=1e-6,
            checkpoint_dir=str(tmp_path), tensorboard=False,
        ),
        eval=EvalConfig(test_batch=64, topks=(20,)),
    )
    graph = build_graph(data, edge_pad_multiple=512)
    from gsrs_tpu.models.registry import build_model

    model = build_model(cfg.model, graph)
    trainer = Trainer(cfg, data, graph, model)
    state = trainer.init_state()
    losses = []
    for _ in range(10):
        state, loss = trainer.train_epoch(state)
        losses.append(loss)
    assert losses[-1] < losses[0]
    metrics = trainer.evaluate(state)
    assert metrics["recall@20"] > 0.2, metrics


def test_sift_pos_matches_numpy_oracle(tiny_data):
    """'full' + ug_sift_pos must equal the dense numpy computation of the
    negative term averaged over each user's NON-positive items only."""
    from gsrs_tpu.models.ultragcn import TrainBitset
    from gsrs_tpu.ops.bitset import build_bitset

    g = build_graph(tiny_data, edge_pad_multiple=64)
    n, m = tiny_data.n_users, tiny_data.m_items
    cfg = _cfg(ug_neg_sharing="full", ug_sift_pos=True, ug_lambda=0.0)
    model = UltraGCN(cfg, g)
    params = model.init_params(jax.random.key(3))
    bitset = TrainBitset(
        jnp.asarray(
            build_bitset(tiny_data.train_users, tiny_data.train_items, n, m)
        )
    )
    users = jnp.array([0, 1, 5])
    pos = jnp.array([2, 3, 4])
    loss, aux = model.bpr_loss(
        params, users, pos, pos, dropout_key=jax.random.key(0), ell=bitset
    )

    # dense numpy oracle
    U = np.asarray(params["user_emb"])
    I = np.asarray(params["item_emb"])
    du = tiny_data.user_degrees.astype(np.float64)
    di = tiny_data.item_degrees.astype(np.float64)
    beta_u = np.sqrt(du + 1) / np.maximum(du, 1e-12)
    beta_i = 1.0 / np.sqrt(di + 1)
    R = np.zeros((n, m), dtype=bool)
    R[tiny_data.train_users, tiny_data.train_items] = True
    sp = lambda x: np.logaddexp(0.0, x)
    total = 0.0
    for b in range(3):
        u, p = int(users[b]), int(pos[b])
        s_pos = U[u] @ I[p]
        w_pos = cfg.ug_w1 + cfg.ug_w2 * beta_u[u] * beta_i[p]
        scores = U[u] @ I.T
        w = cfg.ug_w3 + cfg.ug_w4 * beta_u[u] * beta_i
        w = np.where(R[u], 0.0, w)
        neg = w @ sp(scores) / (m - R[u].sum())
        total += w_pos * sp(-s_pos) + cfg.ug_neg_weight * neg
    assert float(loss) == pytest.approx(total, rel=2e-5)


def test_pool_sift_pos_zeroes_positives(tiny_data):
    """'pool' + ug_sift_pos: pool entries that are the user's train
    positives must contribute zero weight and shrink that example's
    denominator — verified against a per-example numpy recomputation of
    the same pool and inclusion mask."""
    from gsrs_tpu.models.ultragcn import TrainBitset
    from gsrs_tpu.ops.bitset import build_bitset

    g = build_graph(tiny_data, edge_pad_multiple=64)
    n, m = tiny_data.n_users, tiny_data.m_items
    cfg = _cfg(ug_neg_sharing="pool", ug_neg_pool=64, ug_neg_num=32,
               ug_sift_pos=True, ug_lambda=0.0)
    model = UltraGCN(cfg, g)
    params = model.init_params(jax.random.key(3))
    bitset = TrainBitset(
        jnp.asarray(
            build_bitset(tiny_data.train_users, tiny_data.train_items, n, m)
        )
    )
    users = jnp.array([0, 1, 5])
    pos = jnp.array([2, 3, 4])
    key = jax.random.key(0)
    loss, _ = model.bpr_loss(params, users, pos, pos, dropout_key=key,
                             ell=bitset)
    # reproduce the pool + inclusion mask exactly as the estimator does
    k_pool, k_inc = jax.random.split(key)
    pool = np.asarray(jax.random.randint(k_pool, (64,), 0, m))
    include = np.asarray(jax.random.bernoulli(k_inc, 32 / 64, (3, 64)))
    U = np.asarray(params["user_emb"])
    I = np.asarray(params["item_emb"])
    du = tiny_data.user_degrees.astype(np.float64)
    di = tiny_data.item_degrees.astype(np.float64)
    beta_u = np.sqrt(du + 1) / np.maximum(du, 1e-12)
    beta_i = 1.0 / np.sqrt(di + 1)
    R = np.zeros((n, m), dtype=bool)
    R[tiny_data.train_users, tiny_data.train_items] = True
    sp = lambda x: np.logaddexp(0.0, x)
    total = 0.0
    for b in range(3):
        u, p = int(users[b]), int(pos[b])
        w_pos = cfg.ug_w1 + cfg.ug_w2 * beta_u[u] * beta_i[p]
        sel = include[b] & ~R[u][pool]
        w = (cfg.ug_w3 + cfg.ug_w4 * beta_u[u] * beta_i[pool]) * sel
        denom = max(sel.sum(), 1)
        neg = (w * sp(U[u] @ I[pool].T)).sum() / denom
        total += w_pos * sp(-U[u] @ I[p]) + cfg.ug_neg_weight * neg
    assert float(loss) == pytest.approx(total, rel=2e-5)


def test_sift_pos_validation(tiny_data):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    with pytest.raises(ValueError, match="sift_pos requires"):
        UltraGCN(_cfg(ug_neg_sharing="batch", ug_sift_pos=True), g)
    model = UltraGCN(_cfg(ug_neg_sharing="full", ug_sift_pos=True), g)
    params = model.init_params(jax.random.key(0))
    u = jnp.array([0, 1])
    with pytest.raises(ValueError, match="train bitset"):
        model.bpr_loss(params, u, u, u, dropout_key=jax.random.key(0))


def test_sift_pos_via_trainer(tmp_path):
    """Trainer must auto-wire the sampler bitset into model.ell and train."""
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.models.ultragcn import TrainBitset

    data = clustered(48, 64, n_clusters=4, seed=5)
    cfg = ExperimentConfig(
        model=ModelConfig(
            model="ultragcn", embedding_dim=8, ug_neg_sharing="full",
            ug_sift_pos=True, ug_ii_k=4,
        ),
        train=TrainConfig(
            batch_size=64, lr=1e-2, checkpoint_dir=str(tmp_path),
            tensorboard=False,
        ),
        eval=EvalConfig(test_batch=32),
    )
    graph = build_graph(data, edge_pad_multiple=256)
    model = build_model(cfg.model, graph)
    trainer = Trainer(cfg, data, graph, model, run_eval=False)
    assert isinstance(model.ell, TrainBitset)
    state = trainer.init_state()
    losses = []
    for _ in range(4):
        state, loss = trainer.train_epoch(state)
        losses.append(loss)
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_ultragcn_trainer_on_mesh_matches_single_device(tmp_path):
    """UltraGCN on a (2,4) mesh must match the single-device trainer's
    losses exactly (same keys → same edge-pair batches and in-loss
    negatives; GSPMD shards the gathers/matmuls, not the math)."""
    from gsrs_tpu.config import ParallelConfig
    from gsrs_tpu.models.registry import build_model

    data = clustered(64, 96, n_clusters=4, seed=2)

    def make(par, subdir):
        cfg = ExperimentConfig(
            model=ModelConfig(
                model="ultragcn", embedding_dim=8, ug_neg_num=32,
                ug_neg_sharing="batch", ug_ii_k=4,
            ),
            train=TrainConfig(
                batch_size=64, lr=1e-2, checkpoint_dir=str(tmp_path / subdir),
                tensorboard=False,
            ),
            eval=EvalConfig(test_batch=32),
            parallel=par,
        )
        graph = build_graph(data, edge_pad_multiple=256)
        model = build_model(cfg.model, graph)
        return Trainer(cfg, data, graph, model)

    t1 = make(ParallelConfig(), "single")
    t8 = make(ParallelConfig(data_axis=2, model_axis=4), "mesh")
    assert t8.mesh is not None
    s1, s8 = t1.init_state(), t8.init_state()
    for _ in range(3):
        s1, l1 = t1.train_epoch(s1)
        s8, l8 = t8.train_epoch(s8)
        np.testing.assert_allclose(l1, l8, rtol=1e-5)
    m1, m8 = t1.evaluate(s1), t8.evaluate(s8)
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], atol=1e-5)


def test_neg_sharing_modes_agree_in_expectation(tiny_data):
    """'batch' is an estimator of the same objective: with the negative
    set equal to the whole catalog both modes must coincide exactly."""
    g = build_graph(tiny_data, edge_pad_multiple=64)
    m = tiny_data.m_items
    users = jnp.array([0, 1, 2])
    pos = jnp.array([5, 6, 7])
    params = UltraGCN(_cfg(), g).init_params(jax.random.key(1))

    losses = {}
    for sharing in ("none", "batch", "group", "full"):
        model = UltraGCN(
            _cfg(
                ug_neg_num=m, ug_neg_sharing=sharing, ug_lambda=0.0,
                ug_neg_groups=3,
            ),
            g,
        )
        # monkeypatch the PRNG draw to the full catalog for both modes
        full = jnp.arange(m)
        orig = jax.random.randint
        try:
            jax.random.randint = lambda key, shape, lo, hi: jnp.broadcast_to(
                full, shape
            )
            loss, _ = model.bpr_loss(
                params, users, pos, pos, dropout_key=jax.random.key(0)
            )
        finally:
            jax.random.randint = orig
        losses[sharing] = float(loss)
    assert losses["none"] == pytest.approx(losses["batch"], rel=1e-5)
    assert losses["none"] == pytest.approx(losses["group"], rel=1e-5)
    # 'full' needs no monkeypatch at all: it IS the whole-catalog term
    assert losses["none"] == pytest.approx(losses["full"], rel=1e-5)
