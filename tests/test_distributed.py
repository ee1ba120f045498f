"""Distributed-layer tests on the 8-device virtual CPU mesh: the sharded
train step must agree numerically with the single-device step, and the
sharded eval top-k with the unsharded one."""

import os
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
from gsrs_tpu.ops.bitset import build_bitset
from gsrs_tpu.ops.ell import ell_from_interactions
from gsrs_tpu.ops.sampling import make_sampler_state, sample_triplets
from gsrs_tpu.parallel.dist_train import make_eval_scores_fn, make_train_step
from gsrs_tpu.parallel.mesh import make_mesh
from gsrs_tpu.parallel.sharding import GraphShardings
from gsrs_tpu.train.optim import make_optimizer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


@pytest.fixture(scope="module")
def setup():
    data = clustered(64, 96, n_clusters=4, seed=1)
    graph = build_graph(data, edge_pad_multiple=256)
    model = build_model(
        ModelConfig(num_layers=2, embedding_dim=8),
        graph,
        ell=ell_from_interactions(data),
    )
    params = model.init_params(jax.random.key(0))
    optimizer, _ = make_optimizer(TrainConfig(lr=1e-2), steps_per_epoch=1)
    B = 64
    state = make_sampler_state(data)
    users, pos, neg = sample_triplets(jax.random.key(7), state, B)
    return data, graph, model, params, optimizer, (users, pos, neg)


def _single_device_step(model, optimizer, params, batch, decay=1e-4):
    users, pos, neg = batch

    def loss_fn(p):
        loss, aux = model.bpr_loss(p, users, pos, neg)
        return loss + decay * aux["reg"], aux

    opt_state = optimizer.init(params)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), float(loss)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_sharded_step_matches_single_device(setup, mesh_shape):
    data, graph, model, params, optimizer, batch = setup
    ref_params, ref_loss = _single_device_step(model, optimizer, params, batch)

    mesh = make_mesh(data_axis=mesh_shape[0], model_axis=mesh_shape[1])
    sh = GraphShardings(mesh)
    # copy before placing: device_put to a (partially) replicated sharding
    # can alias the source buffer, and the donated train step would delete
    # it out from under the shared fixture
    p_sharded = sh.place_params(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    )
    model_sh = build_model(model.cfg, sh.place_graph(graph), ell=sh.place_ell(model.ell))
    opt_state = optimizer.init(p_sharded)
    step = make_train_step(model_sh, optimizer, mesh, decay=1e-4)(
        p_sharded, opt_state
    )
    batch_s = sh.batch_spec()
    sharded_batch = tuple(jax.device_put(b, batch_s) for b in batch)
    new_params, _, loss = step(
        p_sharded, opt_state, model_sh.graph, model_sh.ell, *sharded_batch
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
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


def test_sharded_eval_topk_matches_unsharded(setup):
    from gsrs_tpu.ops.topk import masked_topk

    data, graph, model, params, _, _ = setup
    all_users, items, _ = model.final_embeddings(params)
    tb = jnp.asarray(
        build_bitset(data.train_users, data.train_items, data.n_users, data.m_items)
    )
    users = jnp.arange(32, dtype=jnp.int32)
    ref_scores, ref_items = masked_topk(all_users[users], items, tb[users], 10)

    mesh = make_mesh(data_axis=2, model_axis=4)
    sh = GraphShardings(mesh)
    eval_fn = make_eval_scores_fn(model, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    row_s = NamedSharding(mesh, P("model", None))
    got_scores, got_items = eval_fn(
        jax.device_put(all_users, row_s),
        jax.device_put(items, row_s),
        jax.device_put(users, sh.batch_spec()),
        jax.device_put(tb[users], sh.batch_spec()),
        10,
    )
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(ref_scores), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got_items), np.asarray(ref_items))


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.parametrize(
    "mesh_shape,spmm_mode",
    [
        ((2, 4), "ell"),
        ((4, 2), "ell"),
        ((1, 8), "ell"),
        ((8, 1), "ell"),
        ((2, 4), "segment"),
        ((4, 2), "segment"),
    ],
)
def test_shard_map_step_matches_single_device(setup, mesh_shape, spmm_mode):
    from gsrs_tpu.parallel.shard_map_train import make_shard_map_train_step

    data, graph, model, params, optimizer, batch = setup
    cfg = dataclasses.replace(model.cfg, spmm_mode=spmm_mode)
    base_model = build_model(cfg, graph, ell=model.ell)
    ref_params, ref_loss = _single_device_step(
        base_model, optimizer, params, batch
    )

    mesh = make_mesh(data_axis=mesh_shape[0], model_axis=mesh_shape[1])
    sh = GraphShardings(mesh)
    p_sharded = sh.place_params(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    )
    opt_state = optimizer.init(p_sharded)
    model_sh = build_model(cfg, graph, ell=model.ell)
    step = make_shard_map_train_step(model_sh, optimizer, mesh, decay=1e-4)(
        p_sharded, opt_state
    )
    batch_s = sh.batch_spec()
    sharded_batch = tuple(jax.device_put(b, batch_s) for b in batch)
    new_params, _, loss = step(p_sharded, opt_state, graph, *sharded_batch)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
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


def test_trainer_on_mesh_matches_single_device(tmp_path):
    """The full Trainer with a (2,4) mesh config must produce the same
    losses and eval metrics as the single-device trainer (same sampling
    keys → same batches)."""
    from gsrs_tpu.config import (
        EvalConfig,
        ExperimentConfig,
        ModelConfig,
        ParallelConfig,
        TrainConfig,
    )
    from gsrs_tpu.train.trainer import Trainer

    data = clustered(64, 96, n_clusters=4, seed=2)

    def make(par, subdir):
        cfg = ExperimentConfig(
            model=ModelConfig(num_layers=2, embedding_dim=8),
            train=TrainConfig(
                batch_size=64, lr=1e-2, checkpoint_dir=str(tmp_path / subdir),
                tensorboard=False,
            ),
            eval=EvalConfig(test_batch=32),
            parallel=par,
        )
        graph = build_graph(data, edge_pad_multiple=256)
        model = build_model(cfg.model, graph, ell=ell_from_interactions(data))
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


def test_stress_pod_plan_and_generator():
    """Pod-scale stress harness (tools/stress_pod.py): memory-plan math
    and the low-memory synthetic generator (BASELINE config 5)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "stress_pod",
        os.path.join(os.path.dirname(__file__), "..", "tools", "stress_pod.py"),
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    plan = sp.memory_plan(
        50_000_000, 10_000_000, 256, 27, 65536, 1024,
        data_axis=4, model_axis=16,
    )
    # fp32 tables + Adam = 60M*256*4*3 / 16 shards ≈ 10.7 GiB — over the
    # 12.8 GiB (80% of v5e HBM) budget together with activations
    assert not plan["fits"]
    assert plan["min_model_axis_for_fit"] > 16
    plan32 = sp.memory_plan(
        50_000_000, 10_000_000, 256, 27, 65536, 1024,
        data_axis=2, model_axis=32,
    )
    assert plan32["fits"]

    data = sp.big_synthetic(500, 200, avg_degree=5, seed=0)
    assert data.train_users.size == 2500
    assert data.train_users.min() >= 0 and data.train_users.max() == 499
    assert data.train_items.min() >= 0 and data.train_items.max() < 200
    # Zipf skew: the rank-1 item must dominate, not merely match the
    # median (a uniform regression passes a >=median check half the time)
    counts = np.bincount(data.train_items, minlength=200)
    assert counts[0] >= 5 * max(np.median(counts), 1)


@pytest.mark.parametrize(
    "mesh_shape,kind",
    [
        ((8, 1), "sasrec"),
        ((2, 4), "sasrec"),
        ((1, 8), "sasrec"),
        ((2, 4), "gru4rec"),
        ((2, 4), "bert4rec"),
    ],
)
def test_seq_trainer_on_mesh_matches_single_device(mesh_shape, kind):
    """The mesh SeqTrainer (DP batches + row-sharded item table) must
    reproduce the single-device trainer's losses and eval metrics."""
    from gsrs_tpu.data.sequences import synthetic_markov_sequences
    from gsrs_tpu.models.registry import build_seq_model
    from gsrs_tpu.train.seq_trainer import SeqTrainer

    data = synthetic_markov_sequences(
        n_users=128, m_items=50, max_len=10, seed=7
    )

    def run(mesh):
        model = build_seq_model(
            kind, m_items=50, max_len=10, dim=8, hidden=8,
            blocks=1, heads=1, dropout=0.0,
        )
        tr = SeqTrainer(
            model, data, batch_size=32, lr=1e-2, seed=0,
            topks=(5, 10), eval_batch=32, mesh=mesh,
        )
        state = tr.init_state()
        losses = []
        for _ in range(3):
            state, loss = tr.train_epoch(state)
            losses.append(loss)
        return losses, tr.evaluate(state)

    base_losses, base_metrics = run(None)
    d, m = mesh_shape
    mesh_losses, mesh_metrics = run(make_mesh(data_axis=d, model_axis=m))
    np.testing.assert_allclose(mesh_losses, base_losses, rtol=2e-4)
    for k, v in base_metrics.items():
        np.testing.assert_allclose(mesh_metrics[k], v, rtol=2e-4, err_msg=k)


def test_seq_trainer_rejects_indivisible_batch():
    from gsrs_tpu.data.sequences import synthetic_markov_sequences
    from gsrs_tpu.models.registry import build_seq_model
    from gsrs_tpu.train.seq_trainer import SeqTrainer

    data = synthetic_markov_sequences(n_users=32, m_items=20, max_len=8, seed=0)
    model = build_seq_model("gru4rec", m_items=20, max_len=8, dim=8, hidden=8, blocks=1)
    with pytest.raises(ValueError, match="data axis"):
        SeqTrainer(model, data, batch_size=30, mesh=make_mesh(data_axis=8, model_axis=1))


def test_seq_mesh_checkpoint_interop(tmp_path):
    """Mesh-trained checkpoints store the CANONICAL (unpadded) item table:
    serve_seq export must read them, and a single-device trainer must
    resume from them (and vice versa the mesh trainer re-pads on restore)."""
    import os

    from gsrs_tpu.data.sequences import synthetic_markov_sequences
    from gsrs_tpu.models.registry import build_seq_model
    from gsrs_tpu.train.seq_trainer import SeqTrainer

    data = synthetic_markov_sequences(n_users=64, m_items=50, max_len=10, seed=2)

    def make(mesh):
        model = build_seq_model(
            "sasrec", m_items=50, max_len=10, dim=8, hidden=8,
            blocks=1, heads=1, dropout=0.0,
        )
        return SeqTrainer(model, data, batch_size=32, seed=0, mesh=mesh)

    ckdir = os.path.join(tmp_path, "ck")
    mesh_tr = make(make_mesh(data_axis=2, model_axis=4))  # 51 rows → padded 52
    mesh_tr.fit(epochs=1, checkpoint_dir=ckdir, eval_every=5, verbose=False)

    # 1) export from the mesh checkpoint (uses persisted model_meta.json)
    from gsrs_tpu.serve_seq import load_seq_retriever, main

    art = os.path.join(tmp_path, "seq.npz")
    main(["export", "--checkpoint_dir", ckdir, "--out", art])
    r = load_seq_retriever(art)
    assert r.params["item_emb"].shape == (51, 8)  # canonical, not padded
    items, _ = r.recommend([[1, 2, 3]], k=5)
    assert items.shape == (1, 5)

    # 2) single-device trainer resumes the mesh checkpoint
    single = make(None)
    st = single.fit(epochs=2, checkpoint_dir=ckdir, eval_every=5,
                    resume=True, verbose=False)
    assert st.epoch == 2

    # 3) a different-mesh trainer resumes the (now single-device) checkpoint
    other = make(make_mesh(data_axis=8, model_axis=1))
    st2 = other.fit(epochs=3, checkpoint_dir=ckdir, eval_every=5,
                    resume=True, verbose=False)
    assert st2.epoch == 3


def test_sharded_retriever_matches_single_device(tmp_path, setup):
    """Catalog-sharded serving (model-axis row shards + phantom-column
    masking) must return the same recommendations as single-device."""
    from gsrs_tpu.serve import retriever_from_model, Retriever

    data, graph, model, params, _, _ = setup
    base = retriever_from_model(model, params, data, batch_size=16)
    users = list(range(0, data.n_users, 5))
    items_a, scores_a = base.recommend(users, k=10)

    mesh = make_mesh(data_axis=2, model_axis=4)
    sharded = Retriever(
        base.user_emb, base.item_emb, base.seen_bitset,
        batch_size=16, mesh=mesh,
    )
    assert sharded.n_users == data.n_users and sharded.m_items == data.m_items
    items_b, scores_b = sharded.recommend(users, k=10)
    np.testing.assert_allclose(scores_a, scores_b, atol=1e-5)
    np.testing.assert_array_equal(items_a, items_b)
    # no phantom (>= m_items) id ever served
    assert (items_b < data.m_items).all()


def _single_device_dropout_step(model, optimizer, params, batch, key, decay=1e-4):
    users, pos, neg = batch

    def loss_fn(p):
        loss, aux = model.bpr_loss(p, users, pos, neg, key)
        return loss + decay * aux["reg"], aux

    opt_state = optimizer.init(params)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), float(loss)


@pytest.mark.parametrize("spmm_mode", ["ell", "segment", "hybrid", "tiled"])
def test_gspmd_step_dropout_matches_single_device(setup, spmm_mode):
    """Edge dropout through the standalone GSPMD step: same key → same
    per-edge keep mask → identical update as the single-device step
    (kills the round-1 NotImplementedError; the reference's --dropout/
    --keepprob flags now work in every execution mode — including
    hybrid and tiled, via the stateless hash mask of ops.hashdrop)."""
    data, graph, model, params, optimizer, batch = setup
    cfg = dataclasses.replace(
        model.cfg, dropout=True, keep_prob=0.6, spmm_mode=spmm_mode
    )
    if spmm_mode == "hybrid":
        from gsrs_tpu.ops.hybrid import hybrid_from_interactions

        layout = hybrid_from_interactions(data, cols=16)
        cfg = dataclasses.replace(cfg, hybrid_cols=16)
    elif spmm_mode == "tiled":
        from gsrs_tpu.ops.tiled import tiled_from_interactions

        # C=16 divides the 8-device mesh → dense blocks column-shard
        layout = tiled_from_interactions(data, groups=4, cols=16)
        cfg = dataclasses.replace(cfg, tiled_groups=4, tiled_cols=16)
    else:
        layout = model.ell if spmm_mode == "ell" else None
    drop_model = build_model(cfg, graph, ell=layout)
    key = jax.random.key(11)
    ref_params, ref_loss = _single_device_dropout_step(
        drop_model, optimizer, params, batch, key
    )

    mesh = make_mesh(data_axis=2, model_axis=4)
    sh = GraphShardings(mesh)
    p_sharded = sh.place_params(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    )
    model_sh = build_model(
        cfg, sh.place_graph(graph),
        ell=sh.place_ell(layout) if layout is not None else None,
    )
    opt_state = optimizer.init(p_sharded)
    step = make_train_step(model_sh, optimizer, mesh, decay=1e-4)(
        p_sharded, opt_state
    )
    batch_s = sh.batch_spec()
    sharded_batch = tuple(jax.device_put(b, batch_s) for b in batch)
    new_params, _, loss = step(
        p_sharded, opt_state, model_sh.graph, model_sh.ell, key, *sharded_batch
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params["user_emb"]),
        np.asarray(ref_params["user_emb"]),
        atol=1e-5,
    )


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_gspmd_tiled_step_matches_single_device(setup, mesh_shape):
    """The tiled (per-group hub blocks) layout through the GSPMD step on
    every mesh layout: dense blocks column-shard (contraction psum),
    residual ELL row-shards, update equals single-device."""
    from gsrs_tpu.ops.tiled import tiled_from_interactions

    data, graph, model, params, optimizer, batch = setup
    cfg = dataclasses.replace(
        model.cfg, spmm_mode="tiled", tiled_groups=4, tiled_cols=16
    )
    layout = tiled_from_interactions(data, groups=4, cols=16)
    t_model = build_model(cfg, graph, ell=layout)
    ref_params, ref_loss = _single_device_step(
        t_model, optimizer, params, batch
    )

    mesh = make_mesh(data_axis=mesh_shape[0], model_axis=mesh_shape[1])
    sh = GraphShardings(mesh)
    p_sharded = sh.place_params(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    )
    model_sh = build_model(
        cfg, sh.place_graph(graph), ell=sh.place_ell(layout)
    )
    opt_state = optimizer.init(p_sharded)
    step = make_train_step(model_sh, optimizer, mesh, decay=1e-4)(
        p_sharded, opt_state
    )
    batch_s = sh.batch_spec()
    sharded_batch = tuple(jax.device_put(b, batch_s) for b in batch)
    new_params, _, loss = step(
        p_sharded, opt_state, model_sh.graph, model_sh.ell, *sharded_batch
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
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


@pytest.mark.parametrize("spmm_mode", ["ell", "segment"])
def test_shard_map_step_dropout_matches_single_device(setup, spmm_mode):
    """Edge dropout through the explicit shard_map step: the replicated
    key reproduces the canonical keep mask on every device, so the
    sharded dropped-graph update equals the single-device one."""
    from gsrs_tpu.parallel.shard_map_train import make_shard_map_train_step

    data, graph, model, params, optimizer, batch = setup
    cfg = dataclasses.replace(
        model.cfg, dropout=True, keep_prob=0.6, spmm_mode=spmm_mode
    )
    drop_model = build_model(cfg, graph, ell=model.ell)
    key = jax.random.key(13)
    ref_params, ref_loss = _single_device_dropout_step(
        drop_model, optimizer, params, batch, key
    )

    mesh = make_mesh(data_axis=2, model_axis=4)
    sh = GraphShardings(mesh)
    p_sharded = sh.place_params(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    )
    opt_state = optimizer.init(p_sharded)
    model_sh = build_model(cfg, graph, ell=model.ell)
    step = make_shard_map_train_step(model_sh, optimizer, mesh, decay=1e-4)(
        p_sharded, opt_state
    )
    batch_s = sh.batch_spec()
    sharded_batch = tuple(jax.device_put(b, batch_s) for b in batch)
    new_params, _, loss = step(p_sharded, opt_state, graph, key, *sharded_batch)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
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


def test_ell_sharding_stores_fraction_per_device(setup):
    """The GSPMD ELL placement must actually shard storage: every bucket
    array's per-device shard holds ~1/n_devices of its rows (this is the
    layout tools/stress_pod.py's memory plan assumes)."""
    data, graph, model, params, _, _ = setup
    mesh = make_mesh(data_axis=2, model_axis=4)
    sh = GraphShardings(mesh)
    placed = sh.place_ell(model.ell)
    n_dev = mesh.size
    for side in (placed.by_user, placed.by_item):
        for b in side.buckets:
            rows = b.cols.shape[0]
            shard_rows = max(
                s.data.shape[0] for s in b.cols.addressable_shards
            )
            assert shard_rows <= -(-rows // n_dev), (rows, shard_rows)


def test_shard_ell_graph_roundtrip(setup):
    """shard_ell_graph's chunked layout reproduces the single-device ELL
    SpMM exactly: summing the per-shard assembled partials equals
    ell_propagate_layer (host-side check, no mesh needed)."""
    from gsrs_tpu.ops.ell import (
        apply_sharded_side_local,
        ell_propagate_layer,
        shard_ell_graph,
    )

    data, graph, model, params, _, _ = setup
    ell = model.ell
    x_items = jnp.asarray(
        np.random.default_rng(0).normal(size=(data.m_items, 8)).astype(np.float32)
    )
    ref = ell_propagate_layer(ell, params["user_emb"], x_items, None)[0]

    for n_shards in (1, 3, 8):
        sell = shard_ell_graph(ell, n_shards)
        total = jnp.zeros_like(ref)
        for s in range(n_shards):
            side = sell.by_user
            cols = tuple(
                c.reshape(n_shards, -1, c.shape[1])[s] for c in side.cols
            )
            w = tuple(a.reshape(n_shards, -1, a.shape[1])[s] for a in side.w)
            ei = tuple(
                a.reshape(n_shards, -1, a.shape[1])[s] for a in side.eidx
            )
            total = total + apply_sharded_side_local(
                cols, w, ei, side.assemble[s], x_items, None
            )
        np.testing.assert_allclose(
            np.asarray(total), np.asarray(ref), atol=1e-5
        )


def test_distributed_init_rejects_partial_explicit_config(monkeypatch):
    """A coordinator address with only half the explicit process coords is
    a launcher bug; it must raise, not silently degrade into N
    independent single-process runtimes (ADVICE r3)."""
    import pytest

    from gsrs_tpu.parallel.mesh import distributed_init

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("GSRS_NUM_PROCESSES", "2")
    monkeypatch.delenv("GSRS_PROCESS_ID", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    with pytest.raises(RuntimeError, match="only one of"):
        distributed_init()


def test_gspmd_step_fused_adam_matches_optax(setup):
    """FusedAdam on the mesh == optax.adam single-device: the one-pass
    update is elementwise, so GSPMD shards it like the tables and the
    math must agree with the reference chain."""
    from gsrs_tpu.train.fused_adam import FusedAdam

    data, graph, model, params, optimizer, batch = setup
    ref_params, ref_loss = _single_device_step(model, optimizer, params, batch)

    mesh = make_mesh(data_axis=2, model_axis=4)
    sh = GraphShardings(mesh)
    p_sharded = sh.place_params(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    )
    model_sh = build_model(
        model.cfg, sh.place_graph(graph), ell=sh.place_ell(model.ell)
    )
    fused = FusedAdam(schedule=optax.constant_schedule(1e-2))
    opt_state = fused.init(p_sharded)
    step = make_train_step(model_sh, fused, mesh, decay=1e-4)(
        p_sharded, opt_state
    )
    batch_s = sh.batch_spec()
    sharded_batch = tuple(jax.device_put(b, batch_s) for b in batch)
    new_params, _, loss = step(
        p_sharded, opt_state, model_sh.graph, model_sh.ell, *sharded_batch
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    for name in ("user_emb", "item_emb"):
        np.testing.assert_allclose(
            np.asarray(new_params[name]), np.asarray(ref_params[name]),
            atol=1e-5,
        )
