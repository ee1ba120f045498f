"""Serving tests: retriever masks seen items, matches the eval top-k,
artifact roundtrips, and the export/query CLI works end to end."""

import numpy as np

import jax
import jax.numpy as jnp

from gsrs_tpu.config import ModelConfig
from gsrs_tpu.data.adjacency import build_graph
from gsrs_tpu.models.registry import build_model
from gsrs_tpu.ops.bitset import build_bitset
from gsrs_tpu.ops.ell import ell_from_interactions
from gsrs_tpu.ops.topk import masked_topk
from gsrs_tpu.serve import (
    Retriever,
    export_embeddings,
    load_retriever,
    retriever_from_model,
)


def _model_and_params(data, seed=0):
    cfg = ModelConfig(num_layers=2, embedding_dim=8)
    graph = build_graph(data, edge_pad_multiple=256)
    model = build_model(cfg, graph, ell=ell_from_interactions(data))
    return model, model.init_params(jax.random.key(seed))


def test_retriever_excludes_seen_and_matches_eval_topk(tiny_data):
    model, params = _model_and_params(tiny_data)
    r = retriever_from_model(model, params, tiny_data, batch_size=16)
    users = list(range(0, tiny_data.n_users, 3))
    items, scores = r.recommend(users, k=10)
    assert items.shape == (len(users), 10)
    # no seen item ever recommended
    net = np.zeros((tiny_data.n_users, tiny_data.m_items), bool)
    net[tiny_data.train_users, tiny_data.train_items] = True
    for u, row in zip(users, items):
        assert not net[u, row].any()
    # identical to the shared eval masked_topk
    all_u, all_i, _ = model.final_embeddings(params)
    tb = jnp.asarray(
        build_bitset(
            tiny_data.train_users,
            tiny_data.train_items,
            tiny_data.n_users,
            tiny_data.m_items,
        )
    )
    ref_scores, ref_items = masked_topk(
        all_u[np.asarray(users)], all_i, tb[np.asarray(users)], 10
    )
    np.testing.assert_array_equal(items, np.asarray(ref_items))
    np.testing.assert_allclose(scores, np.asarray(ref_scores), atol=1e-6)


def test_artifact_roundtrip(tiny_data, tmp_path):
    model, params = _model_and_params(tiny_data)
    r = retriever_from_model(model, params, tiny_data)
    path = str(tmp_path / "emb.npz")
    export_embeddings(r, path)
    r2 = load_retriever(path)
    i1, s1 = r.recommend([1, 5, 9], k=5)
    i2, s2 = r2.recommend([1, 5, 9], k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_cli_export_and_query(tmp_path, capsys):
    """Train 2 epochs, export from the saved checkpoint, query."""
    from gsrs_tpu.config import EvalConfig, ExperimentConfig, TrainConfig
    from gsrs_tpu.data.dataset import write_interaction_file
    from gsrs_tpu.data.synthetic import clustered
    from gsrs_tpu.serve import main as serve_main
    from gsrs_tpu.train.trainer import Trainer

    data = clustered(40, 60, n_clusters=4, seed=0)
    ddir = tmp_path / "ds"
    ddir.mkdir()
    write_interaction_file(
        str(ddir / "train.txt"), data.train_users, data.train_items
    )
    with open(ddir / "test.txt", "w") as f:
        for u, its in data.test_dict.items():
            f.write(f"{u} " + " ".join(map(str, its)) + "\n")

    cfg = ExperimentConfig(
        model=ModelConfig(num_layers=2, embedding_dim=8),
        train=TrainConfig(
            batch_size=64, epochs=2, checkpoint_dir=str(tmp_path / "ck"),
            tensorboard=False,
        ),
        eval=EvalConfig(test_batch=32),
    )
    graph = build_graph(data, edge_pad_multiple=256)
    model = build_model(cfg.model, graph, ell=ell_from_interactions(data))
    Trainer(cfg, data, graph, model).fit(verbose=False)

    art = str(tmp_path / "emb.npz")
    serve_main(
        [
            "export",
            "--checkpoint_dir", str(tmp_path / "ck"),
            "--dataset_dir", str(ddir),
            "--out", art,
            "--layer", "2",
            "--recdim", "8",
        ]
    )
    serve_main(["query", "--artifact", art, "--users", "0", "3", "--k", "5"])
    out = capsys.readouterr().out
    assert "user 0:" in out and "user 3:" in out


def test_retriever_rejects_out_of_range_ids(tiny_data):
    import pytest

    model, params = _model_and_params(tiny_data)
    r = retriever_from_model(model, params, tiny_data)
    with pytest.raises(ValueError, match="out of range"):
        r.recommend([0, tiny_data.n_users], k=5)
    with pytest.raises(ValueError, match="out of range"):
        r.recommend([-1], k=5)


def test_retriever_from_padded_data_is_canonical(tiny_data):
    """A model built on mesh-padded data must export canonical
    (real-size) tables, so artifacts don't depend on the training mesh."""
    from gsrs_tpu.data.dataset import pad_nodes_to_multiple

    padded = pad_nodes_to_multiple(tiny_data, 16)
    assert padded.n_users > tiny_data.n_users or padded.m_items > tiny_data.m_items
    model, params = _model_and_params(padded)
    r = retriever_from_model(model, params, padded, batch_size=8)
    assert r.n_users == tiny_data.n_users
    assert r.m_items == tiny_data.m_items
    items, _ = r.recommend([0, 1], k=5)
    assert (items < tiny_data.m_items).all()


def test_int8_quantized_artifact(tmp_path, tiny_data):
    """int8 export: 4x smaller tables, rankings near-identical to fp32
    (error bounded by per-row 8-bit rounding)."""
    import os

    from gsrs_tpu.serve import export_embeddings, load_retriever

    model, params = _model_and_params(tiny_data)
    r = retriever_from_model(model, params, tiny_data, batch_size=16)
    fp, q8 = os.path.join(tmp_path, "fp.npz"), os.path.join(tmp_path, "q8.npz")
    export_embeddings(r, fp)
    export_embeddings(r, q8, quantize="int8")

    rf = load_retriever(fp)
    rq = load_retriever(q8)
    assert np.asarray(rq.user_emb).dtype == np.int8
    users = list(range(0, tiny_data.n_users, 3))
    items_f, scores_f = rf.recommend(users, k=10)
    items_q, scores_q = rq.recommend(users, k=10)
    # seen-item exclusion still holds under quantization
    net = np.zeros((tiny_data.n_users, tiny_data.m_items), bool)
    net[tiny_data.train_users, tiny_data.train_items] = True
    for u, row in zip(users, items_q):
        assert not net[u, row].any()
    # top-10 sets overlap strongly and scores agree to quant tolerance
    overlap = np.mean(
        [len(set(a) & set(b)) / 10.0 for a, b in zip(items_f, items_q)]
    )
    assert overlap >= 0.8, f"top-10 overlap {overlap}"
    np.testing.assert_allclose(scores_q, scores_f, atol=0.05, rtol=0.05)


def test_bitplane_path_keeps_public_fields_canonical(tiny_data, tmp_path):
    """ADVICE r4 (high): forcing the bitplane fast path must NOT mutate
    the public dataclass fields — export after a bitplane load has to
    write the canonical (natural-order, real-size) artifact. The
    permuted+padded tables live only in the private serve tables.
    (Construction is lazy about the kernel itself, so forcing 'on' works
    on CPU; only recommend() would need a real TPU.)"""
    model, params = _model_and_params(tiny_data)
    base = retriever_from_model(model, params, tiny_data)
    ue = np.asarray(base.user_emb, np.float32)
    ie = np.asarray(base.item_emb, np.float32)
    seen = np.array(np.asarray(base.seen_bitset))

    r = Retriever(
        user_emb=ue.copy(), item_emb=ie.copy(),
        seen_bitset=seen.copy(), use_pallas_scoring="on",
    )
    assert getattr(r, "_bp_perm", None) is not None
    np.testing.assert_array_equal(np.asarray(r.user_emb), ue)
    np.testing.assert_array_equal(np.asarray(r.item_emb), ie)
    np.testing.assert_array_equal(np.asarray(r.seen_bitset), seen)
    # serve tables ARE transformed: item table padded to the block size
    assert r._serve_tables[1].shape[0] % 4096 == 0
    # export → load roundtrip returns the canonical tables
    path = str(tmp_path / "bp.npz")
    export_embeddings(r, path)
    r2 = load_retriever(path, use_pallas_scoring="off")
    np.testing.assert_array_equal(np.asarray(r2.item_emb), ie)
    np.testing.assert_array_equal(np.asarray(r2.seen_bitset), seen)
    # 'off' is a real off switch even above any threshold
    r3 = Retriever(
        user_emb=ue.copy(), item_emb=ie.copy(), seen_bitset=seen.copy(),
        use_pallas_scoring="off", pallas_auto_min_items=1,
    )
    assert getattr(r3, "_bp_perm", None) is None


def test_recommend_phantom_slots_are_minus_one():
    """A user with fewer than k unseen items gets -1 (not a clamped,
    valid-looking item id) in the phantom slots (ADVICE r4)."""
    rng = np.random.default_rng(0)
    n, m, d = 4, 8, 4
    ue = rng.standard_normal((n, d)).astype(np.float32)
    ie = rng.standard_normal((m, d)).astype(np.float32)
    # user 0 has seen items 0..5 -> only items 6,7 are recommendable
    seen = build_bitset(
        np.zeros(6, np.int64), np.arange(6), n, m
    )
    r = Retriever(user_emb=ue, item_emb=ie, seen_bitset=jnp.asarray(seen),
                  batch_size=4)
    items, scores = r.recommend([0, 1], k=5)
    assert set(items[0][:2]) == {6, 7}
    np.testing.assert_array_equal(items[0][2:], [-1, -1, -1])
    assert (scores[0][2:] < -1e8).all()
    # user 1 saw nothing: all k slots are real items
    assert (items[1] >= 0).all()


def test_int8_quantized_sharded_matches(tmp_path, tiny_data):
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    import os

    from gsrs_tpu.parallel.mesh import make_mesh
    from gsrs_tpu.serve import export_embeddings, load_retriever

    model, params = _model_and_params(tiny_data)
    r = retriever_from_model(model, params, tiny_data, batch_size=16)
    q8 = os.path.join(tmp_path, "q8.npz")
    export_embeddings(r, q8, quantize="int8")
    base = load_retriever(q8)
    sharded = load_retriever(q8, mesh=make_mesh(data_axis=2, model_axis=4))
    users = list(range(0, tiny_data.n_users, 5))
    items_a, scores_a = base.recommend(users, k=8)
    items_b, scores_b = sharded.recommend(users, k=8)
    np.testing.assert_array_equal(items_a, items_b)
    np.testing.assert_allclose(scores_a, scores_b, rtol=1e-5)
