"""Sequential-serving tests: session encoding, seen-item exclusion,
artifact roundtrip fidelity, trained-model sanity (next item in the
session's Markov cluster), and the export/query CLI."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gsrs_tpu.data.sequences import synthetic_markov_sequences
from gsrs_tpu.models.registry import SEQ_MODELS, build_seq_model
from gsrs_tpu.serve_seq import (
    SeqRetriever,
    export_seq_model,
    load_seq_retriever,
)
from gsrs_tpu.train.seq_trainer import SeqTrainer

M_ITEMS = 60
MAX_LEN = 12


def _retriever(kind="sasrec", seed=0, **kw):
    model = build_seq_model(
        kind, m_items=M_ITEMS, max_len=MAX_LEN, dim=8, hidden=8,
        blocks=1, heads=1, dropout=0.0,
    )
    import jax

    params = model.init_params(jax.random.key(seed))
    return SeqRetriever(model, params, **kw)


@pytest.mark.parametrize("kind", SEQ_MODELS)
def test_recommend_shapes_and_exclusion(kind):
    r = _retriever(kind)
    sessions = [[0, 5, 9], [3], list(range(20))]  # incl. longer-than-max_len
    items, scores = r.recommend(sessions, k=10)
    assert items.shape == (3, 10) and scores.shape == (3, 10)
    for sess, row in zip(sessions, items):
        assert not set(row.tolist()) & set(sess)
        assert (row >= 0).all() and (row < M_ITEMS).all()
    # scores sorted descending
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_batch_padding_consistency():
    # results must not depend on how requests split into padded batches
    r_small = _retriever(batch_size=2)
    r_big = _retriever(batch_size=64)
    sessions = [[i, (i * 7) % M_ITEMS] for i in range(5)]
    items_a, scores_a = r_small.recommend(sessions, k=5)
    items_b, scores_b = r_big.recommend(sessions, k=5)
    np.testing.assert_array_equal(items_a, items_b)
    np.testing.assert_allclose(scores_a, scores_b, rtol=1e-5)


def test_session_validation():
    r = _retriever()
    with pytest.raises(ValueError, match="out of range"):
        r.recommend([[0, M_ITEMS]], k=5)
    with pytest.raises(ValueError, match="empty"):
        r.recommend([[]], k=5)


def test_left_padding_matches_sequences_layout():
    # a session shorter than max_len must land right-aligned and shifted,
    # exactly the gsrs_tpu.data.sequences convention
    r = _retriever()
    seqs, seen = r._encode_sessions([[4, 2, 7]])
    expected = np.zeros(MAX_LEN, np.int32)
    expected[-3:] = [5, 3, 8]
    np.testing.assert_array_equal(seqs[0], expected)
    for i in (4, 2, 7):
        assert seen[0, i // 32] >> (i % 32) & 1


def test_artifact_roundtrip(tmp_path):
    r = _retriever()
    path = os.path.join(tmp_path, "seq.npz")
    export_seq_model(
        r.params, "sasrec", M_ITEMS, path,
        max_len=MAX_LEN, dim=8, hidden=8, blocks=1, heads=1,
    )
    r2 = load_seq_retriever(path, batch_size=64)
    sessions = [[1, 2, 3], [10, 20]]
    items_a, scores_a = r.recommend(sessions, k=8)
    items_b, scores_b = r2.recommend(sessions, k=8)
    np.testing.assert_array_equal(items_a, items_b)
    np.testing.assert_allclose(scores_a, scores_b, rtol=1e-5)


def test_trained_model_predicts_cluster(tmp_path):
    # train briefly on cluster-Markov data; served recommendations for an
    # in-cluster session should hit that cluster far above chance
    data = synthetic_markov_sequences(
        n_users=300, m_items=M_ITEMS, n_clusters=5, max_len=MAX_LEN,
        seed=3, p_stay=0.95,
    )
    model = build_seq_model(
        "sasrec", m_items=M_ITEMS, max_len=MAX_LEN, dim=16, hidden=16,
        blocks=1, heads=1, dropout=0.0,
    )
    trainer = SeqTrainer(model, data, batch_size=64, lr=5e-3, seed=0)
    state = trainer.init_state()
    for _ in range(30):
        state, _ = trainer.train_epoch(state)
    r = SeqRetriever(model, state.params, batch_size=8)
    cluster_of = (np.arange(M_ITEMS) * 5) // M_ITEMS
    cluster0 = [int(i) for i in np.flatnonzero(cluster_of == 0)[:6]]
    items, _ = r.recommend([cluster0], k=5)
    frac = np.mean(cluster_of[items[0]] == 0)
    assert frac >= 0.6, f"in-cluster fraction {frac} (chance ≈ 0.2)"


def test_cli_export_query(tmp_path, capsys):
    # fit one epoch with a checkpoint dir, then export + query via the CLI
    data = synthetic_markov_sequences(
        n_users=64, m_items=M_ITEMS, max_len=MAX_LEN, seed=1
    )
    model = build_seq_model(
        "gru4rec", m_items=M_ITEMS, max_len=MAX_LEN, dim=8, hidden=8,
        blocks=1, dropout=0.0,
    )
    ckdir = os.path.join(tmp_path, "ck")
    trainer = SeqTrainer(model, data, batch_size=32, seed=0)
    trainer.fit(epochs=1, checkpoint_dir=ckdir, eval_every=10, verbose=False)

    from gsrs_tpu.serve_seq import main

    art = os.path.join(tmp_path, "seq.npz")
    main([
        "export", "--checkpoint_dir", ckdir, "--out", art,
        "--model", "gru4rec", "--m_items", str(M_ITEMS),
        "--max_len", str(MAX_LEN), "--dim", "8", "--hidden", "8",
        "--blocks", "1",
    ])
    main(["query", "--artifact", art, "--session", "1", "2", "3", "--k", "5"])
    out = capsys.readouterr().out
    assert "exported" in out and "session [1, 2, 3]:" in out
