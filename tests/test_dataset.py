"""Data-layer tests: txt parsing semantics (reference
code/dataloader.py:82-119), write/read roundtrip, lastfm loader,
synthetic generators."""

import numpy as np

from gsrs_tpu.data.dataset import (
    load_dataset,
    load_lastfm,
    parse_interaction_file,
    write_interaction_file,
)
from gsrs_tpu.data.synthetic import clustered, powerlaw


def test_parse_skips_blank_and_itemless_lines(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("0 5 7\n\n1\n2 3\n")
    u, i = parse_interaction_file(str(p))
    np.testing.assert_array_equal(u, [0, 0, 2])
    np.testing.assert_array_equal(i, [5, 7, 3])


def test_parse_tolerates_timestamp_tokens(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("0 5:123 7:456\n")
    u, i = parse_interaction_file(str(p))
    np.testing.assert_array_equal(u, [0, 0])
    np.testing.assert_array_equal(i, [5, 7])


def test_shape_inference_over_train_and_test(tmp_path):
    (tmp_path / "train.txt").write_text("0 1\n1 2\n")
    (tmp_path / "test.txt").write_text("5 9\n")
    data = load_dataset(str(tmp_path))
    assert data.n_users == 6  # max uid 5 (+1), from the TEST file
    assert data.m_items == 10  # max iid 9 (+1)


def test_write_read_roundtrip(tmp_path, tiny_data):
    p = tmp_path / "train.txt"
    write_interaction_file(str(p), tiny_data.train_users, tiny_data.train_items)
    u, i = parse_interaction_file(str(p))
    expect = set(zip(tiny_data.train_users.tolist(), tiny_data.train_items.tolist()))
    assert set(zip(u.tolist(), i.tolist())) == expect


def test_positives_and_degrees(tiny_data):
    for u in range(0, tiny_data.n_users, 7):
        pos = tiny_data.positives_of(u)
        assert len(pos) == tiny_data.user_degrees[u]
        mask = np.zeros(tiny_data.m_items, bool)
        mask[tiny_data.train_items[tiny_data.train_users == u]] = True
        np.testing.assert_array_equal(np.sort(pos), np.flatnonzero(mask))


def test_lastfm_loader(tmp_path):
    (tmp_path / "data1.txt").write_text("1\t4\t99\n2\t5\t3\n1\t4\t1\n")
    (tmp_path / "test1.txt").write_text("2\t4\t1\n")
    data = load_lastfm(str(tmp_path))
    assert data.n_users == 2 and data.m_items == 5
    assert data.train_size == 2  # duplicate (1,4) de-duped; ids shift to 0-based
    assert 1 in data.test_dict


def test_clustered_generator_holds_out_unseen_in_cluster():
    data = clustered(40, 60, n_clusters=4, seed=0)
    net = np.zeros((40, 60), bool)
    net[data.train_users, data.train_items] = True
    for u, gt in data.test_dict.items():
        assert not net[u, gt].any(), "held-out item leaked into train"


def test_powerlaw_generator_scales():
    data = powerlaw(1000, 500, avg_degree=10, seed=0, holdout_frac=0.05)
    assert data.n_users == 1000 and data.m_items == 500
    assert (data.user_degrees > 0).all()
    assert data.train_size > 5000
    assert len(data.test_dict) > 0
    # popularity skew: top item much more popular than median
    assert data.item_degrees.max() > 10 * max(np.median(data.item_degrees), 1)


def test_pad_nodes_to_multiple(tiny_data):
    from gsrs_tpu.data.dataset import pad_nodes_to_multiple

    padded = pad_nodes_to_multiple(tiny_data, 8)
    assert padded.n_users % 8 == 0 and padded.m_items % 8 == 0
    assert padded.n_users >= tiny_data.n_users
    assert padded.train_size == tiny_data.train_size
    # phantom nodes have zero degree
    assert (padded.user_degrees[tiny_data.n_users:] == 0).all()
    # no-op when already divisible
    again = pad_nodes_to_multiple(padded, 8)
    assert again.n_users == padded.n_users
    assert pad_nodes_to_multiple(tiny_data, 1) is tiny_data


def test_write_preserve_order(tmp_path):
    p = tmp_path / "t.txt"
    u = np.array([1, 0, 1, 0])
    i = np.array([9, 5, 2, 3])
    write_interaction_file(str(p), u, i, preserve_order=True)
    lines = p.read_text().strip().splitlines()
    assert lines[0] == "1 9 2" or lines[1] == "1 9 2"
    assert "0 5 3" in lines  # user 0 keeps input order (5 then 3)


def test_feedback_of(tiny_data):
    """Reference getUserItemFeedback parity (code/dataloader.py:173-176)."""
    d = tiny_data
    u0 = int(d.train_users[0])
    i_pos = int(d.train_items[0])
    # an item u0 did NOT interact with
    neg_candidates = np.setdiff1d(np.arange(d.m_items), d.positives_of(u0))
    i_neg = int(neg_candidates[0])
    fb = d.feedback_of(np.array([u0, u0]), np.array([i_pos, i_neg]))
    assert fb.dtype == np.uint8
    assert fb.tolist() == [1, 0]
