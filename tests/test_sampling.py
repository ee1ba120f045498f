"""Sampler contract tests: validity (positives from the user's list,
negatives never positives — reference code/sources/sampling.cpp:27-56
semantics), distribution sanity, and the python fallback."""

import jax
import numpy as np

from gsrs_tpu.ops.bitset import build_bitset, bitset_lookup, bitset_row_mask
from gsrs_tpu.ops.sampling import (
    make_sampler_state,
    sample_epoch,
    sample_triplets,
    sample_triplets_python,
)


def _dense_mask(data):
    m = np.zeros((data.n_users, data.m_items), bool)
    m[data.train_users, data.train_items] = True
    return m


def test_device_sampler_validity(tiny_data):
    state = make_sampler_state(tiny_data)
    users, pos, neg = map(
        np.asarray, sample_triplets(jax.random.key(0), state, 4096)
    )
    mask = _dense_mask(tiny_data)
    assert mask[users, pos].all(), "sampled positive not in user's positives"
    assert not mask[users, neg].any(), "sampled negative is a train positive"
    assert (users >= 0).all() and (users < tiny_data.n_users).all()
    assert (neg >= 0).all() and (neg < tiny_data.m_items).all()


def test_device_sampler_uniformity(tiny_data):
    """Users with positives should be drawn ~uniformly."""
    state = make_sampler_state(tiny_data)
    n_draw = 40000
    users, _, _ = map(
        np.asarray, sample_triplets(jax.random.key(1), state, n_draw)
    )
    counts = np.bincount(users, minlength=tiny_data.n_users)
    valid = tiny_data.user_degrees > 0
    expected = n_draw / valid.sum()
    # chi-square-ish loose bound: all valid users within 40% of expected
    assert counts[valid].min() > expected * 0.6
    assert counts[valid].max() < expected * 1.4


def test_zero_degree_users_never_sampled():
    """A user with no positives must never be emitted (conftest's random
    data gives every user a positive, so build one explicitly)."""
    from gsrs_tpu.data.dataset import InteractionData

    users = np.array([0, 0, 2, 2, 3], dtype=np.int64)  # user 1 has none
    items = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    data = InteractionData("z", 4, 5, users, items, {})
    state = make_sampler_state(data)
    drawn, _, _ = map(
        np.asarray, sample_triplets(jax.random.key(0), state, 4096)
    )
    assert (np.bincount(drawn, minlength=4)[1] == 0)


def test_positive_uniform_over_user_list(tiny_data):
    state = make_sampler_state(tiny_data)
    users, pos, _ = map(
        np.asarray, sample_triplets(jax.random.key(2), state, 60000)
    )
    # pick the highest-degree user and check its positives are all hit
    u = int(np.argmax(tiny_data.user_degrees))
    mine = pos[users == u]
    if mine.size > 50:
        hit = np.unique(mine)
        expect = tiny_data.positives_of(u)
        assert np.isin(hit, expect).all()
        assert hit.size > 0.5 * expect.size


def test_sample_epoch_shapes(tiny_data):
    state = make_sampler_state(tiny_data)
    u, p, n = sample_epoch(jax.random.key(0), state, epoch_size=1000, batch_size=256)
    assert u.shape == (4, 256) and p.shape == (4, 256) and n.shape == (4, 256)


def test_python_fallback_contract(tiny_data):
    rng = np.random.default_rng(0)
    S = sample_triplets_python(rng, tiny_data, 500)
    assert S.ndim == 2 and S.shape[1] == 3
    mask = _dense_mask(tiny_data)
    assert mask[S[:, 0], S[:, 1]].all()
    assert not mask[S[:, 0], S[:, 2]].any()


# ------------------------------------------------------------------ bitset


def test_bitset_lookup_exact(tiny_data):
    bs = build_bitset(
        tiny_data.train_users,
        tiny_data.train_items,
        tiny_data.n_users,
        tiny_data.m_items,
    )
    mask = _dense_mask(tiny_data)
    import jax.numpy as jnp

    users = np.repeat(np.arange(tiny_data.n_users), tiny_data.m_items)
    items = np.tile(np.arange(tiny_data.m_items), tiny_data.n_users)
    got = np.asarray(
        bitset_lookup(jnp.asarray(bs), jnp.asarray(users), jnp.asarray(items))
    )
    np.testing.assert_array_equal(got, mask[users, items])


def test_bitset_row_mask(tiny_data):
    import jax.numpy as jnp

    bs = build_bitset(
        tiny_data.train_users,
        tiny_data.train_items,
        tiny_data.n_users,
        tiny_data.m_items,
    )
    rows = np.array([0, 3, 7])
    got = np.asarray(bitset_row_mask(jnp.asarray(bs[rows]), tiny_data.m_items))
    np.testing.assert_array_equal(got, _dense_mask(tiny_data)[rows])


def test_python_sampler_skips_full_coverage_user():
    """A user whose positives cover the entire catalog has no valid
    negative — the fallback must skip them, not spin forever."""
    import numpy as np

    from gsrs_tpu.data.dataset import InteractionData
    from gsrs_tpu.ops.sampling import sample_triplets_python

    m = 6
    # user 0 interacted with everything; user 1 with one item
    users = np.array([0] * m + [1], dtype=np.int64)
    items = np.array(list(range(m)) + [0], dtype=np.int64)
    data = InteractionData("full", 2, m, users, items, {})
    rng = np.random.default_rng(0)
    rows = sample_triplets_python(rng, data, 50)
    assert rows.size  # user-1 rows survive
    assert (rows[:, 0] == 1).all()


def test_padded_catalog_phantom_items_masked():
    """After pad_nodes_to_multiple, phantom item ids must be rejected as
    negatives (train bitset has their bits set for every user)."""
    import jax
    import numpy as np

    from gsrs_tpu.data.dataset import InteractionData, pad_nodes_to_multiple
    from gsrs_tpu.ops.sampling import make_sampler_state, sample_triplets

    users = np.repeat(np.arange(10, dtype=np.int64), 5)
    items = np.tile(np.arange(5, dtype=np.int64), 10)
    data = InteractionData("pad", 10, 31, users, items, {})
    padded = pad_nodes_to_multiple(data, 16)  # m: 31 → 32, n: 10 → 16
    assert padded.m_items == 32 and padded.real_m_items == 31
    state = make_sampler_state(padded)
    # every user's phantom bit (item 31) must be set
    rows = np.asarray(state.train_bitset)
    assert ((rows[:, 0] >> 31) & 1).all()
    _, _, neg = sample_triplets(jax.random.key(0), state, 2048)
    neg = np.asarray(neg)
    assert (neg < 31).all(), f"phantom ids sampled as negatives: {neg[neg >= 31]}"
    assert (neg >= 5).all()  # 0..4 are everyone's positives


def test_device_sampler_neg_candidates_knob(tiny_data):
    """neg_candidates (round-5 sampler-cost knob, the dominant
    per-triplet train cost — BENCH_NOTES train roofline) must keep the
    sampler contract at small C on realistic density, and thread through
    sample_epoch."""
    state = make_sampler_state(tiny_data)
    mask = _dense_mask(tiny_data)
    # tiny_data density ~0.09 (incl. the guaranteed per-user positive):
    # the documented bias floor is rho^C per triplet, so C=2 leaks ~0.8%
    # here while C=8 leaks ~1e-9 — both bounds checked
    rho = mask.sum() / mask.size
    for c, max_rate in ((2, 3 * rho**2), (4, 3 * rho**4 + 1e-3), (8, 0.0)):
        users, pos, neg = map(
            np.asarray,
            sample_triplets(jax.random.key(3), state, 4096, neg_candidates=c),
        )
        assert mask[users, pos].all()
        leak = mask[users, neg].mean()
        assert leak <= max_rate, f"leak {leak} above rho^C bound at C={c}"
    u, p, n = sample_epoch(
        jax.random.key(4), state, 1000, 250, neg_candidates=4
    )
    assert u.shape == (4, 250)
    un, pn, nn = map(np.asarray, (u.reshape(-1), p.reshape(-1), n.reshape(-1)))
    assert not mask[un, nn].any()


def test_device_sampler_unchecked_mode(tiny_data):
    """neg_candidates=0: one uniform draw, no bitset test. Negatives
    must stay in-range and the positive-collision rate must track the
    dataset density rho (the documented bias of the unchecked mode),
    not zero and not grossly above it."""
    state = make_sampler_state(tiny_data)
    mask = _dense_mask(tiny_data)
    rho = mask.sum() / mask.size
    users, pos, neg = map(
        np.asarray,
        sample_triplets(jax.random.key(5), state, 8192, neg_candidates=0),
    )
    assert mask[users, pos].all()
    assert (neg >= 0).all() and (neg < tiny_data.m_items).all()
    leak = mask[users, neg].mean()
    # E[leak] ~ mean user-degree/m; tiny_data is ~9% dense so the
    # collision rate is visible — bound it within 2x of rho either side
    assert 0.3 * rho < leak < 2.0 * rho, (leak, rho)
    # threads through sample_epoch too
    u, p, n = sample_epoch(
        jax.random.key(6), state, 1000, 250, neg_candidates=0
    )
    assert u.shape == (4, 250) and n.min() >= 0
