"""Native C++ sampler: build, contract, determinism, dispatch."""

import numpy as np
import pytest

from gsrs_tpu.native import load_native_sampler
from gsrs_tpu.ops.sampling import sample_triplets_host


def _dense_mask(data):
    m = np.zeros((data.n_users, data.m_items), bool)
    m[data.train_users, data.train_items] = True
    return m


@pytest.fixture(scope="module")
def native():
    lib = load_native_sampler()
    if lib is None:
        pytest.skip("no native toolchain available")
    return lib


def test_native_sample_negative_contract(native, tiny_data):
    net = tiny_data.user_item_net
    native.seed(2020)
    S = native.sample_negative(
        tiny_data.n_users,
        tiny_data.m_items,
        tiny_data.train_size,
        net.indptr,
        net.indices,
        neg_num=1,
    )
    assert S.shape[1] == 3
    per_user = tiny_data.train_size // tiny_data.n_users
    assert len(S) <= per_user * tiny_data.n_users
    mask = _dense_mask(tiny_data)
    assert mask[S[:, 0], S[:, 1]].all()
    assert not mask[S[:, 0], S[:, 2]].any()


def test_native_multi_negative(native, tiny_data):
    native.seed(7)  # don't depend on RNG state leaked from earlier tests
    net = tiny_data.user_item_net
    S = native.sample_negative(
        tiny_data.n_users,
        tiny_data.m_items,
        tiny_data.train_size,
        net.indptr,
        net.indices,
        neg_num=4,
    )
    assert S.shape[1] == 6
    mask = _dense_mask(tiny_data)
    assert mask[S[:, 0], S[:, 1]].all()  # column 1 is a true positive
    for j in range(2, 6):
        assert not mask[S[:, 0], S[:, j]].any()


def test_native_by_user(native, tiny_data):
    net = tiny_data.user_item_net
    users = np.arange(0, tiny_data.n_users, 2, dtype=np.int64)
    S = native.sample_negative_by_user(
        users, tiny_data.m_items, net.indptr, net.indices
    )
    valid = users[tiny_data.user_degrees[users] > 0]
    np.testing.assert_array_equal(S[:, 0], valid)
    mask = _dense_mask(tiny_data)
    assert mask[S[:, 0], S[:, 1]].all()
    assert not mask[S[:, 0], S[:, 2]].any()


def test_native_seed_determinism(native, tiny_data):
    net = tiny_data.user_item_net
    args = (
        tiny_data.n_users,
        tiny_data.m_items,
        tiny_data.train_size,
        net.indptr,
        net.indices,
    )
    native.seed(7)
    a = native.sample_negative(*args)
    native.seed(7)
    b = native.sample_negative(*args)
    np.testing.assert_array_equal(a, b)
    native.seed(8)
    c = native.sample_negative(*args)
    assert not np.array_equal(a, c)


def test_host_dispatch(tiny_data):
    S = sample_triplets_host(tiny_data, 200, seed=1)
    assert S.shape[1] == 3
    mask = _dense_mask(tiny_data)
    assert mask[S[:, 0], S[:, 1]].all()
    assert not mask[S[:, 0], S[:, 2]].any()
