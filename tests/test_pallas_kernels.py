"""Pallas kernel correctness in interpreter mode (CPU).

On real TPU the same kernels compile natively; interpreter mode checks
the math (tiling, bit unpack, masking) platform-independently."""

import numpy as np
import pytest

import jax.numpy as jnp

from gsrs_tpu.ops.bitset import build_bitset
from gsrs_tpu.ops.pallas_kernels import (
    NEG_INF,
    bitplane_permutation,
    masked_scores_bitplane_pallas,
    masked_scores_pallas,
)


def test_masked_scores_matches_reference(rng, tiny_data):
    B, d = 8, 16
    # pad users/items to kernel-friendly shapes
    m = tiny_data.m_items
    user_emb = rng.standard_normal((B, d)).astype(np.float32)
    item_emb = rng.standard_normal((m, d)).astype(np.float32)
    bitset = build_bitset(
        tiny_data.train_users, tiny_data.train_items, tiny_data.n_users, m
    )
    users = np.arange(B)
    rows = bitset[users]

    got = masked_scores_pallas(
        jnp.asarray(user_emb),
        jnp.asarray(item_emb),
        jnp.asarray(rows),
        block_b=8,
        block_m=64,
        interpret=True,
    )
    expect = user_emb @ item_emb.T
    mask = np.zeros((tiny_data.n_users, m), bool)
    mask[tiny_data.train_users, tiny_data.train_items] = True
    expect[mask[users]] = NEG_INF
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-4)


def test_masked_scores_nothing_masked(rng):
    B, m, d = 8, 64, 8
    u = rng.standard_normal((B, d)).astype(np.float32)
    it = rng.standard_normal((m, d)).astype(np.float32)
    rows = np.zeros((B, m // 32), np.uint32)
    got = masked_scores_pallas(
        jnp.asarray(u), jnp.asarray(it), jnp.asarray(rows),
        block_b=8, block_m=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), u @ it.T, atol=1e-4)


def test_masked_scores_word_padding(rng):
    """Catalog whose word count doesn't divide the block width."""
    B, m, d = 8, 100, 8  # W = 4 words; block_m=256 -> wpb=8, so the
    # bitset pads 4 ragged words (all-ones) and item_emb pads 156 rows
    u = rng.standard_normal((B, d)).astype(np.float32)
    it = rng.standard_normal((m, d)).astype(np.float32)
    rows = np.zeros((B, (m + 31) // 32), np.uint32)
    rows[0, 0] = 1  # mask item 0 for user-row 0
    got = masked_scores_pallas(
        jnp.asarray(u), jnp.asarray(it), jnp.asarray(rows),
        block_b=8, block_m=256, interpret=True,
    )
    assert got.shape == (B, m)
    expect = u @ it.T
    expect[0, 0] = NEG_INF
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-4)


def test_evaluator_with_pallas_scoring(tiny_data):
    import jax

    from gsrs_tpu.config import EvalConfig, ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.train.evaluator import Evaluator

    graph = build_graph(tiny_data, edge_pad_multiple=256)
    model = build_model(ModelConfig(num_layers=1, embedding_dim=8), graph)
    params = model.init_params(jax.random.key(0))
    base = Evaluator(tiny_data, model, EvalConfig(test_batch=8, topks=(10,))).run(params)
    # interpreter-mode pallas on CPU: monkeypatch interpret default via flag
    import gsrs_tpu.ops.pallas_kernels as pk
    import functools
    orig = pk.masked_scores_pallas
    pk.masked_scores_pallas = functools.partial(orig, block_b=8, block_m=256, interpret=True)
    try:
        fused = Evaluator(
            tiny_data, model,
            EvalConfig(test_batch=8, topks=(10,), use_pallas_scoring=True,
                       pallas_variant="natural"),
        ).run(params)
    finally:
        pk.masked_scores_pallas = orig
    for k in base:
        np.testing.assert_allclose(base[k], fused[k], atol=1e-6)


def test_evaluator_with_bitplane_scoring(tiny_data):
    import jax

    from gsrs_tpu.config import EvalConfig, ModelConfig
    from gsrs_tpu.data.adjacency import build_graph
    from gsrs_tpu.models.registry import build_model
    from gsrs_tpu.train.evaluator import Evaluator

    graph = build_graph(tiny_data, edge_pad_multiple=256)
    model = build_model(ModelConfig(num_layers=1, embedding_dim=8), graph)
    params = model.init_params(jax.random.key(0))
    base = Evaluator(tiny_data, model, EvalConfig(test_batch=8, topks=(10,))).run(params)
    import functools

    import gsrs_tpu.ops.pallas_kernels as pk
    orig = pk.masked_scores_bitplane_pallas
    pk.masked_scores_bitplane_pallas = functools.partial(
        orig, block_b=8, interpret=True
    )
    try:
        fused = Evaluator(
            tiny_data, model,
            EvalConfig(test_batch=8, topks=(10,), use_pallas_scoring=True),
        ).run(params)
    finally:
        pk.masked_scores_bitplane_pallas = orig
    for k in base:
        np.testing.assert_allclose(base[k], fused[k], atol=1e-6)


def test_bitplane_matches_natural_kernel(rng):
    """Bit-plane variant scores item perm[c] at column c; after applying
    the permutation it must equal the natural masked score matrix."""
    B, m, d, block_m = 8, 5000, 8, 4096
    m_pad = -(-m // block_m) * block_m  # 8192
    u = rng.standard_normal((B, d)).astype(np.float32)
    it = rng.standard_normal((m, d)).astype(np.float32)
    W = m_pad // 32
    rows = rng.integers(0, 2**32, (B, W), dtype=np.uint64).astype(np.uint32)
    # pad words (items >= m) all-ones so pad columns mask to NEG_INF
    full_words = m // 32
    rows[:, full_words] |= np.uint32(0xFFFFFFFF) << np.uint32(m % 32)
    rows[:, full_words + 1 :] = np.uint32(0xFFFFFFFF)
    it_pad = np.zeros((m_pad, d), np.float32)
    it_pad[:m] = it
    perm = bitplane_permutation(m_pad, block_m)
    got = np.asarray(
        masked_scores_bitplane_pallas(
            jnp.asarray(u),
            jnp.asarray(it_pad[perm]),
            jnp.asarray(rows),
            block_b=8,
            block_m=block_m,
            interpret=True,
        )
    )
    assert got.shape == (B, m_pad)
    expect = u @ it_pad.T
    bits = (
        (rows[:, np.arange(m_pad) // 32] >> (np.arange(m_pad) % 32).astype(np.uint32))
        & 1
    ).astype(bool)
    expect[bits] = NEG_INF
    np.testing.assert_allclose(got, expect[:, perm], atol=1e-4)
    # round-trip: top-1 indices map back to the natural argmax
    nat_best = expect[:, :m].argmax(1)
    kern_best = perm[got.argmax(1)]
    np.testing.assert_array_equal(kern_best, nat_best)


def test_masked_scores_ragged_batch(rng):
    """B not a multiple of block_b must pad internally, not floor-truncate
    the grid (which returned uninitialized rows)."""
    B, m, d = 13, 64, 8  # 13 % 8 != 0
    user_emb = rng.standard_normal((B, d)).astype(np.float32)
    item_emb = rng.standard_normal((m, d)).astype(np.float32)
    rows = np.zeros((B, m // 32), np.uint32)
    rows[0, 0] = 1  # mask item 0 for user 0
    got = np.asarray(
        masked_scores_pallas(
            jnp.asarray(user_emb), jnp.asarray(item_emb), jnp.asarray(rows),
            block_b=8, block_m=64, interpret=True,
        )
    )
    assert got.shape == (B, m)
    ref = user_emb @ item_emb.T
    ref[0, 0] = float(NEG_INF)
    np.testing.assert_allclose(got, ref, rtol=1e-5)
