"""Golden tests for the scatter-free ELL SpMM (gsrs_tpu.ops.ell) vs the
dense reference-math oracle and the segment-sum path."""

import jax
import numpy as np

from gsrs_tpu.data.adjacency import (
    build_graph,
    dense_normalized_adjacency,
    normalized_edge_weights,
)
from gsrs_tpu.ops.ell import (
    build_ell_graph,
    ell_from_graph,
    ell_from_interactions,
    ell_propagate_layer,
)
from gsrs_tpu.ops.spmm import propagate_layer


def _ell(data):
    return ell_from_interactions(data)


def test_ell_forward_matches_dense(tiny_data, rng):
    ell = _ell(tiny_data)
    A = dense_normalized_adjacency(tiny_data)
    n = tiny_data.n_users
    u = rng.standard_normal((n, 8)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 8)).astype(np.float32)
    nu, ni = ell_propagate_layer(ell, u, i, None)
    expect = A @ np.concatenate([u, i])
    np.testing.assert_allclose(np.asarray(nu), expect[:n], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ni), expect[n:], atol=1e-5)


def test_ell_matches_segment_path(tiny_data, rng):
    """The two SpMM implementations must agree to float tolerance."""
    g = build_graph(tiny_data, edge_pad_multiple=64)
    ell = _ell(tiny_data)
    u = rng.standard_normal((tiny_data.n_users, 8)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 8)).astype(np.float32)
    seg_u, seg_i = propagate_layer(g, u, i)
    ell_u, ell_i = ell_propagate_layer(ell, u, i, None)
    np.testing.assert_allclose(np.asarray(ell_u), np.asarray(seg_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ell_i), np.asarray(seg_i), atol=1e-5)


def test_ell_custom_vjp_matches_dense(tiny_data, rng):
    ell = _ell(tiny_data)
    A = jax_dense = dense_normalized_adjacency(tiny_data).astype(np.float32)
    n = tiny_data.n_users
    u = rng.standard_normal((n, 4)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 4)).astype(np.float32)

    def loss_ell(u, i):
        nu, ni = ell_propagate_layer(ell, u, i, None)
        return (nu ** 2).sum() + (ni * 3).sum()

    import jax.numpy as jnp

    def loss_dense(u, i):
        y = jnp.asarray(A) @ jnp.concatenate([u, i])
        return (y[:n] ** 2).sum() + (y[n:] * 3).sum()

    g_ell = jax.grad(loss_ell, argnums=(0, 1))(u, i)
    g_dense = jax.grad(loss_dense, argnums=(0, 1))(u, i)
    np.testing.assert_allclose(np.asarray(g_ell[0]), np.asarray(g_dense[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_ell[1]), np.asarray(g_dense[1]), atol=2e-4)


def test_ell_from_graph_equals_from_interactions(tiny_data, rng):
    g = build_graph(tiny_data, edge_pad_multiple=64)
    e1 = ell_from_graph(g)
    e2 = ell_from_interactions(tiny_data)
    u = rng.standard_normal((tiny_data.n_users, 4)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 4)).astype(np.float32)
    o1 = ell_propagate_layer(e1, u, i, None)
    o2 = ell_propagate_layer(e2, u, i, None)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1[1]), np.asarray(o2[1]), atol=1e-6)


def test_ell_edge_mask_consistency(tiny_data, rng):
    """A canonical-order edge mask must zero the same edges in both
    directions: masking edge e kills its contribution to new_u AND new_i."""
    ell = _ell(tiny_data)
    n_edges = tiny_data.train_size
    # drop everything except edge 0
    mask = np.zeros(n_edges, np.float32)
    mask[0] = 1.0
    u = rng.standard_normal((tiny_data.n_users, 4)).astype(np.float32)
    i = rng.standard_normal((tiny_data.m_items, 4)).astype(np.float32)
    nu, ni = ell_propagate_layer(ell, u, i, mask)
    w = normalized_edge_weights(
        tiny_data.train_users,
        tiny_data.train_items,
        tiny_data.user_degrees,
        tiny_data.item_degrees,
    )
    u0, i0 = tiny_data.train_users[0], tiny_data.train_items[0]
    expect_u = np.zeros_like(u[:, :])
    expect_u[u0] = w[0] * i[i0]
    expect_i = np.zeros_like(i[:, :])
    expect_i[i0] = w[0] * u[u0]
    np.testing.assert_allclose(np.asarray(nu), expect_u, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ni), expect_i, atol=1e-6)


def test_ell_bucket_shapes_cover_all_edges(tiny_data):
    ell = _ell(tiny_data)
    w = normalized_edge_weights(
        tiny_data.train_users,
        tiny_data.train_items,
        tiny_data.user_degrees,
        tiny_data.item_degrees,
    )
    # BOTH directions must carry every edge exactly once (padding is
    # zero-weight, so total weight is the invariant)
    for side, n_rows in (
        (ell.by_user, tiny_data.n_users),
        (ell.by_item, tiny_data.m_items),
    ):
        assert side.assemble.shape == (n_rows,)
        total_w = sum(float(np.asarray(b.w).sum()) for b in side.buckets)
        np.testing.assert_allclose(total_w, w.sum(), rtol=1e-5)


def test_mega_row_splitting_matches_unsplit(rng):
    """Rows wider than max_width split into overflow chunks summed back
    via extra_dst/extra_pos — output must equal the unsplit build (and
    the mega-hub bucket shapes stay <= max_width). Round-3 fix for the
    yelp-scale TPU-worker crash (a 540k-degree synthetic hub produced a
    (1, 2^20)-wide bucket whose compiled gather faulted the worker)."""
    import jax.numpy as jnp

    n_u, m_i, d = 40, 300, 8
    rng_ = np.random.default_rng(7)
    # user 3 is a mega-hub: degree 250 >> max_width=32
    hub_items = rng_.choice(m_i, 250, replace=False)
    other_u = rng_.integers(0, n_u, 400)
    other_i = rng_.integers(0, m_i, 400)
    users = np.concatenate([np.full(250, 3), other_u]).astype(np.int64)
    items = np.concatenate([hub_items, other_i]).astype(np.int64)
    w = rng_.random(users.size).astype(np.float32)

    ref = build_ell_graph(users, items, w, n_u, m_i)  # default: no split
    split = build_ell_graph(users, items, w, n_u, m_i, max_width=32)
    assert split.by_user.extra_dst is not None
    assert all(b.cols.shape[1] <= 32 for b in split.by_user.buckets)

    u = rng.standard_normal((n_u, d)).astype(np.float32)
    i = rng.standard_normal((m_i, d)).astype(np.float32)
    ru, ri = ell_propagate_layer(ref, jnp.asarray(u), jnp.asarray(i), None)
    su, si = ell_propagate_layer(split, jnp.asarray(u), jnp.asarray(i), None)
    np.testing.assert_allclose(np.asarray(su), np.asarray(ru), atol=1e-4)
    np.testing.assert_allclose(np.asarray(si), np.asarray(ri), atol=1e-4)

    # backward (custom VJP routes through the opposite side's layout)
    def f(g, u, i):
        nu, ni = ell_propagate_layer(g, u, i, None)
        return (nu**2).sum() + jnp.sin(ni).sum()

    gu_r, gi_r = jax.grad(f, argnums=(1, 2))(ref, jnp.asarray(u), jnp.asarray(i))
    gu_s, gi_s = jax.grad(f, argnums=(1, 2))(split, jnp.asarray(u), jnp.asarray(i))
    np.testing.assert_allclose(np.asarray(gu_s), np.asarray(gu_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gi_s), np.asarray(gi_r), atol=1e-4)

    # hash dropout must see REAL dst ids on overflow chunks — split and
    # unsplit builds must drop the same edge set (fwd and bwd)
    from gsrs_tpu.ops.hashdrop import hashdrop_from_key

    drop = hashdrop_from_key(jax.random.key(3), 0.6)
    du, di = ell_propagate_layer(ref, jnp.asarray(u), jnp.asarray(i), None, drop)
    su2, si2 = ell_propagate_layer(split, jnp.asarray(u), jnp.asarray(i), None, drop)
    np.testing.assert_allclose(np.asarray(su2), np.asarray(du), atol=1e-4)
    np.testing.assert_allclose(np.asarray(si2), np.asarray(di), atol=1e-4)

    def fd(g, u, i):
        nu, ni = ell_propagate_layer(g, u, i, None, drop)
        return (nu**2).sum() + jnp.sin(ni).sum()

    gdu_r, gdi_r = jax.grad(fd, argnums=(1, 2))(ref, jnp.asarray(u), jnp.asarray(i))
    gdu_s, gdi_s = jax.grad(fd, argnums=(1, 2))(split, jnp.asarray(u), jnp.asarray(i))
    np.testing.assert_allclose(np.asarray(gdu_s), np.asarray(gdu_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gdi_s), np.asarray(gdi_r), atol=1e-4)

    # non-pow2 max_width rounds DOWN so the cap still holds
    split100 = build_ell_graph(users, items, w, n_u, m_i, max_width=100)
    assert all(b.cols.shape[1] <= 100 for b in split100.by_user.buckets)


def test_mega_row_splitting_pad_and_shard(rng):
    """pad_ell_graph must remap extra_pos; shard_ell_graph must route
    each overflow chunk to its owner shard (local apply + sum over
    shards == unsharded)."""
    import jax.numpy as jnp

    from gsrs_tpu.ops.ell import (
        apply_sharded_side_local,
        pad_ell_graph,
        shard_ell_graph,
    )

    n_u, m_i, d = 24, 120, 8
    rng_ = np.random.default_rng(8)
    hub_items = rng_.choice(m_i, 90, replace=False)
    users = np.concatenate([np.full(90, 5), rng_.integers(0, n_u, 200)])
    items = np.concatenate([hub_items, rng_.integers(0, m_i, 200)])
    w = rng_.random(users.size).astype(np.float32)
    split = build_ell_graph(
        users.astype(np.int64), items.astype(np.int64), w, n_u, m_i,
        max_width=16,
    )
    u = jnp.asarray(rng.standard_normal((n_u, d)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((m_i, d)).astype(np.float32))
    ref_u, ref_i = ell_propagate_layer(split, u, x, None)

    padded = pad_ell_graph(split, 4)
    pu, pi = ell_propagate_layer(padded, u, x, None)
    np.testing.assert_allclose(np.asarray(pu), np.asarray(ref_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(ref_i), atol=1e-5)

    sell = shard_ell_graph(split, 4)
    for side, src, ref in ((sell.by_user, x, ref_u), (sell.by_item, u, ref_i)):
        acc = np.zeros(ref.shape, np.float32)
        for s in range(4):
            cols = tuple(
                c.reshape(4, -1, c.shape[1])[s] for c in side.cols
            )
            ws = tuple(c.reshape(4, -1, c.shape[1])[s] for c in side.w)
            es = tuple(c.reshape(4, -1, c.shape[1])[s] for c in side.eidx)
            acc += np.asarray(
                apply_sharded_side_local(
                    cols, ws, es, side.assemble[s], src, None,
                    side.extra_dst[s] if side.extra_dst is not None else None,
                    side.extra_pos[s] if side.extra_pos is not None else None,
                )
            )
        np.testing.assert_allclose(acc, np.asarray(ref), atol=1e-4)
