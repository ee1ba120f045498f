"""BPR triplet sampling.

Three interchangeable implementations of the reference sampler contract —
produce (user, positive, negative) triplets with users uniform over users
that have at least one positive, positives uniform over the user's
positive list, negatives uniform over the catalog excluding the user's
positives (reference code/utils.py:68-110, code/sources/sampling.cpp:27-56):

1. `DeviceSampler` (default): fully on-device, shape-static, rejection-free
   in expectation — draws NEG_CANDIDATES negatives per triplet and picks
   the first non-positive via an O(1) packed-bitset membership test. No
   host↔device traffic and no data-dependent control flow, so it fuses
   into the jitted train step.
2. The native C++ host sampler (`gsrs_tpu.native`), mirroring the
   reference's compiled path for CPU parity runs.
3. `sample_triplets_python`: pure numpy fallback with the same dispatch
   role as reference code/utils.py:84-110.

Dispatch order (compiled path, then Python fallback) mirrors reference
code/utils.py:25-34,68-81.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsrs_tpu.data.dataset import InteractionData
from gsrs_tpu.ops.bitset import bitset_lookup, build_bitset

# With candidates drawn uniformly over the catalog, the chance that all C
# candidates hit the user's positive set is (deg_u/m)^C; at Gowalla-like
# density (~1e-3) even C=4 gives ~1e-12. C=16 keeps the worst realistic
# user (deg/m ≈ 0.25) below 1e-9.
NEG_CANDIDATES = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SamplerState:
    """Device-resident structures for on-device triplet sampling."""

    pos_indptr: jax.Array  # (n_users+1,) int32 CSR offsets into pos_items
    pos_items: jax.Array  # (N,) int32 concatenated per-user positives
    valid_users: jax.Array  # (n_valid_pad,) int32 users with ≥1 positive
    train_bitset: jax.Array  # (n_users, W) uint32 packed positives
    n_valid: int = dataclasses.field(metadata=dict(static=True))
    m_items: int = dataclasses.field(metadata=dict(static=True))


def make_sampler_state(data: InteractionData) -> SamplerState:
    net = data.user_item_net
    valid = np.flatnonzero(data.user_degrees > 0).astype(np.int32)
    n_valid = int(valid.size)
    # pad valid_users to a power-of-two-ish static size (content repeats)
    pad = max(1, 1 << (n_valid - 1).bit_length()) if n_valid else 1
    valid_p = np.resize(valid, pad)
    return SamplerState(
        pos_indptr=net.indptr.astype(np.int32),
        pos_items=net.indices.astype(np.int32),
        valid_users=valid_p,
        train_bitset=build_bitset(
            data.train_users, data.train_items, data.n_users, data.m_items,
            real_m_items=data.real_m_items,
        ),
        n_valid=n_valid,
        m_items=data.m_items,
    )


@partial(jax.jit, static_argnames=("num_samples", "neg_candidates"))
def sample_triplets(
    key: jax.Array,
    state: SamplerState,
    num_samples: int,
    neg_candidates: int = NEG_CANDIDATES,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Draw `num_samples` (user, pos, neg) triplets on device.

    ``neg_candidates`` trades sampler cost for the all-candidates-
    positive bias floor: the sampler is the dominant per-triplet cost of
    the L0 train base (BENCH_NOTES round-5 roofline — ~19 gathers + ~18
    RNG ints per triplet at the default 16), and each candidate costs
    one bitset gather + one random int32. At Gowalla-like density
    (deg/m ~ 1e-3) C=4 keeps the bias below 1e-12 per triplet.

    ``neg_candidates=0`` is the UNCHECKED mode: one uniform draw per
    triplet with no bitset membership test at all. The triplet is then
    a (user, pos, pos') pair with probability deg_u/m (~6.6e-4 at mean
    Gowalla degree) — the standard industrial BPR shortcut (the
    reference's host sampler rejects instead, reference
    code/sources/sampling.cpp). Measured end-to-end at the b131072
    headline config it is 20% faster (0.26 vs 0.33 s/epoch) but lands
    BELOW the reference quality bar (best recall@20 0.18190 vs the
    published 0.1824 — results/b131072-tiledc0*), so it is an explicit
    opt-in for throughput-over-quality deployments, never a default."""
    k_user, k_pos, k_neg = jax.random.split(key, 3)
    u_idx = jax.random.randint(k_user, (num_samples,), 0, state.n_valid)
    users = state.valid_users[u_idx]

    start = state.pos_indptr[users]
    degree = state.pos_indptr[users + 1] - start
    pos_off = jax.random.randint(k_pos, (num_samples,), 0, jnp.iinfo(jnp.int32).max)
    positives = state.pos_items[start + pos_off % degree]

    if neg_candidates == 0:
        negatives = jax.random.randint(
            k_neg, (num_samples,), 0, state.m_items, dtype=jnp.int32
        )
        return users, positives, negatives

    cands = jax.random.randint(
        k_neg, (num_samples, neg_candidates), 0, state.m_items, dtype=jnp.int32
    )
    is_pos = bitset_lookup(state.train_bitset, users[:, None], cands)
    # First non-positive candidate; if (astronomically unlikely) all are
    # positives, argmax returns 0 and we accept a positive as negative for
    # that one triplet — a vanishing bias the reference's rejection loop
    # avoids at the cost of unbounded host-side looping.
    first_ok = jnp.argmax(~is_pos, axis=1)
    negatives = jnp.take_along_axis(cands, first_ok[:, None], axis=1)[:, 0]
    return users, positives, negatives


@partial(jax.jit, static_argnames=("num_samples",))
def sample_pairs_by_edge(
    key: jax.Array, state: SamplerState, num_samples: int
) -> Tuple[jax.Array, jax.Array]:
    """Draw (user, pos) pairs uniformly over *interactions* (edges), not
    users — each epoch visits positives proportional to user degree, the
    convention of models trained per-interaction (UltraGCN's objective
    weights assume it; BPR's reference sampler is user-uniform instead).
    Rejection-free: edge index → user via one vectorized binary search
    over the CSR offsets."""
    e = jax.random.randint(
        key, (num_samples,), 0, state.pos_items.shape[0], dtype=jnp.int32
    )
    users = (
        jnp.searchsorted(state.pos_indptr, e, side="right").astype(jnp.int32)
        - 1
    )
    return users, state.pos_items[e]


def sample_triplets_python(
    rng: np.random.Generator, data: InteractionData, num_samples: int
) -> np.ndarray:
    """Numpy fallback, same contract as reference code/utils.py:84-110:
    returns an (S, 3) int array of [user, pos, neg] rows. Users with no
    positives are skipped (so S ≤ num_samples), matching the reference."""
    users = rng.integers(0, data.n_users, num_samples)
    rows = []
    net = data.user_item_net
    # negatives draw over the REAL catalog: padded phantom ids
    # (pad_nodes_to_multiple) correspond to no item
    real_m = data.real_m_items or data.m_items
    for u in users:
        s, e = net.indptr[u], net.indptr[u + 1]
        if s == e:
            continue
        # a user whose positives cover the whole catalog has no valid
        # negative — skip instead of spinning in the rejection loop
        if e - s >= real_m:
            continue
        pos = net.indices[s + rng.integers(0, e - s)]
        while True:
            neg = int(rng.integers(0, real_m))
            if not np.any(net.indices[s:e] == neg):
                break
        rows.append((u, pos, neg))
    return np.asarray(rows, dtype=np.int64).reshape(-1, 3)


def sample_triplets_host(
    data: InteractionData, num_samples: int, seed: int = 2020
) -> np.ndarray:
    """Host-side sampling with the reference's compiled-path dispatch
    (reference code/utils.py:68-81): native C++ sampler if the toolchain
    is available, else the Python fallback. Returns (S, 3) int64 rows of
    [user, pos, neg]. Note the native path follows the reference C++
    round-robin-over-users semantics (code/sources/sampling.cpp:31-44),
    the Python path the uniform-user semantics (code/utils.py:84-110)."""
    from gsrs_tpu.native import load_native_sampler

    native = load_native_sampler()
    if native is not None:
        native.seed(seed)
        net = data.user_item_net
        return native.sample_negative(
            data.n_users,
            # real catalog only: padded phantom ids are not valid negatives
            data.real_m_items or data.m_items,
            num_samples,
            net.indptr,
            net.indices,
            neg_num=1,
        )
    return sample_triplets_python(
        np.random.default_rng(seed), data, num_samples
    )


def sample_epoch(
    key: jax.Array,
    state: SamplerState,
    epoch_size: int,
    batch_size: int,
    by_edge: bool = False,
    neg_candidates: int = NEG_CANDIDATES,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample a whole epoch of triplets, rounded up to full batches and
    reshaped (num_batches, batch_size). The reference shuffles and yields a
    ragged tail batch (code/utils.py:135-151) which forces shape-varying
    steps; we round up instead — every batch is full and identically
    shaped, so one compiled step serves the whole run.

    ``by_edge=True`` draws (user, pos) uniformly over interactions (see
    sample_pairs_by_edge) and fills the negative slot with the positive —
    for models that draw their own negatives in-loss (UltraGCN)."""
    num_batches = -(-epoch_size // batch_size)
    total = num_batches * batch_size
    if by_edge:
        u, p = sample_pairs_by_edge(key, state, total)
        n = p
    else:
        u, p, n = sample_triplets(key, state, total, neg_candidates)
    shape = (num_batches, batch_size)
    return u.reshape(shape), p.reshape(shape), n.reshape(shape)
