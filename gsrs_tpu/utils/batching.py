"""Host-side batching/shuffle helpers (reference code/utils.py:135-151).

The production path batches on device (`gsrs_tpu.ops.sampling.sample_epoch`
yields full, identically-shaped batches); these utilities exist for API
parity and host-side experimentation. Note the reference's `minibatch`
yields a ragged tail batch — kept here (callers that jit should pad or
drop it)."""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def minibatch(*tensors: np.ndarray, batch_size: int = 2048) -> Iterator:
    """Yield aligned slices of the inputs (ragged tail included, like
    reference code/utils.py:135-139)."""
    n = len(tensors[0])
    for start in range(0, n, batch_size):
        if len(tensors) == 1:
            yield tensors[0][start : start + batch_size]
        else:
            yield tuple(t[start : start + batch_size] for t in tensors)


def shuffle(
    *arrays: np.ndarray, rng: np.random.Generator | None = None
) -> Tuple[np.ndarray, ...]:
    """Unison shuffle (reference code/utils.py:142-151)."""
    if len({len(a) for a in arrays}) != 1:
        raise ValueError("all inputs must have the same length")
    rng = rng or np.random.default_rng()
    perm = rng.permutation(len(arrays[0]))
    out = tuple(a[perm] for a in arrays)
    return out[0] if len(out) == 1 else out
