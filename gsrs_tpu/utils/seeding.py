"""Seeding helpers (reference `set_seed`, code/utils.py:114-120).

JAX threading of explicit PRNG keys makes most global seeding moot; this
seeds the host-side GLOBAL RNGs used around the jitted core (the legacy
``np.random`` global, ``random``, the native C++ sampler, and torch if a
user mixes it in). Helpers that take an explicit
``np.random.Generator`` (`ops.sampling.sample_triplets_python`,
`utils.batching.shuffle`) are NOT affected by this — pass them
``np.random.default_rng(seed)`` for reproducibility. Called at CLI
startup (cf. reference code/main.py:136)."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    try:
        from gsrs_tpu.native import load_native_sampler

        native = load_native_sampler()
        if native is not None:
            native.seed(seed)
    except Exception:
        pass
    try:  # torch is present in the image but optional for this framework
        import torch

        torch.manual_seed(seed)
    except Exception:
        pass
