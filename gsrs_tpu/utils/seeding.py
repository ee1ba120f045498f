"""Seeding helpers (reference `set_seed`, code/utils.py:114-120).

JAX threading of explicit PRNG keys makes most global seeding moot; this
seeds the host-side libraries used around the jitted core (numpy RNG for
fallback samplers / data prep, the native C++ sampler, and torch if a
user mixes it in)."""

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
