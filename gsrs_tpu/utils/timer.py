"""Working phase timer + jax.profiler hooks.

The reference ships a broken timer stub whose context-manager protocol is
missing entirely (reference code/utils.py:155-169, crashing the dead
BPR_train_original path, code/Procedure.py:50,81-82); its live profiling
is wall-clock deltas logged into CSV ``time_sec`` columns
(code/main.py:215,230-233). This module provides the same named-tape
surface, actually working, plus a `jax.profiler` trace context for real
TPU profiles."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Timer:
    """Named accumulating timer: ``with Timer.named("sample"): ...``;
    `Timer.dict()` returns accumulated seconds; `Timer.zero()` resets —
    the API the reference's dead code expected of its stub."""

    NAMED_TAPE: Dict[str, float] = defaultdict(float)
    _COUNTS: Dict[str, int] = defaultdict(int)

    def __init__(self, name: Optional[str] = None):
        self.name = name
        self._t0 = 0.0

    @classmethod
    def named(cls, name: str) -> "Timer":
        return cls(name)

    def __enter__(self) -> "Timer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        dt = time.perf_counter() - self._t0
        if self.name is not None:
            Timer.NAMED_TAPE[self.name] += dt
            Timer._COUNTS[self.name] += 1
        self.elapsed = dt

    @classmethod
    def dict(cls) -> Dict[str, float]:
        return dict(cls.NAMED_TAPE)

    @classmethod
    def counts(cls) -> Dict[str, int]:
        return dict(cls._COUNTS)

    @classmethod
    def zero(cls) -> None:
        cls.NAMED_TAPE.clear()
        cls._COUNTS.clear()

    @classmethod
    def summary(cls) -> str:
        return " | ".join(
            f"{k}: {v:.3f}s/{cls._COUNTS[k]}" for k, v in sorted(cls.NAMED_TAPE.items())
        )


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
