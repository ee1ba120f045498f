"""Test harness: force an 8-device virtual CPU mesh before JAX loads.

The reference has no tests at all (SURVEY.md §4); this suite is built to
the plan there — golden math vs scipy/numpy oracles, sampler distribution
checks, end-to-end tiny training, and multi-device sharding validated on
forced CPU device counts."""

import os

# Hard override: the driver environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel), and /root/.axon_site/sitecustomize.py registers the axon
# PJRT plugin + remote-compile hooks whenever PALLAS_AXON_POOL_IPS is set.
# Those hooks run at interpreter start — before this file — and route every
# XLA compile (even CPU) through the tunnel's HTTP compile service, making
# CPU tests pathologically slow. In-process env edits are too late, so if
# we detect the contaminated interpreter, re-exec pytest with a clean env.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    import stat
    import sys

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # falsy → sitecustomize skips register
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # By conftest-load time pytest's capture manager has already dup2'd
    # fd 1/2 into its own temp files, which die with this process — the
    # re-exec'd run would be silent. Point fd 1/2 back at the original
    # terminal/pipe (the lowest inherited pipe/tty fd) so output survives.
    try:
        for fd in sorted(int(x) for x in os.listdir("/proc/self/fd")):
            if fd <= 2:
                continue
            mode = os.fstat(fd).st_mode
            try:
                target = os.readlink(f"/proc/self/fd/{fd}")
            except OSError:
                target = ""
            # The original stdout/stderr are a pipe, tty, or a redirect to a
            # regular file. Exclude /dev/null ("discarded on purpose"),
            # pytest's own capture temp files (unlinked → "(deleted)"), and
            # anything not opened writable (a read-only data file held by an
            # imported library must never become stdout).
            import fcntl

            try:
                writable = (
                    fcntl.fcntl(fd, fcntl.F_GETFL) & os.O_ACCMODE
                ) != os.O_RDONLY
            except OSError:
                writable = False
            ok = writable and (
                stat.S_ISFIFO(mode)
                or (stat.S_ISCHR(mode) and not target.startswith("/dev/null"))
                or (stat.S_ISREG(mode) and "(deleted)" not in target)
            )
            if ok:
                os.dup2(fd, 1)
                os.dup2(fd, 2)
                break
    except OSError:
        pass
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

from gsrs_tpu.data.dataset import InteractionData


def random_interactions(
    rng: np.random.Generator,
    n_users: int = 40,
    m_items: int = 60,
    density: float = 0.08,
    with_test: bool = True,
) -> InteractionData:
    """Small random bipartite dataset; every user gets ≥1 train positive."""
    mask = rng.random((n_users, m_items)) < density
    mask[np.arange(n_users), rng.integers(0, m_items, n_users)] = True
    u, i = np.nonzero(mask)
    test_dict = {}
    if with_test:
        # hold out one extra (unseen) item per even user
        for user in range(0, n_users, 2):
            neg = np.flatnonzero(~mask[user])
            if neg.size:
                test_dict[user] = np.array([rng.choice(neg)], dtype=np.int64)
    return InteractionData(
        name="synthetic-test",
        n_users=n_users,
        m_items=m_items,
        train_users=u.astype(np.int64),
        train_items=i.astype(np.int64),
        test_dict=test_dict,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(2020)


@pytest.fixture
def tiny_data(rng):
    return random_interactions(rng)
