"""Device mesh construction and multi-host runtime init.

The distributed layer has no reference counterpart (the reference is a
single-process, single-device trainer — SURVEY.md §2 parallelism
inventory); this is the TPU-native replacement for what a GPU port would
build on NCCL/torch.distributed: the JAX runtime over ICI/DCN with a
(data, model) mesh. The ``data`` axis shards the BPR batch (gradient
psum); the ``model`` axis shards embedding-table rows and the item
catalog (all-gather for propagation frontiers, sharded top-k merge for
retrieval)."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from gsrs_tpu.config import ParallelConfig


def distributed_init() -> None:
    """Initialize the multi-host JAX runtime when launched in a
    multi-host environment (no-op on a single host). Triggers on the
    explicit coordinator env var AND on the standard TPU-pod launch env
    (where ``jax.distributed.initialize()`` auto-detects its arguments)
    — without the latter, each pod host would silently train its own
    independent copy on a disjoint device mesh."""
    multi_host_env = (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    # Explicit launcher control: JAX's auto-detection only understands
    # SLURM/OMPI/GKE launchers, so a plain multi-process launch (ssh
    # loop, mpirun-less pod bring-up, or the 2-process CPU integration
    # test) passes coordinates through these env vars instead.
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("GSRS_NUM_PROCESSES") or os.environ.get(
        "JAX_NUM_PROCESSES"
    )
    pid = os.environ.get("GSRS_PROCESS_ID") or os.environ.get(
        "JAX_PROCESS_ID"
    )
    if addr and (nproc is None) != (pid is None):
        # A partial explicit config is almost certainly a launcher bug:
        # falling through to auto-detection would silently degrade a
        # plain ssh-loop launch to N independent single-process runtimes.
        raise RuntimeError(
            "JAX_COORDINATOR_ADDRESS is set but only one of "
            "GSRS_NUM_PROCESSES/GSRS_PROCESS_ID (or JAX_*) is present — "
            "set both (explicit launcher) or neither (auto-detect)"
        )
    if addr and nproc is not None and pid is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(nproc),
                process_id=int(pid),
            )
            return
        except RuntimeError as e:
            if "already initialized" in str(e).lower():
                print(f"[mesh] jax.distributed already initialized: {e}")
                return
            raise
    if multi_host_env:
        try:
            jax.distributed.initialize()
        except RuntimeError as e:
            # tolerate ONLY the repeat-call case; a genuine init failure
            # must not degrade into N independent single-host trainings
            # (the exact split-brain this function exists to prevent)
            if "already initialized" in str(e).lower():
                print(f"[mesh] jax.distributed already initialized: {e}")
            else:
                raise


def make_mesh(
    cfg: Optional[ParallelConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: Optional[int] = None,
    model_axis: Optional[int] = None,
) -> Mesh:
    cfg = cfg or ParallelConfig()
    data_axis = cfg.data_axis if data_axis is None else data_axis
    model_axis = cfg.model_axis if model_axis is None else model_axis
    devices = list(devices if devices is not None else jax.devices())
    need = data_axis * model_axis
    if need > len(devices):
        raise ValueError(
            f"mesh {data_axis}x{model_axis} needs {need} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.asarray(devices[:need]).reshape(data_axis, model_axis)
    return Mesh(dev_array, cfg.axis_names)


def single_device_mesh() -> Mesh:
    """The degenerate 1×1 mesh: single-chip training is just the
    distributed path with trivial collectives."""
    return make_mesh(ParallelConfig(data_axis=1, model_axis=1))
