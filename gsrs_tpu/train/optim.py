"""Optimizer assembly: Adam + MultiStepLR.

Mirrors the reference's torch Adam (reference code/utils.py:51) and
optional epoch-milestone MultiStepLR with gamma decay (reference
code/main.py:39-44), expressed as a single optax chain whose schedule is
step-indexed (milestone epoch × steps-per-epoch)."""

from __future__ import annotations

from typing import Tuple

import optax

from gsrs_tpu.config import TrainConfig


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    if not cfg.use_scheduler or not cfg.sched_milestones:
        return optax.constant_schedule(cfg.lr)
    boundaries = {
        int(m) * steps_per_epoch: cfg.sched_gamma for m in cfg.sched_milestones
    }
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(
    cfg: TrainConfig, steps_per_epoch: int
) -> Tuple[object, optax.Schedule]:
    sched = lr_schedule(cfg, steps_per_epoch)
    fused = getattr(cfg, "fused_adam", "off")
    if fused and fused != "off":
        from gsrs_tpu.train.fused_adam import FusedAdam

        return FusedAdam(schedule=sched, backend=fused), sched
    # torch.optim.Adam defaults: betas (0.9, 0.999), eps 1e-8 — optax matches.
    return optax.adam(learning_rate=sched), sched
