"""Model registry.

Same role as the reference's `register.MODELS` dict + name validation
(reference code/register.py:40-55), without the import-time dataset
side effect (reference code/register.py:35-37)."""

from __future__ import annotations

from typing import Optional

from gsrs_tpu.config import ModelConfig
from gsrs_tpu.data.adjacency import BipartiteGraph
from gsrs_tpu.models.lightgcn import ItemItemGraph, LightGCN
from gsrs_tpu.models.mf import PureMF
from gsrs_tpu.models.ngcf import NGCF
from gsrs_tpu.models.xsimgcl import XSimGCL
from gsrs_tpu.ops.ell import EllGraph

MODELS = {
    "lgn": LightGCN,
    "mf": PureMF,
    "ngcf": NGCF,
    "xsimgcl": XSimGCL,
}


def build_model(
    cfg: ModelConfig,
    graph: BipartiteGraph,
    i2i: Optional[ItemItemGraph] = None,
    ell: Optional[EllGraph] = None,
) -> LightGCN:
    if cfg.model not in MODELS:
        raise ValueError(
            f"model '{cfg.model}' is not registered; available: "
            f"{sorted(MODELS)} (cf. reference code/register.py:50-55)"
        )
    return MODELS[cfg.model](cfg, graph, i2i, ell)
