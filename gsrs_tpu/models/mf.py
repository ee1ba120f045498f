"""Pure matrix factorization baseline.

The reference registry reserves a 'mf' slot for a `PureMF` class that was
deleted from its model.py (reference code/register.py:40-47 guards on the
attribute existing, so only 'lgn' is live there). Provided here as a real
model: BPR-trained embedding dot products with no graph propagation —
equivalent to LightGCN with zero layers, which is exactly how it is
implemented, sharing every downstream code path (sampler, trainer, eval,
sharding)."""

from __future__ import annotations

import dataclasses

from gsrs_tpu.config import ModelConfig
from gsrs_tpu.data.adjacency import BipartiteGraph
from gsrs_tpu.models.lightgcn import LightGCN


class PureMF(LightGCN):
    def __init__(self, cfg: ModelConfig, graph: BipartiteGraph, i2i=None, ell=None):
        cfg = dataclasses.replace(
            cfg, num_layers=0, use_item_item=False, dropout=False
        )
        super().__init__(cfg, graph, i2i=None, ell=None)
