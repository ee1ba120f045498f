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
from gsrs_tpu.models.ultragcn import UltraGCN
from gsrs_tpu.models.xsimgcl import XSimGCL
from gsrs_tpu.ops.ell import EllGraph

MODELS = {
    "lgn": LightGCN,
    "mf": PureMF,
    "ngcf": NGCF,
    "xsimgcl": XSimGCL,
    "ultragcn": UltraGCN,
}


def build_model(
    cfg: ModelConfig,
    graph: BipartiteGraph,
    i2i: Optional[ItemItemGraph] = None,
    ell: Optional[EllGraph] = None,
    cache_dir: Optional[str] = None,
) -> LightGCN:
    """``cache_dir`` (usually the dataset dir) lets models with heavy
    host-side precompute (UltraGCN's item–item top-K) cache it on disk."""
    if cfg.model not in MODELS:
        raise ValueError(
            f"model '{cfg.model}' is not registered; available: "
            f"{sorted(MODELS)} (cf. reference code/register.py:50-55)"
        )
    if cfg.model == "ultragcn":
        return UltraGCN(cfg, graph, i2i, ell, ii_cache_dir=cache_dir)
    return MODELS[cfg.model](cfg, graph, i2i, ell)


SEQ_MODELS = ("sasrec", "gru4rec", "bert4rec")


def build_seq_model(
    kind: str,
    m_items: int,
    max_len: int = 50,
    dim: int = 64,
    hidden: int = 64,
    blocks: int = 2,
    heads: int = 1,
    dropout: float = 0.2,
    bf16: bool = False,
    mask_prob: float = 0.3,
    last_only_prob: float = 0.6,
):
    """Factory for the sequential family (SASRec / GRU4Rec / BERT4Rec) —
    the one place that maps the flat CLI/serving hyperparameters onto each
    model's config dataclass. All three share the inference surface
    ``score_catalog(params, seqs) -> (B, m_items)`` over real 0-based ids."""
    if kind == "sasrec":
        from gsrs_tpu.models.sasrec import SASRec, SASRecConfig

        return SASRec(
            SASRecConfig(
                m_items=m_items,
                max_len=max_len,
                embedding_dim=dim,
                num_blocks=blocks,
                num_heads=heads,
                ffn_hidden=hidden,
                dropout_rate=dropout,
                bf16_compute=bf16,
            )
        )
    if kind == "bert4rec":
        from gsrs_tpu.models.bert4rec import BERT4Rec, BERT4RecConfig

        return BERT4Rec(
            BERT4RecConfig(
                m_items=m_items,
                max_len=max_len,
                embedding_dim=dim,
                num_blocks=blocks,
                num_heads=heads,
                ffn_hidden=hidden,
                dropout_rate=dropout,
                mask_prob=mask_prob,
                last_only_prob=last_only_prob,
                bf16_compute=bf16,
            )
        )
    if kind == "gru4rec":
        from gsrs_tpu.models.gru4rec import GRU4Rec, GRU4RecConfig

        return GRU4Rec(
            GRU4RecConfig(
                m_items=m_items,
                max_len=max_len,
                embedding_dim=dim,
                hidden_dim=hidden,
                num_layers=blocks,
                dropout_rate=dropout,
                bf16_compute=bf16,
            )
        )
    raise ValueError(
        f"sequential model '{kind}' is not registered; available: "
        f"{sorted(SEQ_MODELS)}"
    )


def seq_model_meta(model) -> dict:
    """Flat hyperparameter dict for a sequential model instance — the
    inverse of `build_seq_model`, used to persist the exact training
    config next to checkpoints (some fields, e.g. num_heads, do not
    affect parameter shapes, so a wrong value at export time would
    corrupt serving silently rather than fail loudly)."""
    c = model.cfg
    kind = type(model).__name__.lower()
    return {
        "kind": kind,
        "m_items": int(c.m_items),
        "max_len": int(c.max_len),
        "dim": int(c.embedding_dim),
        "hidden": int(getattr(c, "ffn_hidden", 0) or getattr(c, "hidden_dim", 0)),
        "blocks": int(getattr(c, "num_blocks", 0) or getattr(c, "num_layers", 0)),
        "heads": int(getattr(c, "num_heads", 1)),
    }
