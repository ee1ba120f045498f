"""Frozen experiment configuration.

Replaces the reference's import-time global config (`world.config`,
reference code/world.py:57-105) with explicit immutable dataclasses.
Every hyperparameter / feature flag of the reference CLI
(reference code/parse.py:16-114) has a field here with the same default,
so the compatibility surface is complete; see `gsrs_tpu.cli` for the
argv mapping.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset location and ingestion options."""

    dataset: str = "gowalla"
    data_root: str = dataclasses.field(
        default_factory=lambda: os.path.join(_repo_root(), "data")
    )
    # Cache the normalized adjacency on disk (same role as the reference's
    # s_pre_adj_mat.npz cache, reference code/dataloader.py:213-237).
    cache_adjacency: bool = True
    # Pad edge count up to a multiple of this so jitted shapes stay static
    # across epochs/datasets (avoids XLA recompilation).
    edge_pad_multiple: int = 8192

    @property
    def dataset_dir(self) -> str:
        return os.path.join(self.data_root, self.dataset)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """LightGCN model family hyperparameters.

    Mirrors reference flags: --recdim, --layer, --dropout/--keepprob,
    --model (reference code/parse.py:22-33,106), pop-gate flags
    (reference code/parse.py:84-97) and item-item flags
    (reference code/parse.py:98-104).
    """

    model: str = "lgn"  # 'lgn' | 'mf'
    embedding_dim: int = 64  # --recdim
    num_layers: int = 3  # --layer
    # Edge dropout on the propagation graph. The reference parses these
    # flags but leaves propagation dropout as a TODO
    # (reference code/model.py:214); here it is implemented.
    dropout: bool = False
    keep_prob: float = 0.6
    # A_split / a_fold (reference code/parse.py:60-66) exist in the
    # reference for GPU memory folding; on TPU, sharding is handled by the
    # mesh (gsrs_tpu.parallel) so these are accepted and ignored.
    a_split: bool = False
    a_fold: int = 100

    # What the BPR L2 term regularizes. 'propagated' = the reference
    # fork's committed math (post-propagation batch embeddings,
    # reference code/model.py:125-134,173 — getEmbedding returns the
    # computer() outputs and reg uses them). 'ego' = upstream
    # LightGCN-pytorch's math (raw embedding-table rows), which is the
    # code that produced the published 0.1825 Gowalla recall@20 the
    # fork's README quotes; propagated-reg under-regularizes the raw
    # tables (layer-mean + D^-1/2 shrink norms) and measurably overfits
    # late on Gowalla (BENCH_NOTES).
    reg_mode: str = "propagated"  # 'propagated' | 'ego'

    # Popularity-gate fusion (reference code/model.py:65-96,139-157).
    use_pop_gate: bool = False
    pop_hidden: int = 32
    gate_hidden: int = 64
    gate_entropy_coeff: float = 1e-4
    pop_gate_temp: float = 1.0

    # Item-item co-occurrence graph fusion (reference code/model.py:98-109).
    use_item_item: bool = False
    i2i_path: Optional[str] = None
    i2i_alpha: float = 0.1

    # Personalised-PageRank layer weights: the reference keeps the flags but
    # the live model ignores them (reference code/parse.py:69-74 vs
    # code/model.py:222); accepted here for CLI parity, ignored likewise.
    use_ppr_weights: bool = False
    ppr_weights_path: Optional[str] = None
    exp_smooth_beta: float = 0.0

    # XSimGCL contrastive settings (model='xsimgcl' only; no reference
    # counterpart — the framework's beat-the-baseline graph model).
    cl_lambda: float = 0.2  # InfoNCE coefficient
    cl_temp: float = 0.2  # softmax temperature
    cl_eps: float = 0.2  # per-layer noise magnitude
    cl_layer: int = 1  # which layer provides the second view

    # UltraGCN settings (model='ultragcn' only; no reference counterpart —
    # a beyond-reference graph model, Mao et al. CIKM'21). Training uses NO
    # propagation: the graph enters only through precomputed constraint
    # weights, so every step is embedding gathers + MXU dots. Defaults are
    # the paper's Gowalla operating point.
    ug_neg_num: int = 1500  # negatives per positive pair
    ug_neg_weight: float = 300.0  # negative-loss weight (paper's w_neg)
    ug_w1: float = 1e-6  # positive loss: w1 + w2·β_ui
    ug_w2: float = 1.0
    ug_w3: float = 1e-6  # negative loss: w3 + w4·β_uj
    ug_w4: float = 1.0
    ug_lambda: float = 2.75  # item-item constraint loss coefficient
    ug_ii_k: int = 10  # neighbors kept per item in the i-i constraint
    ug_init_std: float = 1e-4  # embedding init std (paper: 1e-4)
    # 'none' = per-example negatives (the paper's objective);
    # 'batch' = one shared negative set per batch (fewer gathers/scatters,
    # slightly correlated negatives);
    # 'group' = one set per group of batch rows (ug_neg_groups groups) —
    # decorrelates most of 'batch' at a small gather cost;
    # 'full' = the closed-form expectation of the paper's estimator: the
    # negative term evaluated over the WHOLE catalog via one (B,d)×(d,m)
    # MXU matmul — zero sampling variance, ug_neg_num unused;
    # 'pool' = per-example DISTINCT negative subsets drawn from a shared
    # gathered pool of ug_neg_pool rows: one (B,d)×(d,P) matmul scores
    # the pool, then each example selects its own ug_neg_num entries by
    # index into the on-chip score matrix (no B·N table gathers). In
    # expectation identical to 'none' (every pool entry and every draw is
    # uniform over the catalog) but at 'batch'-like epoch cost — the
    # TPU-shaped form of the paper's per-example-draw regularization.
    ug_neg_sharing: str = "none"
    ug_neg_groups: int = 8  # groups per batch for ug_neg_sharing='group'
    ug_neg_pool: int = 8192  # shared pool size for ug_neg_sharing='pool'
    # Exclude each user's known train positives from the negative term
    # (the paper's sampling_sift_pos, evaluated EXACTLY: only available
    # with ug_neg_sharing='full', where the (B,m) score matrix is already
    # materialized and the sampler's packed train bitset masks it).
    ug_sift_pos: bool = False

    # Numerics: embeddings/optimizer state in fp32; propagation and scoring
    # matmuls may run in bf16 on the MXU when True.
    bf16_compute: bool = False

    # SpMM implementation for propagation: 'ell' (scatter-free bucketed
    # gather — gsrs_tpu.ops.ell), 'hybrid' (dense MXU blocks for the
    # top-`hybrid_cols` hub columns per direction + residual ELL —
    # gsrs_tpu.ops.hybrid, the fastest single-chip path on power-law
    # graphs) or 'segment' (segment-sum reference path — gsrs_tpu.ops.
    # spmm). Validated by LightGCN.__init__.
    # or 'tiled' (per-row-group hub blocks over a spectral cluster order
    # + residual ELL — gsrs_tpu.ops.tiled, the generalization of hybrid
    # that covers 77-86% of Gowalla edges at half the dense memory).
    spmm_mode: str = "ell"
    # Hub columns per direction for spmm_mode='hybrid' (rounded to a
    # multiple of 128; clipped to the catalog size).
    hybrid_cols: int = 8192
    # spmm_mode='tiled': row groups per direction and hub columns per
    # group (dense memory is (n+m)·tiled_cols·dtype, like hybrid's but
    # with per-group column sets).
    tiled_groups: int = 32
    tiled_cols: int = 4096


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization / loop hyperparameters (reference code/parse.py:17-45)."""

    batch_size: int = 2048  # --bpr_batch
    lr: float = 1e-3
    decay: float = 1e-4  # L2 coefficient applied to the BPR reg term
    epochs: int = 1000
    seed: int = 2020
    # MultiStepLR schedule (reference code/parse.py:76-82, code/main.py:39-44)
    use_scheduler: bool = False
    sched_milestones: Tuple[int, ...] = (120, 240, 360, 480)
    sched_gamma: float = 0.5
    # Checkpointing (reference code/parse.py:52-58,107-113)
    checkpoint_dir: str = dataclasses.field(
        default_factory=lambda: os.path.join(_repo_root(), "checkpoints")
    )
    save_every: int = 10
    keep_topk: int = 0  # prune best-* checkpoints beyond this many; 0 = keep all
    resume: bool = False
    resume_path: Optional[str] = None
    load_pretrained: bool = False  # --load
    pretrain: int = 0
    # Eval cadence: reference evaluates every 10 epochs (code/main.py:187)
    eval_every: int = 10
    # Early stopping: end training after this many consecutive evals
    # without an NDCG improvement (0 = off, the reference behavior —
    # it always runs all epochs and overfits past the peak).
    early_stop_evals: int = 0
    # Logging
    tensorboard: bool = True
    comment: str = "lgn"
    # Number of train steps fused into one jitted scan segment. Larger
    # values amortize dispatch; 0 = auto (whole epoch, capped at 128
    # steps per segment). One epoch-long scan is ONE device dispatch,
    # and long single executions fault the TPU worker — confirmed by
    # the round-4 controlled experiment (results/probe_flake_r4.log: a
    # ~240 s single-dispatch yelp-scale epoch faults 5/5, the identical
    # program auto-chunked at 128 steps passes 5/5; BENCH_NOTES
    # "Part 2"). The 128-step cap bounds the worst measured per-step
    # cost (~340 ms, amazon-scale ELL b2048) to well under a minute
    # per dispatch while leaving every headline Gowalla config
    # (b8192 = 99 steps, b16384 = 50) in a single segment.
    # NOTE (behavior change, round 3): 0 previously meant "whole epoch
    # in one scan"; it now caps at 128 steps/segment, which changes the
    # sampling RNG stream and buffer shapes for configs with >128
    # steps/epoch. Pass -1 to force the old uncapped single-scan
    # behavior (fault-reproduction / debugging only).
    steps_per_scan: int = 0
    # On-device sampler: negatives candidates drawn per triplet (each
    # costs one bitset gather + one random int32 — the sampler is the
    # dominant per-triplet cost of the train base, BENCH_NOTES round-5
    # roofline). All candidates landing in the user's positives falls
    # back to accepting a positive as negative for that triplet: at
    # density rho the per-triplet bias is rho^C — 16 keeps even a
    # pathological deg/m=0.25 user below 1e-9; 4 is ~1e-12 at real
    # Gowalla-like density and measurably cheaper. 0 = UNCHECKED uniform
    # draw (no bitset test at all; bias rho ~ 6.6e-4/triplet at Gowalla
    # — the standard industrial BPR shortcut). Measured at the b131072
    # headline config: 20% faster but BELOW the reference quality bar
    # (recall@20 0.18190 vs 0.1824 published, results/b131072-tiledc0*)
    # — an explicit throughput-over-quality opt-in, never a default.
    neg_candidates: int = 16
    # Cadence of the rolling 'last' checkpoint (epochs). 1 = every epoch
    # (the reference-faithful default, code/main.py:238); an Orbax write
    # costs ~1-2 s on this filesystem, which dominates wall time at
    # sub-second epochs — the round-5 quality queue runs use 25.
    # Best-NDCG and periodic legacy saves are unaffected; a final 'last'
    # save always happens when fit() exits.
    save_last_every: int = 1
    # Optimizer fusion: "off" = optax.adam chain (reference-equivalent,
    # code/utils.py:51), "jnp" = one fused expression per leaf, "pallas"
    # = explicit one-pass TPU kernel (train/fused_adam.py). All three
    # compute the same bias-corrected update; the fused backends exist
    # because the optax chain measures ~8 ms/step at b131072 vs a
    # ~0.16 ms moment-traffic floor (BENCH_NOTES round-5 roofline).
    fused_adam: str = "off"


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation options (reference code/parse.py:46-51,105)."""

    test_batch: int = 2048  # users scored per device step (ref default 100)
    topks: Tuple[int, ...] = (20,)
    multicore: bool = False  # accepted for parity; metrics are vectorized
    # top-k implementation: 'exact' (lax.top_k, sort-based) or 'approx'
    # (lax.approx_max_k, the TPU-native PartialReduce — much faster on
    # wide catalogs at recall_target expected per-row recall)
    topk_method: str = "exact"
    topk_recall_target: float = 0.98
    # Fused Pallas scoring+masking kernel: writes the score matrix once
    # instead of matmul-out + masked copy. Variant 'bitplane' unpacks the
    # mask by lane-axis concat of 32 shifted word-planes (compiles under
    # Mosaic; score columns are permuted in-kernel and indices mapped
    # back). Variant 'natural' keeps natural column order but its 3D→2D
    # bit-unpack reshape does NOT compile under Mosaic (round-2 wall,
    # results/bench_eval.log) — interpret/testing only.
    #
    # "auto" (default): use the bitplane kernel on a TPU backend when the
    # catalog is at least ``pallas_auto_min_items`` — there it is exact
    # AND ~1.9x faster than the XLA path (results/bench_eval_r3.log) —
    # otherwise the XLA masked-top-k path. True/"on" forces the kernel,
    # False/"off" forces XLA.
    use_pallas_scoring: object = "auto"  # bool | "auto" | "on" | "off"
    pallas_variant: str = "bitplane"
    pallas_auto_min_items: int = 65536


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Mesh / sharding layout. No reference counterpart (the reference is
    single-process, single-device — SURVEY.md §2 parallelism inventory);
    this is a first-class new component of the TPU build."""

    # Mesh axis sizes; data axis shards the BPR batch, model axis shards
    # item embedding rows / the catalog for scoring+top-k.
    data_axis: int = 1
    model_axis: int = 1
    axis_names: Tuple[str, str] = ("data", "model")
    # Use shard_map explicit collectives instead of relying purely on
    # sharding propagation.
    use_shard_map: bool = True


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)

    def replace(self, **sections) -> "ExperimentConfig":
        return dataclasses.replace(self, **sections)


def topks_from_string(s: str) -> Tuple[int, ...]:
    """Parse "[20]"-style topks strings (reference code/world.py:41)."""
    import ast

    v = ast.literal_eval(s)
    if isinstance(v, int):
        return (v,)
    return tuple(int(x) for x in v)


def milestones_from_string(s: str) -> Tuple[int, ...]:
    """Parse "[120,240]" or "120,240" (reference code/world.py:87-94)."""
    s = s.strip()
    try:
        import ast

        v = ast.literal_eval(s)
        if isinstance(v, int):
            return (v,)
        return tuple(int(x) for x in v)
    except (ValueError, SyntaxError):
        return tuple(int(x) for x in s.strip("[]").split(",") if x.strip())
