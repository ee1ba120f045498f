"""Full-catalog top-k evaluation engine.

The reference re-runs the whole K-layer propagation for every 100-user
test batch (~300 full graph sweeps per Gowalla eval, reference
code/Procedure.py:162-183) and computes metrics in a serial per-user
Python loop (code/Procedure.py:186-188). Here:

- propagation runs ONCE per eval,
- users are scored in large static-shaped batches (gather users →
  (B, m) matmul on the MXU → bitset mask → lax.top_k → vectorized
  metric sums), all batches inside ONE jitted lax.scan dispatch,
- the padded final batch is neutralized with zero user-weights,

so a Gowalla eval is one propagation + one scan dispatch instead of
~300 propagations + 30k Python iterations. Metric math matches reference
code/utils.py:173-217 exactly (see gsrs_tpu.ops.metrics golden tests).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gsrs_tpu.config import EvalConfig
from gsrs_tpu.data.dataset import InteractionData
from gsrs_tpu.models.lightgcn import LightGCN, Params
from gsrs_tpu.ops.bitset import build_bitset
from gsrs_tpu.ops.metrics import batch_metrics, topk_labels
from gsrs_tpu.ops.topk import masked_topk


def resolve_pallas_scoring(cfg: EvalConfig, m_items: int) -> bool:
    """Resolve EvalConfig.use_pallas_scoring ("auto" | on | off) for a
    concrete catalog size and backend (VERDICT r3 item 4: the bitplane
    kernel is exact and ~1.9x faster than XLA at amazon-book scale —
    results/bench_eval_r3.log — so on large catalogs it is the default,
    not an opt-in flag)."""
    from gsrs_tpu.ops.pallas_kernels import resolve_bitplane_scoring

    return resolve_bitplane_scoring(
        cfg.use_pallas_scoring,
        m_items,
        variant=cfg.pallas_variant,
        min_items=cfg.pallas_auto_min_items,
    )


class Evaluator:
    def __init__(
        self,
        data: InteractionData,
        model: LightGCN,
        cfg: EvalConfig,
        train_bitset=None,
    ):
        """``train_bitset``: optional pre-built (n_users, W) packed train
        bitset — pass the sampler's copy to avoid holding a second one
        resident in HBM (~150 MB at Gowalla scale)."""
        self.cfg = cfg
        self.model = model
        self.max_k = max(cfg.topks)

        test_users = data.test_users()
        self.n_test_users = int(test_users.size)
        B = cfg.test_batch
        n_batches = max(1, -(-self.n_test_users // B))
        padded = n_batches * B
        self.user_batches = np.zeros(padded, dtype=np.int32)
        self.user_batches[: self.n_test_users] = test_users
        self.user_weights = np.zeros(padded, dtype=np.float32)
        self.user_weights[: self.n_test_users] = 1.0
        self.user_batches = self.user_batches.reshape(n_batches, B)
        self.user_weights = self.user_weights.reshape(n_batches, B)

        gt = np.zeros(data.n_users, dtype=np.float32)
        for u, items in data.test_dict.items():
            gt[u] = len(items)
        self.gt_counts = gt

        self.train_bitset = (
            jnp.asarray(train_bitset)
            if train_bitset is not None
            else jnp.asarray(
                build_bitset(
                    data.train_users, data.train_items, data.n_users,
                    data.m_items, real_m_items=data.real_m_items,
                )
            )
        )
        if data.test_dict:
            te_u = np.concatenate(
                [np.full(len(v), k, dtype=np.int64) for k, v in data.test_dict.items()]
            )
            te_i = np.concatenate([np.asarray(v) for v in data.test_dict.values()])
        else:
            te_u = te_i = np.zeros(0, np.int64)
        self.test_bitset = jnp.asarray(
            build_bitset(te_u, te_i, data.n_users, data.m_items)
        )

        # Static across evals — upload once, not per batch.
        self._users_dev = jnp.asarray(self.user_batches)
        self._weights_dev = jnp.asarray(self.user_weights)
        self._gt_dev = jnp.asarray(self.gt_counts[self.user_batches])
        self._pallas_on = resolve_pallas_scoring(cfg, data.m_items)
        if self._pallas_on and cfg.pallas_variant == "bitplane":
            from gsrs_tpu.ops.pallas_kernels import bitplane_permutation

            self._bp_block_m = 4096
            self._bp_m = data.m_items
            self._bp_m_pad = -(-data.m_items // self._bp_block_m) * self._bp_block_m
            self._bp_perm = jnp.asarray(
                bitplane_permutation(self._bp_m_pad, self._bp_block_m).astype(
                    np.int32
                )
            )
            # item rows are permuted once per eval inside run(); the
            # natural-width bitset rows are padded per batch inside the
            # scan (avoids a second resident full-catalog bitset in HBM)
            self._bp_permute_items = jax.jit(
                lambda it: jnp.pad(
                    it, ((0, self._bp_m_pad - self._bp_m), (0, 0))
                )[self._bp_perm]
            )
        self._scan_fn = jax.jit(self._eval_all)
        # Hoisted: a fresh `jax.jit(lambda ...)` per run() call can never
        # hit the jit cache, so every eval would pay a full propagation
        # re-trace/compile (≈15 s through the remote-compile tunnel —
        # this dominated eval cost, not the scoring).
        self._final_fn = jax.jit(
            lambda p, g, e: self.model.final_embeddings(p, graph=g, ell=e)
        )

    def _eval_batch(
        self,
        all_users: jax.Array,
        items: jax.Array,
        train_bitset: jax.Array,  # (n_users, W) — passed as arg, NOT closed
        test_bitset: jax.Array,  # over: closure constants embed ~150MB of
        users: jax.Array,  # (B,)   bitset into the HLO upload
        weights: jax.Array,  # (B,)
        gt_counts: jax.Array,  # (B,)
    ) -> Dict[str, jax.Array]:
        u_emb = all_users[users]
        train_rows = train_bitset[users]
        if self._pallas_on and self.cfg.pallas_variant == "bitplane":
            from gsrs_tpu.ops.pallas_kernels import masked_scores_bitplane_pallas
            from gsrs_tpu.ops.topk import topk_scores

            # pad bitset rows to m_pad/32 words: pad words all-ones, and
            # the ragged bits [m, W*32) of the last natural word set, so
            # every phantom column masks to NEG_INF
            W = train_rows.shape[1]
            W_pad = self._bp_m_pad // 32
            rows = jnp.pad(
                train_rows,
                ((0, 0), (0, W_pad - W)),
                constant_values=np.uint32(0xFFFFFFFF),
            )
            if self._bp_m % 32:
                ragged = jnp.uint32(0xFFFFFFFF) << jnp.uint32(self._bp_m % 32)
                rows = rows.at[:, W - 1].set(rows[:, W - 1] | ragged)
            scores = masked_scores_bitplane_pallas(
                u_emb, items, rows, block_m=self._bp_block_m
            )
            _, top_cols = topk_scores(
                scores, self.max_k, self.cfg.topk_method, self.cfg.topk_recall_target
            )
            top_items = self._bp_perm[top_cols]  # back to natural item ids
            # Phantom padded columns map to ids >= m_items; they only
            # surface for degenerate users whose whole row is NEG_INF
            # ties, but an unclamped id would index test_bitset out of
            # range (JAX clamps to the last word → possible spurious
            # hit). Zero those labels explicitly.
            valid = (top_items < self._bp_m).astype(jnp.float32)
            top_items = jnp.minimum(top_items, self._bp_m - 1)
            labels = topk_labels(top_items, test_bitset, users) * valid
            return batch_metrics(labels, gt_counts, weights, self.cfg.topks)
        if self._pallas_on:
            from gsrs_tpu.ops.pallas_kernels import masked_scores_pallas
            from gsrs_tpu.ops.topk import topk_scores

            scores = masked_scores_pallas(u_emb, items, train_rows)
            _, top_items = topk_scores(
                scores, self.max_k, self.cfg.topk_method, self.cfg.topk_recall_target
            )
            labels = topk_labels(top_items, test_bitset, users)
            return batch_metrics(labels, gt_counts, weights, self.cfg.topks)
        _, top_items = masked_topk(
            u_emb,
            items,
            train_rows,
            self.max_k,
            method=self.cfg.topk_method,
            recall_target=self.cfg.topk_recall_target,
        )
        labels = topk_labels(top_items, test_bitset, users)
        return batch_metrics(labels, gt_counts, weights, self.cfg.topks)

    def _eval_all(
        self,
        all_users: jax.Array,
        items: jax.Array,
        train_bitset: jax.Array,
        test_bitset: jax.Array,
        users: jax.Array,  # (n_batches, B)
        weights: jax.Array,  # (n_batches, B)
        gt_counts: jax.Array,  # (n_batches, B)
    ) -> Dict[str, jax.Array]:
        """All scoring batches in ONE dispatch via lax.scan. A Python
        loop of per-batch jit calls costs a dispatch round-trip each
        through the remote-device tunnel (~1 s × 15 batches dominated a
        Gowalla eval); the scan keeps the whole eval on device."""

        def step(_, xs):
            u, w, g = xs
            sums = self._eval_batch(
                all_users, items, train_bitset, test_bitset, u, w, g
            )
            return None, sums

        _, per_batch = jax.lax.scan(step, None, (users, weights, gt_counts))
        return {k: jnp.sum(v) for k, v in per_batch.items()}

    def run(self, params: Params) -> Dict[str, float]:
        """One propagation + one scanned scoring dispatch; returns mean
        metrics over the real (unpadded) test users, exactly the
        reference's aggregation (reference code/Procedure.py:191-192)."""
        all_users, items, _ = self._final_fn(
            params, self.model.graph, self.model.ell
        )
        if self._pallas_on and self.cfg.pallas_variant == "bitplane":
            items = self._bp_permute_items(items)
        totals = self._scan_fn(
            all_users,
            items,
            self.train_bitset,
            self.test_bitset,
            self._users_dev,
            self._weights_dev,
            self._gt_dev,
        )
        denom = max(self.n_test_users, 1)
        return {k: float(v) / denom for k, v in totals.items()}
