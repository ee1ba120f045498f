"""Distributed training + eval steps over a (data, model) mesh.

GSPMD-style: the single-chip jitted step is annotated with NamedShardings
at the jit boundary and XLA inserts the collectives (all-gather of
frontier embedding rows for the edge-partitioned SpMM, psum of
data-parallel gradients, reduce-scatter back to table shards). The
single-chip path is the degenerate 1×1 mesh of the same code.

No reference counterpart (SURVEY.md §2: the reference has no distributed
layer at all)."""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsrs_tpu.models.lightgcn import LightGCN
from gsrs_tpu.parallel.sharding import GraphShardings


def make_train_step(
    model: LightGCN,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    decay: float,
) -> Callable:
    """Build the jitted sharded train step:
    (params, opt_state, users, pos, neg) → (params, opt_state, loss).

    Batch arrays come in sharded over 'data'; tables live row-sharded over
    'model'. The loss is a global mean — GSPMD turns the batch-mean grad
    into a psum over the data axis automatically.

    With edge dropout configured (cfg.dropout), the step takes an extra
    PRNG key argument after ``ell``:
    (params, opt_state, graph, ell, key, users, pos, neg). The canonical
    per-edge keep mask is derived from the replicated key inside the
    jitted program, so every device drops the same edges (implements the
    reference's dead --dropout/--keepprob flags, reference
    code/model.py:214, in the distributed path too)."""
    sh = GraphShardings(mesh)
    batch_s = sh.batch_spec()
    rep = sh.replicated()
    # models that consume per-step randomness beyond edge dropout
    # (UltraGCN's in-loss negatives, XSimGCL's noise views) declare
    # needs_step_key — same rule as Trainer._build_epoch_fn
    use_dropout = bool(model.cfg.dropout) or getattr(
        model, "needs_step_key", False
    )

    def step(params, opt_state, graph, ell, key, users, pos, neg):
        def loss_fn(p):
            loss, aux = model.bpr_loss(p, users, pos, neg, key, graph, ell)
            return loss + decay * aux["reg"], aux

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # FusedAdam (train/fused_adam.py) updates params in one pass per
        # leaf; elementwise, so GSPMD shards it exactly like the tables.
        from gsrs_tpu.train.fused_adam import FusedAdam

        if isinstance(optimizer, FusedAdam):
            params, opt_state = optimizer.step(params, grads, opt_state)
        else:
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def compile_for(params, opt_state):
        pspec = sh.params_spec(params)
        ospec = sh.opt_state_spec(opt_state, params)
        # ELL bucket arrays shard their leading axis over the whole mesh
        # (each device stores ~1/n_devices of the edge slots); graph
        # models without an ELL layout (UltraGCN's TrainBitset slot, or
        # spmm_mode='segment') replicate whatever rides in the slot.
        from gsrs_tpu.ops.ell import EllGraph
        from gsrs_tpu.ops.hybrid import HybridGraph
        from gsrs_tpu.ops.tiled import TiledGraph

        if isinstance(model.ell, TiledGraph):
            n_dev = mesh.size
            for d in (model.ell.user_from_item, model.ell.item_from_user):
                for side in (d.residual.by_user, d.residual.by_item):
                    for b in side.buckets:
                        if b.cols.shape[0] % n_dev:
                            raise ValueError(
                                "tiled residual ELL bucket rows must be a "
                                f"multiple of the mesh size ({n_dev}) — "
                                "place with GraphShardings.place_ell"
                            )
            ell_spec = sh.tiled_spec(model.ell)
        elif isinstance(model.ell, HybridGraph):
            n_dev = mesh.size
            for d in (model.ell.user_from_item, model.ell.item_from_user):
                for side in (d.residual.by_user, d.residual.by_item):
                    for b in side.buckets:
                        if b.cols.shape[0] % n_dev:
                            raise ValueError(
                                "hybrid residual ELL bucket rows must be a "
                                f"multiple of the mesh size ({n_dev}) — "
                                "place with GraphShardings.place_ell"
                            )
            ell_spec = sh.hybrid_spec(model.ell)
        elif isinstance(model.ell, EllGraph):
            n_dev = mesh.size
            for side in (model.ell.by_user, model.ell.by_item):
                for b in side.buckets:
                    if b.cols.shape[0] % n_dev:
                        raise ValueError(
                            "ELL bucket rows must be a multiple of the mesh "
                            f"size ({n_dev}) to shard evenly — place the ELL "
                            "with GraphShardings.place_ell(ell), which pads "
                            "and shards it (got a bucket with "
                            f"{b.cols.shape[0]} rows)"
                        )
            ell_spec = sh.ell_spec(model.ell)
        else:
            ell_spec = jax.tree_util.tree_map(lambda _: rep, model.ell)
        jitted = jax.jit(
            step,
            in_shardings=(
                pspec,
                ospec,
                sh.graph_spec(model.graph),
                ell_spec,
                rep,
                batch_s,
                batch_s,
                batch_s,
            ),
            out_shardings=(pspec, ospec, rep),
            donate_argnums=(0, 1),
        )
        if use_dropout:
            return jitted

        def no_key(params, opt_state, graph, ell, users, pos, neg):
            return jitted(params, opt_state, graph, ell, None, users, pos, neg)

        return no_key

    return compile_for


def make_eval_scores_fn(
    model: LightGCN, mesh: Mesh
) -> Callable:
    """Sharded full-catalog scoring + top-k.

    Final embeddings are computed once; the item table stays row-sharded
    over 'model', the user batch is sharded over 'data'. Scores (B, m)
    are sharded (data, model); lax.top_k over the sharded catalog axis
    makes GSPMD do a local-topk + gather merge."""
    sh = GraphShardings(mesh)

    def scores_topk(all_users, items, users, train_rows, k: int):
        from gsrs_tpu.ops.topk import masked_topk

        u_emb = all_users[users]
        vals, idx = masked_topk(u_emb, items, train_rows, k)
        return vals, idx

    return jax.jit(
        scores_topk,
        static_argnums=(4,),
        in_shardings=(
            NamedSharding(mesh, P("model", None)),
            NamedSharding(mesh, P("model", None)),
            sh.batch_spec(),
            sh.batch_spec(),
        ),
        out_shardings=(sh.batch_spec(), sh.batch_spec()),
    )
