"""NamedSharding layouts for params, graph, optimizer state, and batches.

The scaling recipe: pick a mesh, annotate shardings on the jit boundary,
let GSPMD insert the collectives, profile, iterate. Layouts:

- embedding tables (user_emb / item_emb): row-sharded over ``model`` —
  P('model', None). Propagation gathers frontier rows via the all-gather
  GSPMD inserts; gradients reduce-scatter back to the owning shard.
- pop-gate MLP weights: tiny — replicated.
- graph edge arrays: sharded over the whole mesh, P(('data','model')) —
  each device owns an edge slice; segment-sums produce partial rows that
  GSPMD combines with a psum/reduce-scatter to the destination shard.
- BPR batches: P('data') — pure data parallelism, grad psum.
- optimizer state: follows params (same tree structure → same layouts).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsrs_tpu.data.adjacency import BipartiteGraph
from gsrs_tpu.models.lightgcn import Params


def _ns(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


@dataclasses.dataclass(frozen=True)
class GraphShardings:
    mesh: Mesh

    # ------------------------------------------------------------- params
    def params_spec(self, params: Params) -> Dict[str, NamedSharding]:
        spec: Dict[str, NamedSharding] = {}
        for name, v in params.items():
            if name in ("user_emb", "item_emb"):
                spec[name] = _ns(self.mesh, P("model", None))
            else:  # small MLP weights/biases — replicate
                spec[name] = _ns(self.mesh, P())
        return spec

    def opt_state_spec(self, opt_state: Any, params: Params) -> Any:
        """Optimizer state mirrors each param leaf's layout; non-param
        leaves (step counters) replicate."""
        pspec = self.params_spec(params)
        replicated = _ns(self.mesh, P())

        def leaf_spec(path, leaf):
            # Adam state trees contain param-shaped leaves under 'mu'/'nu';
            # match by shape against the two table shapes.
            if hasattr(leaf, "shape") and len(getattr(leaf, "shape", ())) == 2:
                for name in ("user_emb", "item_emb"):
                    if leaf.shape == params[name].shape:
                        return pspec[name]
            return replicated

        return jax.tree_util.tree_map_with_path(leaf_spec, opt_state)

    # -------------------------------------------------------------- graph
    def graph_spec(self, graph: BipartiteGraph) -> BipartiteGraph:
        """Sharding pytree with the same treedef as ``graph`` (static fields
        participate in treedef equality, so they are copied from the real
        instance)."""
        edge = _ns(self.mesh, P(("data", "model")))
        rep = _ns(self.mesh, P())
        return dataclasses.replace(
            graph,
            edge_u_by_u=edge,
            edge_i_by_u=edge,
            edge_w_by_u=edge,
            edge_u_by_i=edge,
            edge_i_by_i=edge,
            edge_w_by_i=edge,
            perm_by_u=edge,
            perm_by_i=edge,
            user_degrees=rep,
            item_degrees=rep,
        )

    # ---------------------------------------------------------------- ell
    def hybrid_spec(self, hg: Any) -> Any:
        """Sharding pytree for a HybridGraph: each direction's dense hub
        block shards its COLUMN axis over the whole mesh (the destination
        row count is arbitrary, but C is built as a multiple of 128, so
        columns split evenly; GSPMD turns the hub matmul into local
        partial products + a psum over the contraction slices), top_src
        replicates (C ids), and the residual EllGraph shards like
        ell_spec. Graphs too small for an even column split (C not a
        mesh-size multiple) replicate the dense block — it is tiny there."""
        from gsrs_tpu.ops.hybrid import HybridDirection

        rep = _ns(self.mesh, P())

        def dir_spec(d: HybridDirection) -> HybridDirection:
            cols = (
                _ns(self.mesh, P(None, ("data", "model")))
                if d.dense.shape[1] % self.mesh.size == 0
                else rep
            )
            return dataclasses.replace(
                d,
                residual=self.ell_spec(d.residual),
                dense=cols,
                top_src=rep,
            )

        return dataclasses.replace(
            hg,
            user_from_item=dir_spec(hg.user_from_item),
            item_from_user=dir_spec(hg.item_from_user),
        )

    def tiled_spec(self, tg: Any) -> Any:
        """Sharding pytree for a TiledGraph: per-group dense hub blocks
        shard the COLUMN axis over the whole mesh when C divides evenly
        (exactly like hybrid_spec — GSPMD partitions the grouped einsum's
        contraction and psums the partial products); the gather maps
        (top_src, order_dst, row_nat) and the occ accumulation side
        replicate (all O(G·C)/O(n) int32 — MBs, and the backward's occ
        apply is a tiny gather-sum); the residual EllGraph shards like
        ell_spec (pad first with place_ell)."""
        from gsrs_tpu.ops.tiled import TiledDirection

        rep = _ns(self.mesh, P())

        def dir_spec(d: TiledDirection) -> TiledDirection:
            cols = (
                _ns(self.mesh, P(None, ("data", "model")))
                if d.cols > 0 and d.cols % self.mesh.size == 0
                else rep
            )
            return dataclasses.replace(
                d,
                dense=cols,
                top_src=rep,
                order_dst=rep,
                row_nat=rep,
                occ=jax.tree_util.tree_map(lambda _: rep, d.occ),
                residual=self.ell_spec(d.residual),
            )

        return dataclasses.replace(
            tg,
            user_from_item=dir_spec(tg.user_from_item),
            item_from_user=dir_spec(tg.item_from_user),
        )

    def ell_spec(self, ell: Any) -> Any:
        """Sharding pytree for an EllGraph: every bucket array (rows,
        cols, w, eidx — the O(edges) memory) shards its leading axis over
        the whole mesh; the per-side assemble gather map (O(n_rows), small)
        replicates. This is what makes the pod-scale memory plan real:
        each device stores ~1/n_devices of the edge slots
        (tools/stress_pod.py budgets ELL as edges/n_dev)."""
        from gsrs_tpu.ops.ell import EllBucket, EllSide

        edge = _ns(self.mesh, P(("data", "model")))
        edge2d = _ns(self.mesh, P(("data", "model"), None))
        rep = _ns(self.mesh, P())

        def side_spec(side: EllSide) -> EllSide:
            return dataclasses.replace(
                side,
                buckets=tuple(
                    EllBucket(rows=edge, cols=edge2d, w=edge2d, eidx=edge2d)
                    for _ in side.buckets
                ),
                assemble=rep,
                # split-row overflow chunks (tiny) replicate
                extra_dst=rep if side.extra_dst is not None else None,
                extra_pos=rep if side.extra_pos is not None else None,
            )

        return dataclasses.replace(
            ell,
            by_user=side_spec(ell.by_user),
            by_item=side_spec(ell.by_item),
        )

    def place_ell(self, ell: Any) -> Any:
        """Pad bucket rows to a mesh-size multiple (GSPMD shardings need
        exact divisibility), then place each array with its sharded spec.
        The returned (padded) EllGraph is what must be passed to the
        sharded step — its shapes define the compiled program."""
        from gsrs_tpu.ops.ell import pad_ell_graph
        from gsrs_tpu.ops.hybrid import HybridGraph
        from gsrs_tpu.ops.tiled import TiledGraph

        if isinstance(ell, TiledGraph):
            ell = dataclasses.replace(
                ell,
                user_from_item=dataclasses.replace(
                    ell.user_from_item,
                    residual=pad_ell_graph(
                        ell.user_from_item.residual, self.mesh.size
                    ),
                ),
                item_from_user=dataclasses.replace(
                    ell.item_from_user,
                    residual=pad_ell_graph(
                        ell.item_from_user.residual, self.mesh.size
                    ),
                ),
            )
            spec = self.tiled_spec(ell)
            return jax.tree_util.tree_map(jax.device_put, ell, spec)
        if isinstance(ell, HybridGraph):
            ell = dataclasses.replace(
                ell,
                user_from_item=dataclasses.replace(
                    ell.user_from_item,
                    residual=pad_ell_graph(
                        ell.user_from_item.residual, self.mesh.size
                    ),
                ),
                item_from_user=dataclasses.replace(
                    ell.item_from_user,
                    residual=pad_ell_graph(
                        ell.item_from_user.residual, self.mesh.size
                    ),
                ),
            )
            spec = self.hybrid_spec(ell)
            return jax.tree_util.tree_map(jax.device_put, ell, spec)
        ell = pad_ell_graph(ell, self.mesh.size)
        spec = self.ell_spec(ell)
        return jax.tree_util.tree_map(jax.device_put, ell, spec)

    # -------------------------------------------------------------- batch
    def batch_spec(self) -> NamedSharding:
        return _ns(self.mesh, P("data"))

    def replicated(self) -> NamedSharding:
        return _ns(self.mesh, P())

    def place_params(self, params: Params) -> Params:
        spec = self.params_spec(params)
        return {k: jax.device_put(v, spec[k]) for k, v in params.items()}

    def place_graph(self, graph: BipartiteGraph) -> BipartiteGraph:
        spec = self.graph_spec(graph)
        def put(x, s):
            return jax.device_put(x, s)
        return dataclasses.replace(
            graph,
            edge_u_by_u=put(graph.edge_u_by_u, spec.edge_u_by_u),
            edge_i_by_u=put(graph.edge_i_by_u, spec.edge_i_by_u),
            edge_w_by_u=put(graph.edge_w_by_u, spec.edge_w_by_u),
            edge_u_by_i=put(graph.edge_u_by_i, spec.edge_u_by_i),
            edge_i_by_i=put(graph.edge_i_by_i, spec.edge_i_by_i),
            edge_w_by_i=put(graph.edge_w_by_i, spec.edge_w_by_i),
            perm_by_u=put(graph.perm_by_u, spec.perm_by_u),
            perm_by_i=put(graph.perm_by_i, spec.perm_by_i),
            user_degrees=put(graph.user_degrees, spec.user_degrees),
            item_degrees=put(graph.item_degrees, spec.item_degrees),
        )
