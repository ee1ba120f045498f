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
