"""NamedSharding layouts for the sequential family (SASRec/GRU4Rec/BERT4Rec).

Same GSPMD recipe as the graph layer (`gsrs_tpu.parallel.sharding`):
annotate at the jit boundary, let XLA insert the collectives.

- ``item_emb`` — the only catalog-scale tensor — row-shards over
  ``model``: P('model', None). Sequence gathers `item_emb[seqs]` become
  the collective-gather GSPMD inserts; its gradient reduce-scatters back
  to the owning shard.
- encoder weights (attention/FFN/GRU/LayerNorm/positional) are tiny —
  replicated.
- sequence batches shard over ``data``: P('data', None) per (B, L) batch,
  P(None, 'data', None) for a scanned (steps, B, L) epoch. The batch-mean
  loss makes GSPMD psum gradients over the data axis.
- optimizer state mirrors each param leaf's layout (matched by shape).

No reference counterpart: the reference has neither sequential models nor
any distributed code (SURVEY.md §2)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


@dataclasses.dataclass(frozen=True)
class SeqShardings:
    mesh: Mesh

    def params_spec(self, params: Dict[str, jax.Array]) -> Dict[str, NamedSharding]:
        return {
            name: _ns(self.mesh, P("model", None) if name == "item_emb" else P())
            for name in params
        }

    def opt_state_spec(self, opt_state: Any, params: Dict[str, jax.Array]) -> Any:
        table_shape = params["item_emb"].shape
        sharded = _ns(self.mesh, P("model", None))
        replicated = _ns(self.mesh, P())

        def leaf_spec(leaf):
            if getattr(leaf, "shape", None) == table_shape:
                return sharded
            return replicated

        return jax.tree_util.tree_map(leaf_spec, opt_state)

    def batch_spec(self) -> NamedSharding:
        """One (B, L) sequence batch."""
        return _ns(self.mesh, P("data", None))

    def scan_batch_spec(self) -> NamedSharding:
        """A scanned (steps, B, L) epoch of batches."""
        return _ns(self.mesh, P(None, "data", None))

    def vector_spec(self) -> NamedSharding:
        """A per-example (B,) vector (users / weights)."""
        return _ns(self.mesh, P("data"))

    def replicated(self) -> NamedSharding:
        return _ns(self.mesh, P())

    def place_params(self, params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        spec = self.params_spec(params)
        return {k: jax.device_put(v, spec[k]) for k, v in params.items()}
