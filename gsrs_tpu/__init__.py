"""gsrs_tpu — a TPU-native graph & sequential recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference `saamiya225/Graph-and-sequential-recommendation-systems`
(LightGCN-style graph collaborative filtering: normalized bipartite
propagation, BPR training with uniform negative sampling, full-catalog
top-k retrieval eval, popularity-gate and item-item fusion extensions),
re-architected for TPU hardware:

- functional core: pure jitted train/eval steps, explicit frozen configs
  (replacing the reference's import-time-mutable `world` global,
  reference code/world.py:26-109)
- bipartite two-SpMM propagation (segment-sum XLA path + Pallas kernel)
  instead of a (n+m)^2 sparse COO matmul (reference code/model.py:201-231)
- on-device rejection-free negative sampling against a packed membership
  bitset (replacing the host C++ rejection sampler,
  reference code/sources/sampling.cpp:27-56), with a native C++ host
  sampler kept for parity
- Mesh-first distribution: row-sharded embedding tables, data-parallel
  BPR with psum grads, sharded full-catalog top-k with all-gather merge
- Orbax checkpointing with last/best/periodic streams and a resume chain
  (reference code/main.py:56-87,151-166)

The long import alias ``graph_and_sequential_recommendation_systems_tpu``
maps to this package.
"""

__version__ = "0.1.0"

from gsrs_tpu.config import (  # noqa: F401
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
)
