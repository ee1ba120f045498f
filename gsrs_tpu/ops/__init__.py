from gsrs_tpu.ops.spmm import spmm_edges, propagate_layer  # noqa: F401
from gsrs_tpu.ops.bitset import (  # noqa: F401
    build_bitset,
    bitset_lookup,
    bitset_words,
)
