from gsrs_tpu.parallel.mesh import make_mesh, distributed_init  # noqa: F401
from gsrs_tpu.parallel.sharding import GraphShardings  # noqa: F401
