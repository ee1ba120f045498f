from gsrs_tpu.models.registry import MODELS, build_model  # noqa: F401
from gsrs_tpu.models.lightgcn import LightGCN  # noqa: F401
from gsrs_tpu.models.mf import PureMF  # noqa: F401
