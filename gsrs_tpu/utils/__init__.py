from gsrs_tpu.utils.timer import Timer, profile_trace  # noqa: F401
from gsrs_tpu.utils.seeding import set_seed  # noqa: F401
