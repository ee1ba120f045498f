from gsrs_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from gsrs_tpu.train.evaluator import Evaluator  # noqa: F401
