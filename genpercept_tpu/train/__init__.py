from genpercept_tpu.train import losses
from genpercept_tpu.train.lr import iter_exponential_schedule
from genpercept_tpu.train.train_step import TrainConfig, build_train_step, init_train_state

__all__ = [
    "losses",
    "iter_exponential_schedule",
    "TrainConfig",
    "build_train_step",
    "init_train_state",
]
