"""Trainer registry (reference src/trainer/__init__.py:20-26)."""

from genpercept_tpu.train.trainer import Trainer

trainer_cls_name_dict = {
    "GenPerceptTrainer": Trainer,  # reference name
    "Trainer": Trainer,
}


def get_trainer_cls(trainer_name: str):
    return trainer_cls_name_dict[trainer_name]
