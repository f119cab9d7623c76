from genpercept_tpu.pipeline.tasks import TASKS, TaskSpec
from genpercept_tpu.pipeline.pipeline import (
    GenPerceptModels,
    GenPerceptOutput,
    GenPerceptPipeline,
    PipelineConfig,
    build_single_infer,
)
from genpercept_tpu.pipeline.ensemble import ensemble_predictions

__all__ = [
    "TASKS",
    "TaskSpec",
    "GenPerceptModels",
    "GenPerceptOutput",
    "GenPerceptPipeline",
    "PipelineConfig",
    "build_single_infer",
    "ensemble_predictions",
]
