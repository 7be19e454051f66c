from stable_renderer_tpu.models.sampling.schedules import (
    ModelSampling,
    calculate_sigmas,
    SCHEDULER_NAMES,
)
from stable_renderer_tpu.models.sampling.samplers import sample, SAMPLER_NAMES

__all__ = [
    "ModelSampling",
    "calculate_sigmas",
    "SCHEDULER_NAMES",
    "sample",
    "SAMPLER_NAMES",
]
