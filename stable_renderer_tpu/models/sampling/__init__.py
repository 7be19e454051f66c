from stable_renderer_tpu.models.sampling.schedules import (
    ModelSampling,
    calculate_sigmas,
    SCHEDULER_NAMES,
)
from stable_renderer_tpu.models.sampling.samplers import sample, SAMPLER_NAMES
from stable_renderer_tpu.models.sampling.assemble import (
    build_denoiser,
    inpaint_concat_channels,
)

__all__ = [
    "ModelSampling",
    "calculate_sigmas",
    "SCHEDULER_NAMES",
    "sample",
    "SAMPLER_NAMES",
    "build_denoiser",
    "inpaint_concat_channels",
]
