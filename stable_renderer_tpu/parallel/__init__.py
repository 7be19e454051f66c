from stable_renderer_tpu.parallel.mesh import create_mesh, default_mesh_shape
from stable_renderer_tpu.parallel.sharding import (
    shard_engine_data,
    unet_param_specs,
    apply_param_sharding,
    replicate,
)
from stable_renderer_tpu.parallel.train import diffusion_train_step, make_train_state
from stable_renderer_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_stage_params,
    clip_pipeline_encode,
)

__all__ = [
    "pipeline_apply",
    "stack_stage_params",
    "clip_pipeline_encode",
    "create_mesh",
    "default_mesh_shape",
    "shard_engine_data",
    "unet_param_specs",
    "apply_param_sharding",
    "replicate",
    "diffusion_train_step",
    "make_train_state",
]
