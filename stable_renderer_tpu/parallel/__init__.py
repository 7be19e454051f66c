from stable_renderer_tpu.parallel.mesh import create_mesh, default_mesh_shape
from stable_renderer_tpu.parallel.sharding import (
    shard_engine_data,
    unet_param_specs,
    apply_param_sharding,
    replicate,
)
from stable_renderer_tpu.parallel.train import diffusion_train_step, make_train_state

__all__ = [
    "create_mesh",
    "default_mesh_shape",
    "shard_engine_data",
    "unet_param_specs",
    "apply_param_sharding",
    "replicate",
    "diffusion_train_step",
    "make_train_state",
]
