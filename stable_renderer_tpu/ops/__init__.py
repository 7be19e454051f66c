from stable_renderer_tpu.ops.math import (
    adain,
    map_mean_std,
    group_average_by_id,
    group_randn_by_id,
    group_first_by_id,
)

__all__ = [
    "adain",
    "map_mean_std",
    "group_average_by_id",
    "group_randn_by_id",
    "group_first_by_id",
]
