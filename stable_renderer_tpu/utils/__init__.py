from stable_renderer_tpu.utils.log import EngineLogger, get_logger
from stable_renderer_tpu.utils.registry import (
    GetGlobalValue,
    GetOrAddGlobalValue,
    SetGlobalValue,
    cross_module_singleton,
)
from stable_renderer_tpu.utils.events import Event, AutoSortTask
from stable_renderer_tpu.utils.timer import StageTimer, FPSCounter

__all__ = [
    "EngineLogger",
    "get_logger",
    "GetGlobalValue",
    "GetOrAddGlobalValue",
    "SetGlobalValue",
    "cross_module_singleton",
    "Event",
    "AutoSortTask",
    "StageTimer",
    "FPSCounter",
]
