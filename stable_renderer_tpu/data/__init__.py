from stable_renderer_tpu.data.framebuffers import GBuffer, NON_AI_MAP_INDEX
from stable_renderer_tpu.data.idmap import (
    IDMap,
    id_masks,
    vertex_screen_info,
    flat_correspondence,
)
from stable_renderer_tpu.data.engine_data import EngineData
from stable_renderer_tpu.data.sprite import Sprite, SpriteInfos, EnvPrompt, get_new_spriteID
from stable_renderer_tpu.data.corrmap import CorrespondMap, corrmap_update

__all__ = [
    "GBuffer",
    "NON_AI_MAP_INDEX",
    "IDMap",
    "id_masks",
    "vertex_screen_info",
    "flat_correspondence",
    "EngineData",
    "Sprite",
    "SpriteInfos",
    "EnvPrompt",
    "get_new_spriteID",
    "CorrespondMap",
    "corrmap_update",
]
