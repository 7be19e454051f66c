"""EngineData — the frame pack handed from the render stage to the diffusion stage.

Same field contract as the reference's hidden EngineData type
(reference: source/comfyUI/types/hidden.py:250-355), re-expressed as a pytree whose
array leaves flow straight through jit. One EngineData may hold N frames (the bake
batch, reference baking_interval=8) — the N axis is the data-parallel axis sharded
across the TPU mesh.

Array fields (all NHWC, float32 in [0,1] unless noted):
    color_maps   (N, H, W, 3)
    id_maps      (N, H, W, 4) int32   (spriteID, materialID, map_index, vertexID)
    pos_maps     (N, H, W, 3)
    noise_maps   (N, H/8, W/8, 4)     latent-resolution noise (already 8x8-pooled
                                      + AdaIN-renormalized, renderManager.py:924-940)
    normal_maps  (N, H, W, 3)
    depth_maps   (N, H, W, 3)         inverted depth replicated to 3 channels
    canny_maps   (N, H, W, 3)
    masks        (N, H, W)            1 - color alpha (background mask)
    frame_indices (N,) int32

Host-only metadata (static for a compiled step): sprite_infos, env_prompts,
correspond_maps — they parameterize conditioning, not the traced arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax

from stable_renderer_tpu.data.sprite import EnvPrompt, SpriteInfos


@jax.tree_util.register_dataclass
@dataclass
class EngineData:
    frame_indices: jax.Array  # (N,) int32
    color_maps: Optional[jax.Array] = None
    id_maps: Optional[jax.Array] = None
    pos_maps: Optional[jax.Array] = None
    noise_maps: Optional[jax.Array] = None
    normal_maps: Optional[jax.Array] = None
    depth_maps: Optional[jax.Array] = None
    canny_maps: Optional[jax.Array] = None
    masks: Optional[jax.Array] = None
    # --- static (host) metadata, not traced ---
    sprite_infos: SpriteInfos = field(default_factory=dict, metadata=dict(static=True))
    env_prompts: Tuple[EnvPrompt, ...] = field(default=(), metadata=dict(static=True))
    correspond_maps: Dict[Any, Any] = field(default_factory=dict, metadata=dict(static=True))

    @property
    def frame_count(self) -> int:
        return self.frame_indices.shape[0]

    @property
    def height(self) -> int:
        assert self.color_maps is not None
        return self.color_maps.shape[-3]

    @property
    def width(self) -> int:
        assert self.color_maps is not None
        return self.color_maps.shape[-2]
