"""GBuffer — the 6-attachment frame-buffer contract as a JAX pytree.

TPU-native replacement for the reference's G-buffer FBO with 6 GL texture
attachments + depth (reference: renderManager.py:197-397 ``_init_framebuffers`` and
the fragment-shader outputs in engine/shaders/default_Gbuffer.frag.glsl:24-45):

    0 color         (H, W, 4) float  rgba, [0,1]
    1 id            (H, W, 4) int32  (spriteID, materialID, map_index, vertexID)
    2 pos           (H, W, 3) float  view-space position (the reference writes
                                     ``worldPos = MV * pos``, i.e. view space)
    3 normal_depth  (H, W, 4) float  view-space normal*0.5+0.5  +  inverted depth
    4 noise         (H, W, 4) float  per-object latent noise, pre-downsample
    5 canny         (H, W, 3) float  normal-angle edge mask

On TPU there is no texture object: each attachment is just an HBM-resident array in
one pytree, written by the rasterizer kernel and consumed in-place by the diffusion
stage — the zero-copy GL<->CUDA interop path (reference: texture.py:221-254,326-408)
disappears entirely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NON_AI_MAP_INDEX = 2048
"""map_index sentinel for non-AI objects (reference: default_Gbuffer.frag.glsl:8)."""


class GBuffer(NamedTuple):
    color: jax.Array         # (H, W, 4) float32
    id: jax.Array            # (H, W, 4) int32
    pos: jax.Array           # (H, W, 3) float32
    normal_depth: jax.Array  # (H, W, 4) float32
    noise: jax.Array         # (H, W, 4) float32
    canny: jax.Array         # (H, W, 3) float32

    @property
    def height(self) -> int:
        return self.color.shape[-3]

    @property
    def width(self) -> int:
        return self.color.shape[-2]

    @property
    def depth(self) -> jax.Array:
        """Inverted depth (closer = larger), alpha channel of normal_depth."""
        return self.normal_depth[..., 3]

    @property
    def normal(self) -> jax.Array:
        """Encoded view-space normal in [0,1]."""
        return self.normal_depth[..., :3]

    @staticmethod
    def empty(height: int, width: int, dtype=jnp.float32) -> "GBuffer":
        """A cleared G-buffer: matches the reference's clear state — color rgba=0,
        id=0, pos=0, normal_depth=0 (depth buffer cleared so inverted depth=0),
        noise=0, canny=0."""
        return GBuffer(
            color=jnp.zeros((height, width, 4), dtype),
            id=jnp.zeros((height, width, 4), jnp.int32),
            pos=jnp.zeros((height, width, 3), dtype),
            normal_depth=jnp.zeros((height, width, 4), dtype),
            noise=jnp.zeros((height, width, 4), dtype),
            canny=jnp.zeros((height, width, 3), dtype),
        )
