"""Defer + post-process stages as jnp — the last two GL passes of the reference.

Capability match for engine/shaders/default_defer_render.frag.glsl (bake-mode
correspondence visualization overlay) and default_post_process.frag.glsl
(gamma / exposure / saturation / brightness / contrast / HDR tonemap), driven by
the reference's post-process task queue (renderManager.py:1037-1043). One fused
elementwise pass on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from stable_renderer_tpu.data.framebuffers import NON_AI_MAP_INDEX

BAKING_VISUAL_VAL = 512  # default_defer_render.frag.glsl:3


@dataclass(frozen=True)
class PostProcessParams:
    """default_post_process uniforms (defaults = no-op, matching the shader)."""

    enable_gamma: bool = False
    enable_hdr: bool = False
    gamma: float = 1.0
    exposure: float = 1.0
    saturation: float = 1.0
    brightness: float = 1.0
    contrast: float = 1.0


def defer_render(
    color: jax.Array,       # (..., H, W, 4)
    ids: jax.Array,         # (..., H, W, 4) int32
    is_baking: bool = False,
) -> jax.Array:
    """default_defer_render.frag.glsl: passthrough color; in bake mode, overlay a
    rainbow vertex-id visualization on AI-object pixels (10% blend)."""
    if not is_baking:
        return color
    exists = jnp.sum(ids, axis=-1) > 0
    is_ai = ids[..., 2] != NON_AI_MAP_INDEX
    ratio = 1.0 - jnp.clip(
        ids[..., 3].astype(jnp.float32) / float(BAKING_VISUAL_VAL * BAKING_VISUAL_VAL),
        0.0,
        1.0,
    )
    # six-segment rainbow (frag:29-56)
    seg = jnp.clip((ratio * 6.0).astype(jnp.int32), 0, 5)
    f = ratio * 6.0 - seg
    r = jnp.select(
        [seg == 0, seg == 1, seg == 2, seg == 3, seg == 4, seg == 5],
        [jnp.ones_like(f), 1.0 - f, jnp.zeros_like(f), jnp.zeros_like(f), f, jnp.ones_like(f)],
    )
    g = jnp.select(
        [seg == 0, seg == 1, seg == 2, seg == 3, seg == 4, seg == 5],
        [f, jnp.ones_like(f), jnp.ones_like(f), 1.0 - f, jnp.zeros_like(f), jnp.zeros_like(f)],
    )
    b = jnp.select(
        [seg == 0, seg == 1, seg == 2, seg == 3, seg == 4, seg == 5],
        [jnp.zeros_like(f), jnp.zeros_like(f), f, jnp.ones_like(f), jnp.ones_like(f), 1.0 - f],
    )
    overlay = jnp.stack([r, g, b], axis=-1)
    mixed = color[..., :3] * 0.9 + overlay * 0.1
    rgb = jnp.where((exists & is_ai)[..., None], mixed, color[..., :3])
    alpha = jnp.where(exists & is_ai, 1.0, color[..., 3])
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


LIGHT_DIRECTIONAL = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2


def apply_lights(
    color: jax.Array,        # (H, W, 4) display color
    normal_enc: jax.Array,   # (H, W, 3) encoded view-space normal in [0,1]
    pos: jax.Array,          # (H, W, 3) view-space position
    lights: jax.Array,       # (L, 16) packed rows (Light.pack_lights):
    # [type, r, g, b, intensity, px, py, pz, dx, dy, dz,
    #  att_const, att_lin, att_quad, cos_angle, ambient]
) -> jax.Array:
    """Defer-stage diffuse lighting from the engine's Light components.

    The reference maps Light components into shader UBO structs
    (engine/runtime/components/light/light.py:13-80: position/color/intensity +
    const/linear/quadratic attenuation) but its defer shader never consumed
    them (shadow maps TODO, renderManager.py:452-461); here the defer stage
    applies the Lambert term those structs describe. Pixels with no geometry
    (zero encoded normal) are left untouched.
    """
    has_geom = jnp.sum(normal_enc, axis=-1) > 0.0  # cleared G-buffer = 0
    n = normal_enc * 2.0 - 1.0
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    diffuse = jnp.zeros_like(color[..., :3])
    ambient = jnp.zeros(())
    for i in range(lights.shape[0]):
        row = lights[i]
        ltype = row[0]
        lcol = row[1:4] * row[4]
        lpos, ldir = row[5:8], row[8:11]
        att_c, att_l, att_q = row[11], row[12], row[13]
        cos_angle = row[14]
        ambient = jnp.maximum(ambient, row[15])
        to_light = lpos[None, None, :] - pos
        dist = jnp.maximum(jnp.linalg.norm(to_light, axis=-1, keepdims=True), 1e-6)
        l_point = to_light / dist
        l_dir = -ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-6)
        l_vec = jnp.where(ltype == LIGHT_DIRECTIONAL, l_dir[None, None, :], l_point)
        lambert = jnp.maximum(jnp.sum(n * l_vec, axis=-1, keepdims=True), 0.0)
        atten = jnp.where(
            ltype == LIGHT_DIRECTIONAL,
            1.0,
            1.0 / jnp.maximum(att_c + att_l * dist + att_q * dist * dist, 1e-6),
        )
        # spot cone falloff: zero outside the half-angle
        in_cone = jnp.sum(-l_point * l_dir[None, None, :], axis=-1, keepdims=True) >= cos_angle
        spot = jnp.where(ltype == LIGHT_SPOT, in_cone.astype(color.dtype), 1.0)
        diffuse = diffuse + lcol[None, None, :] * lambert * atten * spot
    lit = color[..., :3] * (ambient + diffuse)
    rgb = jnp.where(has_geom[..., None], lit, color[..., :3])
    return jnp.concatenate([rgb, color[..., 3:]], axis=-1)


@partial(jax.jit, static_argnames=("params",))
def post_process(color: jax.Array, params: PostProcessParams = PostProcessParams()) -> jax.Array:
    """default_post_process.frag.glsl, applied in shader order."""
    rgb = color[..., :3]
    p = params
    if p.enable_gamma:
        rgb = jnp.power(jnp.maximum(rgb, 1e-8), 1.0 / p.gamma)
    rgb = rgb * p.exposure
    rgb = 0.5 * (1.0 - p.saturation) + rgb * p.saturation  # mix(vec3(0.5), rgb, sat)
    rgb = rgb * p.brightness
    rgb = (rgb - 0.5) * p.contrast + 0.5
    if p.enable_hdr:
        rgb = rgb / (rgb + 1.0)
    return jnp.concatenate([rgb, color[..., 3:]], axis=-1)
