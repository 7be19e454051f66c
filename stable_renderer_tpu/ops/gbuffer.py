"""Deferred G-buffer shading — the default_Gbuffer.frag.glsl equivalent.

Consumes a VisibilityBuffer (ops/raster.py) plus per-vertex attributes and
per-draw uniforms, and produces/composes the 6-channel GBuffer with the exact
semantics of the reference fragment shader
(reference: engine/shaders/default_Gbuffer.frag.glsl):

  * ID packing (spriteID, materialID, map_index, vertexID)        frag:125-147
  * view-angle -> map_index binning for AI objects (k*k bins)     frag:150-162
  * texcoord-as-vertexID option                                   frag:128-147
  * normal-angle canny edges (80 degree threshold)                frag:186-190
  * BAKED-mode color lookup from the CorrespondMap array          frag:176-205
  * manual blending against the previous draw's G-buffer          frag:194-233
  * inverted depth (closer = white)                               frag:110

Render modes (reference enums.py RenderMode): 0 = NORMAL, 1 = BAKED (sample
corrmap), 2 = BAKING.

BAKING-mode note: the reference FS emits zero color and restores previous
color/normal/depth for baking fragments (frag:172-174, 197-205) — but only because
a separate "identical G-buffer" pre-pass (renderManager.py:954-959, 856-867) has
already rendered the AI object in full into those buffers; the restore protects the
pre-pass output from being clobbered. The NET result (verified against the
reference's own bake dumps, resources/example-map-outputs/miku-sphere: color and
normal maps contain the fully-shaded object) is that a baking object contributes
full color/normal/depth/noise + view-binned IDs. This build implements that net
semantics directly — BAKING shades like NORMAL but packs AI ids — collapsing the
reference's two-pass dance into one draw.

Design notes (TPU):
  * One draw = one fully-vectorized shading pass over the frame; draws compose
    sequentially (the reference's task-queue draw order) but each is one fused
    XLA computation; uniforms are Python ints so XLA dead-codes unused paths.
  * The GL depth attachment becomes an explicit window-z buffer threaded through
    ``compose_draw`` (the reference's per-FBO depth test).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.data.framebuffers import GBuffer, NON_AI_MAP_INDEX
from stable_renderer_tpu.ops.raster import VisibilityBuffer, flat_vertex, interpolate
from stable_renderer_tpu.ops.texture import sample_bilinear, sample_nearest

RENDER_MODE_NORMAL = 0
RENDER_MODE_BAKED = 1
RENDER_MODE_BAKING = 2


@dataclass(frozen=True)
class DrawUniforms:
    """Per-draw shader uniforms (reference frag uniforms, frag:83-97).

    These are Python-level constants for a compiled draw — each unique combination
    compiles its own specialized pass.
    """

    sprite_id: int = 0
    material_id: int = 0
    render_mode: int = RENDER_MODE_NORMAL
    corrmap_k: int = 3
    use_texcoord_as_id: bool = False
    has_vertex_color: bool = True
    default_id_size: Tuple[int, int] = (512, 512)  # (H, W) for texcoord-as-id


def view_angle_map_index(view_normal: jax.Array, k: int) -> jax.Array:
    """View-direction binning: which of the k*k corrmap layers a pixel belongs to.

    Byte-for-byte port of the reference's (idiosyncratic) math, frag:150-162:
    the 'angles' are actually cosines fed through ``PI/2 - cos`` — kept verbatim
    for correspondence parity with reference-baked maps.

    Args:
      view_normal: (..., 3) normalized view-space normal.
    Returns:
      (...,) int32 in [0, k*k).
    """
    n = view_normal
    eps = 1e-8
    yz = n[..., 1:3] / jnp.maximum(
        jnp.linalg.norm(jnp.concatenate([jnp.zeros_like(n[..., :1]), n[..., 1:3]], -1), axis=-1, keepdims=True),
        eps,
    )
    theta = yz[..., 0]  # dot(normalize((0, ny, nz)), (0,1,0))
    theta = math.pi / 2 - theta
    xz = jnp.stack([n[..., 0], n[..., 2]], axis=-1)
    xz = xz / jnp.maximum(jnp.linalg.norm(xz, axis=-1, keepdims=True), eps)
    phi = xz[..., 0]  # dot(normalize((nx, 0, nz)), (1,0,0))
    phi = math.pi / 2 - phi
    angle_step = math.pi / k
    x_index = jnp.clip((theta / angle_step).astype(jnp.int32), 0, k - 1)
    y_index = jnp.clip((phi / angle_step).astype(jnp.int32), 0, k - 1)
    return x_index + (k - 1 - y_index) * k


def texcoord_vertex_id(uv: jax.Array, height: int, width: int) -> jax.Array:
    """vertexID = int(v * H * W + u * W) (reference frag:128-147)."""
    return (uv[..., 1] * height * width + uv[..., 0] * width).astype(jnp.int32)


def canny_from_normal(view_normal: jax.Array) -> jax.Array:
    """Normal-angle edges: white where the surface grazes the view direction
    (cos between view normal and +Z in (0, cos 80deg)), reference frag:186-190."""
    cos_v = view_normal[..., 2]
    threshold = math.cos(math.pi * 4 / 9)
    edge = (cos_v < threshold) & (cos_v > 0.0)
    return jnp.broadcast_to(edge[..., None].astype(jnp.float32), (*edge.shape, 3))


@partial(jax.jit, static_argnames=("uniforms", "corrmap_size", "fragment_fn"))
def shade_draw(
    vis: VisibilityBuffer,
    tris: jax.Array,
    view_pos: jax.Array,      # (V, 3)
    view_normal: jax.Array,   # (V, 3)
    uv: jax.Array,            # (V, 2)
    vertex_color: jax.Array,  # (V, 3)
    vertex_ids: jax.Array,    # (V,) int32
    uniforms: DrawUniforms,
    diffuse_tex: Optional[jax.Array] = None,   # (Ht, Wt, 4)
    noise_tex: Optional[jax.Array] = None,     # (Hn, Wn, 4)
    corrmap_values: Optional[jax.Array] = None,  # (k*k, Hc*Wc, C)
    corrmap_size: Tuple[int, int] = (512, 512),
    fragment_fn=None,  # user shader hook (engine/shader.py): FragmentInputs -> color
) -> GBuffer:
    """Shade one draw into a standalone GBuffer (no composition yet)."""
    covered = vis.tri_id >= 0
    h, w = vis.z.shape
    u = uniforms

    pos = interpolate(vis, tris, view_pos)
    n = interpolate(vis, tris, view_normal)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    uv_px = interpolate(vis, tris, uv)
    vcol = interpolate(vis, tris, vertex_color)

    inv_depth = jnp.where(covered, 1.0 - vis.z, 0.0)
    normal_depth = jnp.concatenate([n * 0.5 + 0.5, inv_depth[..., None]], axis=-1)
    normal_depth = jnp.where(covered[..., None], normal_depth, 0.0)

    # --- noise (frag:103-107) ---
    if noise_tex is not None:
        noise = sample_nearest(noise_tex, uv_px)
    else:
        noise = jnp.zeros((h, w, 4), jnp.float32)
    noise = jnp.where(covered[..., None], noise, 0.0)

    # --- vertex id (frag:125-147) ---
    if u.use_texcoord_as_id:
        if diffuse_tex is not None:
            id_h, id_w = diffuse_tex.shape[0], diffuse_tex.shape[1]
        elif corrmap_values is not None:
            id_h, id_w = corrmap_size
        else:
            id_h, id_w = u.default_id_size
        pix_vid = texcoord_vertex_id(uv_px, id_h, id_w)
    else:
        pix_vid = flat_vertex(vis, tris, vertex_ids, mode="nearest")

    # --- map index + id packing (frag:149-168) ---
    if u.render_mode == RENDER_MODE_NORMAL:
        map_index = jnp.full((h, w), NON_AI_MAP_INDEX, jnp.int32)
    else:
        map_index = view_angle_map_index(n, u.corrmap_k)
    ids = jnp.stack(
        [
            jnp.full((h, w), u.sprite_id, jnp.int32),
            jnp.full((h, w), u.material_id, jnp.int32),
            map_index,
            pix_vid.astype(jnp.int32),
        ],
        axis=-1,
    )
    ids = jnp.where(covered[..., None], ids, 0)

    # --- color (frag:170-205; BAKING shades like NORMAL, see module docstring) ---
    if u.render_mode == RENDER_MODE_BAKED and corrmap_values is not None:
        ch, cw = corrmap_size
        c = corrmap_values.shape[-1]
        if u.use_texcoord_as_id:
            # reference samples texture(corrmap, vec3(uv.y, uv.x, map)) — swapped
            # axes (frag:181-187); replicated for baked-map interchange parity.
            cu = jnp.clip(uv_px[..., 1], 0.0, 1.0)
            cv = jnp.clip(uv_px[..., 0], 0.0, 1.0)
            cx = jnp.minimum((cu * cw).astype(jnp.int32), cw - 1)
            cy = jnp.minimum(((1.0 - cv) * ch).astype(jnp.int32), ch - 1)
            cell = cy * cw + cx
        else:
            cell = jnp.clip(pix_vid, 0, ch * cw - 1)
        layer_maps = corrmap_values  # (k2, M, C)
        color = layer_maps[jnp.clip(map_index, 0, layer_maps.shape[0] - 1), cell]
        if c == 3:
            color = jnp.concatenate([color, jnp.ones_like(color[..., :1])], axis=-1)
    elif diffuse_tex is not None:
        color = sample_bilinear(diffuse_tex, uv_px)
        if color.shape[-1] == 3:
            color = jnp.concatenate([color, jnp.ones_like(color[..., :1])], axis=-1)
    elif u.has_vertex_color:
        color = jnp.concatenate([vcol, jnp.ones_like(vcol[..., :1])], axis=-1)
    elif u.render_mode == RENDER_MODE_BAKED:
        # pink = baked object without corrmap or texture (frag:196-199)
        color = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 1.0, 1.0]), (h, w, 4))
    else:
        color = jnp.zeros((h, w, 4), jnp.float32)
    color = jnp.where(covered[..., None], color, 0.0)

    if fragment_fn is not None:
        # user programmable fragment stage (engine/shader.py): traces into
        # this same compiled pass — replaces the reference's GLSL fragment
        # shader (shader.py:391-570) with zero extra dispatch
        from stable_renderer_tpu.engine.shader import FragmentInputs

        user_color = fragment_fn(FragmentInputs(
            view_pos=pos, normal=n, uv=uv_px, vertex_color=vcol,
            color=color, covered=covered))
        if user_color.shape[-1] == 3:
            user_color = jnp.concatenate(
                [user_color, jnp.ones_like(user_color[..., :1])], -1)
        color = jnp.where(covered[..., None], user_color, 0.0)

    canny = jnp.where(covered[..., None], canny_from_normal(n), 0.0)
    pos = jnp.where(covered[..., None], pos, 0.0)

    return GBuffer(
        color=color, id=ids, pos=pos, normal_depth=normal_depth, noise=noise, canny=canny
    )


@partial(jax.jit, static_argnames=("render_mode",))
def compose_draw(
    prev: GBuffer,
    prev_zbuf: jax.Array,  # (H, W) window z (less = closer), 1.0 = empty
    new: GBuffer,
    vis: VisibilityBuffer,
    render_mode: int,
) -> Tuple[GBuffer, jax.Array]:
    """Depth-test + manual blend of one draw over the accumulated G-buffer.

    Reproduces the reference's blend block (frag:194-233) with the GL depth test
    made explicit: a fragment participates only when covered AND closer than the
    stored window z.
    """
    covered = vis.tri_id >= 0
    visible = covered & (vis.z < prev_zbuf)
    vis3 = visible[..., None]

    zbuf = jnp.where(visible, vis.z, prev_zbuf)

    alpha = new.color[..., 3]
    if render_mode == RENDER_MODE_BAKED:
        # Case A (frag:197-205): a BAKED fragment whose corrmap cell is unwritten
        # (alpha == 0) keeps all previous data, including IDs.
        case_a = visible & (alpha == 0.0)
    else:
        # NORMAL draws never hit case A; BAKING shades fully (module docstring).
        case_a = jnp.zeros_like(visible)

    keep_prev = case_a[..., None]
    color = jnp.where(keep_prev, prev.color, new.color)
    pos = jnp.where(keep_prev, prev.pos, new.pos)
    normal_depth = jnp.where(keep_prev, prev.normal_depth, new.normal_depth)
    canny = jnp.where(keep_prev, prev.canny, new.canny)
    ids = jnp.where(keep_prev, prev.id, new.id)
    noise = new.noise

    # Case B (frag:207-224): alpha blending for partially transparent fragments.
    case_b = visible & ~case_a & (alpha < 1.0)
    prev_inv_depth = prev.normal_depth[..., 3]
    new_inv_depth = new.normal_depth[..., 3]
    new_on_top = prev_inv_depth < new_inv_depth
    a = alpha[..., None]
    pa = prev.color[..., 3:4]
    blend_top = jnp.concatenate(
        [new.color[..., :3] * a + prev.color[..., :3] * (1 - a), a], axis=-1
    )
    blend_under = jnp.concatenate(
        [prev.color[..., :3] * pa + new.color[..., :3] * (1 - pa), pa], axis=-1
    )
    b_color = jnp.where(new_on_top[..., None], blend_top, blend_under)
    prev_has_noise = jnp.sum(prev.noise, axis=-1, keepdims=True) > 1e-3
    noise_top = jnp.where(prev_has_noise, new.noise * a + prev.noise * (1 - a), new.noise)
    noise_under = jnp.where(prev_has_noise, prev.noise * pa + new.noise * (1 - pa), new.noise)
    b_noise = jnp.where(new_on_top[..., None], noise_top, noise_under)
    b_nd = jnp.where(
        new_on_top[..., None],
        new.normal_depth,
        new.normal_depth.at[..., 3].set(prev_inv_depth),
    )

    color = jnp.where(case_b[..., None], b_color, color)
    noise = jnp.where(case_b[..., None], b_noise, noise)
    normal_depth = jnp.where(case_b[..., None], b_nd, normal_depth)

    # Invisible pixels keep everything previous.
    out = GBuffer(
        color=jnp.where(vis3, color, prev.color),
        id=jnp.where(vis3, ids, prev.id),
        pos=jnp.where(vis3, pos, prev.pos),
        normal_depth=jnp.where(vis3, normal_depth, prev.normal_depth),
        noise=jnp.where(vis3, noise, prev.noise),
        canny=jnp.where(vis3, canny, prev.canny),
    )
    return out, zbuf
