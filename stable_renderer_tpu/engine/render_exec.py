"""Draw execution + frame packing: host glue around the compiled raster passes.

This is the compute half of RenderManager.on_frame_run
(reference: renderManager.py:950-1047 + _save_frame_data :877-948), re-shaped for
XLA: each DrawCall runs as one jitted vertex+raster+shade+compose pass; mesh
buffers are cached on device per Mesh object (the ResourcesManager 'upload'
equivalent); frame packing (noise 8x8-mean pooling + AdaIN renorm + background
noise fill + mask derivation) is one fused jitted function.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.data.framebuffers import GBuffer
from stable_renderer_tpu.engine.mesh import Mesh
from stable_renderer_tpu.ops.gbuffer import compose_draw, shade_draw
from stable_renderer_tpu.ops.math import adain, downsample_mean
from stable_renderer_tpu.ops.raster import rasterize_auto, vertex_stage

_mesh_cache: dict = {}


def mesh_device_buffers(mesh: Mesh) -> dict:
    """Cache (positions/normals/uvs/colors/vertex_ids/tris) as device arrays."""
    key = id(mesh)
    if key not in _mesh_cache:
        _mesh_cache[key] = dict(
            positions=jnp.asarray(mesh.positions),
            normals=jnp.asarray(mesh.normals),
            uvs=jnp.asarray(mesh.uvs),
            colors=jnp.asarray(mesh.colors),
            vertex_ids=jnp.asarray(mesh.vertex_ids),
            tris=jnp.asarray(mesh.tris),
        )
    return _mesh_cache[key]


@partial(jax.jit, static_argnames=("uniforms", "height", "width", "corrmap_size",
                                   "fragment_fn", "vertex_fn"))
def _draw_pass(
    prev: GBuffer,
    prev_zbuf: jax.Array,
    buffers: dict,
    mv: jax.Array,
    proj: jax.Array,
    uniforms,
    height: int,
    width: int,
    diffuse: Optional[jax.Array] = None,
    noise: Optional[jax.Array] = None,
    corrmap_values: Optional[jax.Array] = None,
    corrmap_size=(512, 512),
    fragment_fn=None,  # user shader hooks (engine/shader.py), static
    vertex_fn=None,
):
    if vertex_fn is not None:
        clip, view_pos, view_normal = vertex_fn(
            buffers["positions"], buffers["normals"], mv, proj
        )
    else:
        clip, view_pos, view_normal = vertex_stage(
            buffers["positions"], buffers["normals"], mv, proj
        )
    vis = rasterize_auto(clip, buffers["tris"], height, width, cull_backface=True)
    gbuf = shade_draw(
        vis,
        buffers["tris"],
        view_pos,
        view_normal,
        buffers["uvs"],
        buffers["colors"],
        buffers["vertex_ids"],
        uniforms,
        diffuse_tex=diffuse,
        noise_tex=noise,
        corrmap_values=corrmap_values,
        corrmap_size=corrmap_size,
        fragment_fn=fragment_fn,
    )
    return compose_draw(prev, prev_zbuf, gbuf, vis, uniforms.render_mode)


def execute_draws(draws: List, camera, height: int, width: int) -> GBuffer:
    """Run the sorted draw list into a fresh G-buffer (the gbuffer pass,
    renderManager.py:962-965)."""
    gbuf = GBuffer.empty(height, width)
    zbuf = jnp.ones((height, width))
    if camera is None or not draws:
        return gbuf
    view = jnp.asarray(camera.viewMatrix)
    proj = jnp.asarray(camera.projectionMatrix(width / height))
    for dc in draws:
        buffers = mesh_device_buffers(dc.mesh)
        mv = view @ jnp.asarray(dc.model_matrix)
        corr_vals = None
        corr_size = (512, 512)
        if dc.corrmap is not None:
            corr_vals = dc.corrmap.values
            corr_size = (dc.corrmap.height, dc.corrmap.width)
        gbuf, zbuf = _draw_pass(
            gbuf,
            zbuf,
            buffers,
            mv,
            proj,
            dc.uniforms,
            height,
            width,
            diffuse=None if dc.diffuse is None else dc.diffuse.array,
            noise=None if dc.noise is None else dc.noise.array,
            corrmap_values=corr_vals,
            corrmap_size=corr_size,
            fragment_fn=None if dc.shader is None else dc.shader.bound_fragment(),
            vertex_fn=None if dc.shader is None else dc.shader.vertex_fn,
        )
    return gbuf


@jax.jit
def _pack_arrays(gbuf: GBuffer, bg_noise: jax.Array):
    """_save_frame_data's tensor math (renderManager.py:877-948) as one fusion."""
    color = gbuf.color
    mask = 1.0 - color[..., 3]  # background mask = 1 - alpha
    noise = gbuf.noise[None]  # (1, H, W, 4)
    m = mask[None, ..., None]
    noise_filled = noise * (1.0 - m) + bg_noise * m
    pooled = downsample_mean(noise_filled, 8)
    renormed = adain(pooled, noise_filled)
    depth = gbuf.normal_depth[..., 3:4]
    return dict(
        color=color[..., :3],
        mask=mask,
        id=gbuf.id,
        pos=gbuf.pos,
        normal=gbuf.normal_depth[..., :3],
        depth=jnp.concatenate([depth] * 3, axis=-1),
        noise=renormed[0],
        canny=gbuf.canny,
    )


def pack_frame_data(gbuf: GBuffer, bg_noise: jax.Array, frame_index: int) -> dict:
    pack = _pack_arrays(gbuf, bg_noise)
    pack["frame_index"] = frame_index
    return pack
