"""Raster + shade + pack profiler — in-jit stage timing (round-3 perf push).

Times the draw chain the fused frame program pays per frame: Pallas tile
rasterization, attribute shading, G-buffer compose, EngineData pack — each
iterated inside one jit (the axon dispatch floor makes per-op numbers lie).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(r):
    import numpy as np

    leaf = r[0] if isinstance(r, tuple) else r
    import jax

    leaf = jax.tree_util.tree_leaves(leaf)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def timed(fn, *args, n=5, warmup=1):
    r = None
    for _ in range(warmup):
        r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0) / n


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.data.framebuffers import GBuffer
    from stable_renderer_tpu.engine.mesh import Mesh
    from stable_renderer_tpu.engine.render_exec import _pack_arrays, mesh_device_buffers
    from stable_renderer_tpu.ops.gbuffer import DrawUniforms, compose_draw, shade_draw
    from stable_renderer_tpu.ops.raster import rasterize_auto, vertex_stage
    from stable_renderer_tpu.ops.transforms import look_at, perspective

    print(f"devices: {jax.devices()}")
    size = 512
    mesh = Mesh.Sphere(1.0, 48)
    buffers = mesh_device_buffers(mesh)
    view = look_at(jnp.asarray([0.0, 0.5, 3.0]), jnp.zeros(3),
                   jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(45.0, 1.0, 0.1, 100.0)
    uniforms = DrawUniforms(sprite_id=1, material_id=1)
    noise_tex = jax.random.normal(jax.random.PRNGKey(3), (256, 256, 4))
    bg_noise = jax.random.normal(jax.random.PRNGKey(7), (1, size, size, 4))
    N = 10

    def loop(fn):
        @jax.jit
        def run(*args):
            def body(i, acc):
                return fn(*args) if acc is None else fn(*args)
            out = fn(*args)
            for _ in range(N - 1):
                out = jax.tree_util.tree_map(lambda a, b: a + 0 * b, fn(*args), out)
            return out
        return run

    # stage 1: vertex + raster
    @jax.jit
    def raster_only(pos, nor, tris):
        out = None
        for i in range(N):
            clip, vp, vn = vertex_stage(pos, nor, view, proj)
            vis = rasterize_auto(clip + 0.0 * i, tris, size, size,
                                 cull_backface=True)
            out = vis.z if out is None else out + vis.z
        return out

    t = timed(raster_only, buffers["positions"], buffers["normals"],
              buffers["tris"]) / N
    print(f"vertex+raster {size}^2: {t * 1e3:7.3f} ms")

    # stage 2: full draw (raster + shade + compose)
    @jax.jit
    def full_draw(pos, nor, uv, col, vid, tris):
        acc = None
        for i in range(N):
            clip, vp, vn = vertex_stage(pos, nor, view, proj)
            vis = rasterize_auto(clip + 0.0 * i, tris, size, size,
                                 cull_backface=True)
            g = shade_draw(vis, tris, vp, vn, uv, col, vid, uniforms,
                           noise_tex=noise_tex)
            gb, zb = compose_draw(GBuffer.empty(size, size),
                                  jnp.ones((size, size)), g, vis,
                                  uniforms.render_mode)
            acc = gb.color if acc is None else acc + gb.color
        return acc

    t_full = timed(full_draw, buffers["positions"], buffers["normals"],
                   buffers["uvs"], buffers["colors"], buffers["vertex_ids"],
                   buffers["tris"]) / N
    print(f"draw total (raster+shade+compose): {t_full * 1e3:7.3f} ms")

    # stage 3: pack
    @jax.jit
    def pack_only(color):
        gb = GBuffer.empty(size, size)._replace(color=color)
        acc = None
        for i in range(N):
            p = _pack_arrays(gb._replace(color=color + 0.0 * i), bg_noise)
            acc = p["noise"] if acc is None else acc + p["noise"]
        return acc

    t = timed(pack_only, jnp.ones((size, size, 4))) / N
    print(f"pack (_pack_arrays incl. 8x pool + adain): {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
