"""G-buffer shading semantics tests vs the reference fragment shader
(default_Gbuffer.frag.glsl): ID packing, map_index binning, canny, render modes,
blending."""

import math

import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.data.framebuffers import GBuffer, NON_AI_MAP_INDEX
from stable_renderer_tpu.engine.mesh import Mesh
from stable_renderer_tpu.ops.gbuffer import (
    DrawUniforms,
    RENDER_MODE_BAKED,
    RENDER_MODE_BAKING,
    RENDER_MODE_NORMAL,
    canny_from_normal,
    compose_draw,
    shade_draw,
    texcoord_vertex_id,
    view_angle_map_index,
)
from stable_renderer_tpu.ops.raster import rasterize, vertex_stage
from stable_renderer_tpu.ops.transforms import look_at, perspective


def _sphere_draw(size=32, render_mode=RENDER_MODE_NORMAL, **uni):
    mesh = Mesh.Sphere(radius=1.0, segments=12)
    view = look_at(jnp.asarray([0.0, 0.0, 3.0]), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(45.0, 1.0, 0.1, 100.0)
    clip, view_pos, vn = vertex_stage(
        jnp.asarray(mesh.positions), jnp.asarray(mesh.normals), view, proj
    )
    tris = jnp.asarray(mesh.tris)
    vis = rasterize(clip, tris, size, size, cull_backface=True)
    uniforms = DrawUniforms(sprite_id=7, material_id=3, render_mode=render_mode, **uni)
    gbuf = shade_draw(
        vis,
        tris,
        view_pos,
        vn,
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.colors),
        jnp.asarray(mesh.vertex_ids),
        uniforms,
    )
    return vis, gbuf, mesh


def test_normal_mode_ids_and_channels():
    vis, gbuf, mesh = _sphere_draw()
    covered = np.asarray(vis.tri_id >= 0)
    ids = np.asarray(gbuf.id)
    assert (ids[covered][:, 0] == 7).all()
    assert (ids[covered][:, 1] == 3).all()
    assert (ids[covered][:, 2] == NON_AI_MAP_INDEX).all()
    assert (ids[~covered] == 0).all()
    # vertex color -> white opaque
    np.testing.assert_allclose(np.asarray(gbuf.color)[covered], 1.0, atol=1e-5)
    # depth inverted: covered pixels > 0
    d = np.asarray(gbuf.depth)
    assert (d[covered] > 0).all() and (d[~covered] == 0).all()
    # center normal ~ +z encoded at ~1.0
    c = np.asarray(gbuf.normal_depth)[16, 16]
    assert c[2] > 0.9
    # pos: view space, z negative at center
    assert np.asarray(gbuf.pos)[16, 16, 2] < 0


def test_baking_mode_emits_ids_and_full_shading():
    # net reference behavior (see gbuffer.py module docstring + miku-sphere
    # fixtures): baking objects contribute full color/normal + view-binned ids
    vis, gbuf, mesh = _sphere_draw(render_mode=RENDER_MODE_BAKING)
    covered = np.asarray(vis.tri_id >= 0)
    ids = np.asarray(gbuf.id)
    assert (ids[covered][:, 2] < 9).all()  # real map bins, k=3 default
    np.testing.assert_allclose(np.asarray(gbuf.color)[covered], 1.0, atol=1e-5)
    assert (np.asarray(gbuf.depth)[covered] > 0).all()


def test_view_angle_map_index_center_bin():
    # normal pointing straight at the camera (0,0,1): theta=phi=pi/2 -> index k//2
    # of middle row -> center of the k*k grid for odd k
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    idx = int(view_angle_map_index(n, 3)[0])
    assert idx == 4  # center of 3x3
    # tilted up normal moves vertical bin
    n_up = jnp.asarray([[0.0, 0.9, 0.43]])
    assert int(view_angle_map_index(n_up, 3)[0]) != 4
    idx9 = view_angle_map_index(jnp.asarray([[0.3, -0.2, 0.93]]), 3)
    assert 0 <= int(idx9[0]) < 9


def test_canny_threshold():
    # grazing normal (cos ~ 0.1) -> edge; facing (cos=1) -> no edge; back (cos<0) -> no
    n = jnp.asarray(
        [[[0.995, 0.0, 0.1], [0.0, 0.0, 1.0], [0.0, 0.0, -1.0]]]
    )
    canny = np.asarray(canny_from_normal(n))
    assert canny[0, 0, 0] == 1.0
    assert canny[0, 1, 0] == 0.0
    assert canny[0, 2, 0] == 0.0


def test_texcoord_vertex_id():
    uv = jnp.asarray([[0.5, 0.25]])
    vid = int(texcoord_vertex_id(uv, 512, 512)[0])
    assert vid == int(0.25 * 512 * 512 + 0.5 * 512)


def test_baked_mode_samples_corrmap():
    k = 3
    size = (8, 8)
    corr = np.zeros((k * k, 64, 4), np.float32)
    corr[:, :, 1] = 0.75  # green everywhere in every layer
    corr[:, :, 3] = 1.0
    vis, gbuf, mesh = _sphere_draw(render_mode=RENDER_MODE_BAKED)
    # redo shading with corrmap values
    from stable_renderer_tpu.ops.gbuffer import shade_draw as sd

    mesh2 = Mesh.Sphere(radius=1.0, segments=12)
    view = look_at(jnp.asarray([0.0, 0.0, 3.0]), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(45.0, 1.0, 0.1, 100.0)
    clip, view_pos, vn = vertex_stage(
        jnp.asarray(mesh2.positions), jnp.asarray(mesh2.normals), view, proj
    )
    tris = jnp.asarray(mesh2.tris)
    vis = rasterize(clip, tris, 32, 32, cull_backface=True)
    gbuf = sd(
        vis,
        tris,
        view_pos,
        vn,
        jnp.asarray(mesh2.uvs),
        jnp.asarray(mesh2.colors),
        jnp.asarray(mesh2.vertex_ids),
        DrawUniforms(sprite_id=1, render_mode=RENDER_MODE_BAKED, use_texcoord_as_id=True),
        corrmap_values=jnp.asarray(corr),
        corrmap_size=size,
    )
    covered = np.asarray(vis.tri_id >= 0)
    np.testing.assert_allclose(np.asarray(gbuf.color)[covered][:, 1], 0.75)


def test_compose_opaque_depth_wins():
    h = w = 16
    prev = GBuffer.empty(h, w)
    zbuf = jnp.ones((h, w))
    vis1, g1, _ = _sphere_draw(size=16)
    out, zbuf = compose_draw(prev, zbuf, g1, vis1, RENDER_MODE_NORMAL)
    covered = np.asarray(vis1.tri_id >= 0)
    assert (np.asarray(out.id)[covered][:, 0] == 7).all()
    # drawing the same sphere again further away must not overwrite
    mesh = Mesh.Sphere(radius=1.0, segments=12)
    view = look_at(jnp.asarray([0.0, 0.0, 5.0]), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(45.0, 1.0, 0.1, 100.0)
    clip, view_pos, vn = vertex_stage(
        jnp.asarray(mesh.positions), jnp.asarray(mesh.normals), view, proj
    )
    tris = jnp.asarray(mesh.tris)
    vis2 = rasterize(clip, tris, 16, 16, cull_backface=True)
    g2 = shade_draw(
        vis2, tris, view_pos, vn,
        jnp.asarray(mesh.uvs), jnp.asarray(mesh.colors), jnp.asarray(mesh.vertex_ids),
        DrawUniforms(sprite_id=9),
    )
    out2, zbuf = compose_draw(out, zbuf, g2, vis2, RENDER_MODE_NORMAL)
    # center pixel still belongs to the nearer first draw
    assert int(np.asarray(out2.id)[8, 8, 0]) == 7


def test_compose_baked_unwritten_cells_keep_previous():
    # BAKED fragments whose corrmap cell is unwritten (alpha==0) keep everything
    # previous, including ids (frag:197-205 case A)
    h = w = 16
    prev = GBuffer.empty(h, w)
    prev = prev._replace(
        color=jnp.full((h, w, 4), 0.5),
        id=jnp.full((h, w, 4), 9, jnp.int32),
    )
    zbuf = jnp.ones((h, w))
    vis, g, _ = _sphere_draw(size=16, render_mode=RENDER_MODE_BAKED)
    # no corrmap passed and has_vertex_color default True -> alpha=1 everywhere;
    # force alpha=0 to simulate unwritten cells
    g = g._replace(color=g.color.at[..., 3].set(0.0))
    out, _ = compose_draw(prev, zbuf, g, vis, RENDER_MODE_BAKED)
    covered = np.asarray(vis.tri_id >= 0)
    np.testing.assert_allclose(np.asarray(out.color)[covered][:, 0], 0.5)
    assert (np.asarray(out.id)[covered][:, 0] == 9).all()


def test_compose_transparent_blend():
    h = w = 8
    # previous: opaque red at depth 0.8 (far)
    prev = GBuffer.empty(h, w)
    prev = prev._replace(
        color=jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 1.0]), (h, w, 4)),
        normal_depth=jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1 - 0.8]), (h, w, 4)),
    )
    zbuf = jnp.full((h, w), 0.8)
    # new: fullscreen half-transparent green nearer (z=0.3)
    from stable_renderer_tpu.ops.raster import VisibilityBuffer

    vis = VisibilityBuffer(
        z=jnp.full((h, w), 0.3),
        tri_id=jnp.zeros((h, w), jnp.int32),
        bary=jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (h, w, 3)),
    )
    new = GBuffer.empty(h, w)._replace(
        color=jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0, 0.5]), (h, w, 4)),
        normal_depth=jnp.broadcast_to(jnp.asarray([0.0, 0, 0, 1 - 0.3]), (h, w, 4)),
    )
    out, zbuf2 = compose_draw(prev, zbuf, new, vis, RENDER_MODE_NORMAL)
    px = np.asarray(out.color)[4, 4]
    np.testing.assert_allclose(px, [0.5, 0.5, 0.0, 0.5], atol=1e-6)  # one-minus-src-alpha
    np.testing.assert_allclose(float(zbuf2[4, 4]), 0.3)
