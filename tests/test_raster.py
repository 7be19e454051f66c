"""Rasterizer tests: coverage, z-buffering, perspective-correct interpolation,
backface culling, transform math (reference semantics: GL pipeline through
default_Gbuffer.vert.glsl + fixed-function raster)."""

import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.engine.mesh import Mesh
from stable_renderer_tpu.ops.raster import (
    VisibilityBuffer,
    flat_vertex,
    interpolate,
    rasterize,
    vertex_stage,
)
from stable_renderer_tpu.ops.transforms import look_at, perspective, transform_points


def _fullscreen_tri():
    """One triangle covering the whole NDC screen, at fixed depth."""
    clip = jnp.asarray(
        [[-4.0, -4.0, 0.0, 1.0], [4.0, -4.0, 0.0, 1.0], [0.0, 6.0, 0.0, 1.0]]
    )
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    return clip, tris


def test_fullscreen_triangle_covers_everything():
    clip, tris = _fullscreen_tri()
    vis = rasterize(clip, tris, 16, 16)
    assert int((vis.tri_id >= 0).sum()) == 256
    np.testing.assert_allclose(np.asarray(vis.z), 0.5, atol=1e-5)  # z_ndc 0 -> 0.5
    np.testing.assert_allclose(np.asarray(vis.bary.sum(-1)), 1.0, atol=1e-5)


def test_empty_raster():
    clip = jnp.asarray([[0.0, 0.0, 0.0, 1.0]] * 3)
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)  # degenerate
    vis = rasterize(clip, tris, 8, 8)
    assert int((vis.tri_id >= 0).sum()) == 0
    assert float(vis.z.min()) == 1.0


def test_ztest_nearer_triangle_wins():
    # two fullscreen triangles at different depths; nearer (z=-0.5) must win
    clip_near = jnp.asarray(
        [[-4, -4, -0.5, 1.0], [4, -4, -0.5, 1.0], [0, 6, -0.5, 1.0]], jnp.float32
    )
    clip_far = jnp.asarray(
        [[-4, -4, 0.5, 1.0], [4, -4, 0.5, 1.0], [0, 6, 0.5, 1.0]], jnp.float32
    )
    clip = jnp.concatenate([clip_far, clip_near])
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    vis = rasterize(clip, tris, 8, 8)
    assert int(vis.tri_id[4, 4]) == 1
    np.testing.assert_allclose(float(vis.z[4, 4]), 0.25, atol=1e-5)
    # order independence
    vis2 = rasterize(clip, tris[::-1], 8, 8)
    assert int(vis2.tri_id[4, 4]) == 0


def test_backface_culling():
    clip, tris = _fullscreen_tri()
    vis_front = rasterize(clip, tris, 8, 8, cull_backface=True)
    assert int((vis_front.tri_id >= 0).sum()) > 0
    tris_flipped = tris[:, ::-1]
    vis_back = rasterize(clip, tris_flipped, 8, 8, cull_backface=True)
    assert int((vis_back.tri_id >= 0).sum()) == 0


def test_behind_camera_culled():
    clip = jnp.asarray(
        [[-4, -4, 0, -1.0], [4, -4, 0, 1.0], [0, 6, 0, 1.0]], jnp.float32
    )  # one vertex behind near plane (w < 0)
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    vis = rasterize(clip, tris, 8, 8)
    assert int((vis.tri_id >= 0).sum()) == 0


def test_interpolation_gradient():
    clip, tris = _fullscreen_tri()
    vis = rasterize(clip, tris, 32, 32)
    # attribute = clip x coordinate: should interpolate linearly left->right
    attr = clip[:, :1]
    out = np.asarray(interpolate(vis, tris, attr))[..., 0]
    assert out[16, 2] < out[16, 16] < out[16, 30]
    np.testing.assert_allclose(out[16, 16], 0.0, atol=0.3)


def test_perspective_correct_interpolation():
    # a triangle with very different w's: perspective-correct bary must weight
    # the near vertex more than screen-space lerp would.
    clip = jnp.asarray(
        [[-10.0, -2.0, 0.0, 2.0], [10.0, -2.0, 0.0, 2.0], [0.0, 30.0, 0.0, 20.0]]
    )
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    vis = rasterize(clip, tris, 33, 33)
    attr = jnp.asarray([[0.0], [0.0], [1.0]])  # 1 at the far vertex
    out = np.asarray(interpolate(vis, tris, attr))[..., 0]
    mid = out[16, 16]
    assert 0 < mid < 0.4  # screen-space lerp would be ~0.5; perspective pulls it down


def test_flat_vertex_modes():
    clip, tris = _fullscreen_tri()
    vis = rasterize(clip, tris, 16, 16)
    vids = jnp.asarray([10, 20, 30], jnp.int32)
    prov = np.asarray(flat_vertex(vis, tris, vids, mode="provoking"))
    inside = np.asarray(vis.tri_id >= 0)
    assert set(prov[inside].tolist()) == {30}
    near = np.asarray(flat_vertex(vis, tris, vids, mode="nearest"))
    # corners of the screen are nearest distinct vertices
    assert len(set(near[inside].tolist())) == 3


def test_vertex_stage_sphere_normals_face_camera():
    mesh = Mesh.Sphere(radius=1.0, segments=8)
    view = look_at(jnp.asarray([0.0, 0.0, 3.0]), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(45.0, 1.0, 0.1, 100.0)
    clip, view_pos, vn = vertex_stage(
        jnp.asarray(mesh.positions), jnp.asarray(mesh.normals), view, proj
    )
    vis = rasterize(clip, jnp.asarray(mesh.tris), 32, 32, cull_backface=True)
    assert int((vis.tri_id >= 0).sum()) > 100  # sphere visible
    n_px = np.asarray(interpolate(vis, jnp.asarray(mesh.tris), vn))
    center_n = n_px[16, 16]
    assert center_n[2] > 0.8  # center of sphere faces camera (+z in view space)
    # view pos z must be negative (in front of camera, GL convention)
    vp = np.asarray(interpolate(vis, jnp.asarray(mesh.tris), view_pos))
    assert vp[16, 16, 2] < 0


def test_transform_points_roundtrip():
    pts = jnp.asarray([[1.0, 2.0, 3.0]])
    view = look_at(jnp.asarray([0.0, 0.0, 5.0]), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    out = np.asarray(transform_points(view, pts))
    np.testing.assert_allclose(out[0], [1.0, 2.0, -2.0], atol=1e-5)


def test_obj_roundtrip(tmp_path):
    cube = Mesh.Cube(1.0)
    obj = tmp_path / "cube.obj"
    lines = []
    for p in cube.positions:
        lines.append(f"v {p[0]} {p[1]} {p[2]}")
    for n in cube.normals:
        lines.append(f"vn {n[0]} {n[1]} {n[2]}")
    for t in cube.uvs:
        lines.append(f"vt {t[0]} {t[1]}")
    for tri in cube.tris:
        lines.append(
            "f " + " ".join(f"{i+1}/{i+1}/{i+1}" for i in tri)
        )
    obj.write_text("\n".join(lines))
    loaded = Mesh.Load(obj)
    assert loaded.triangle_count == cube.triangle_count
    assert loaded.vertex_count == cube.vertex_count
    np.testing.assert_allclose(
        np.sort(loaded.positions.ravel()), np.sort(cube.positions.ravel()), atol=1e-5
    )
