"""Pallas tile rasterizer vs the XLA reference rasterizer (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stable_renderer_tpu.ops.raster_pallas as rp
from stable_renderer_tpu.engine.mesh import Mesh
from stable_renderer_tpu.ops.raster import rasterize, vertex_stage
from stable_renderer_tpu.ops.transforms import look_at, perspective


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = rp.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(rp.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("cull", [False, True])
def test_pallas_matches_xla_raster(cull):
    mesh = Mesh.Sphere(1.0, 12)
    view = look_at(jnp.asarray([0.0, 0.5, 3.0]), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(45.0, 1.0, 0.1, 100.0)
    clip, _, _ = vertex_stage(jnp.asarray(mesh.positions), jnp.asarray(mesh.normals), view, proj)
    tris = jnp.asarray(mesh.tris)
    ref = rasterize(clip, tris, 64, 64, cull_backface=cull)
    out = rp.rasterize_pallas(clip, tris, 64, 64, tile=32, cull_backface=cull)
    ref_cov = np.asarray(ref.tri_id >= 0)
    out_cov = np.asarray(out.tri_id >= 0)
    # coverage identical up to edge-on numeric ties (<0.5% of pixels)
    assert (ref_cov != out_cov).mean() < 0.005
    both = ref_cov & out_cov
    np.testing.assert_allclose(np.asarray(out.z)[both], np.asarray(ref.z)[both], atol=1e-4)
    # same triangle wins where z separation is meaningful
    same_tri = (np.asarray(out.tri_id) == np.asarray(ref.tri_id))[both]
    assert same_tri.mean() > 0.98
    np.testing.assert_allclose(
        np.asarray(out.bary)[both].sum(-1), 1.0, atol=1e-4
    )
    b_match = np.isclose(
        np.asarray(out.bary)[both], np.asarray(ref.bary)[both], atol=1e-3
    ).all(-1)
    assert b_match[same_tri].mean() > 0.98


def test_pallas_behind_camera_culled():
    clip = jnp.asarray([[-4, -4, 0, -1.0], [4, -4, 0, 1.0], [0, 6, 0, 1.0]], jnp.float32)
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    vis = rp.rasterize_pallas(clip, tris, 32, 32, tile=32)
    assert int((vis.tri_id >= 0).sum()) == 0


def test_pallas_ztest():
    clip_near = jnp.asarray([[-4, -4, -0.5, 1.0], [4, -4, -0.5, 1.0], [0, 6, -0.5, 1.0]], jnp.float32)
    clip_far = jnp.asarray([[-4, -4, 0.5, 1.0], [4, -4, 0.5, 1.0], [0, 6, 0.5, 1.0]], jnp.float32)
    clip = jnp.concatenate([clip_far, clip_near])
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    vis = rp.rasterize_pallas(clip, tris, 32, 32, tile=32)
    assert int(vis.tri_id[16, 16]) == 1
    np.testing.assert_allclose(float(vis.z[16, 16]), 0.25, atol=1e-5)
