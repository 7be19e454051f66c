"""Spherical cache + tiled VAE parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.data.spherical_cache import SphereCache, ViewPoint
from stable_renderer_tpu.models import VAE, TINY_VAE_CONFIG


def test_viewpoint_roundtrip():
    for d in ([0, 1, 0], [1, 0, 0], [0, 0, 1], [0.5, 0.5, 0.7]):
        vp = ViewPoint.from_direction(d)
        d2 = vp.direction()
        d_norm = np.asarray(d) / np.linalg.norm(d)
        np.testing.assert_allclose(d2, d_norm, atol=1e-5)
    up = ViewPoint.from_direction([0, 1, 0])
    side = ViewPoint.from_direction([1, 0, 0])
    assert up.angle_to(side) == pytest.approx(90.0, abs=1e-4)


def test_sphere_cache_nearest_within_threshold():
    cache = SphereCache(angle_threshold=30.0)
    cache.put([0, 1, 0], "top")
    cache.put([1, 0, 0], "side")
    assert cache.get([0.1, 1, 0.1]) == "top"
    assert cache.get([1, 0.2, 0]) == "side"
    assert cache.get([0, -1, 0]) is None  # nothing within 30 deg
    assert len(cache) == 2


def test_vae_tiled_decode_matches_full():
    vae = VAE(TINY_VAE_CONFIG)
    params = vae.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4)) * 0.2
    full = np.asarray(vae.decode(params, z))
    tiled = np.asarray(vae.decode_tiled(params, z, tile=8, overlap=4))
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
    # tiled decode is an approximation (the decoder's mid attention is global per
    # tile — same property as the reference's tiled fallback); with random weights
    # the divergence is amplified, so only bound it loosely
    diff = np.abs(full - tiled)
    assert np.median(diff) < 0.5
    # a tile covering the whole latent must reproduce the full decode exactly
    whole = np.asarray(vae.decode_tiled(params, z, tile=16, overlap=4))
    np.testing.assert_allclose(whole, full, atol=1e-4)


def test_vae_tiled_encode_shape():
    vae = VAE(TINY_VAE_CONFIG)
    params = vae.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 2 - 1
    z_t = vae.encode_tiled(params, x, tile=32, overlap=8)
    assert z_t.shape == (1, 32, 32, 4)
    z = np.asarray(vae.encode(params, x))
    assert np.median(np.abs(np.asarray(z_t) - z)) < 0.2
