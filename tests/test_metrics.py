"""Temporal-consistency metric tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.ops.metrics import (
    ssim,
    temporal_flicker_l1,
    temporal_flicker_ssim,
    vertex_flicker,
)


def test_ssim_identity_and_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    assert float(ssim(img, img)) > 0.999
    noisy = jnp.clip(img + jax.random.normal(jax.random.PRNGKey(1), img.shape) * 0.3, 0, 1)
    assert float(ssim(img, noisy)) < 0.9  # clearly below identity


def test_temporal_flicker_orders_sequences():
    stable = jnp.broadcast_to(
        jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3)), (4, 32, 32, 3)
    )
    keys = [jax.random.PRNGKey(i) for i in range(4)]
    flicker = jnp.stack([jax.random.uniform(k, (32, 32, 3)) for k in keys])
    assert float(temporal_flicker_l1(stable)) == 0.0
    assert float(temporal_flicker_l1(flicker)) > 0.2
    assert float(temporal_flicker_ssim(stable)) < 1e-4
    assert float(temporal_flicker_ssim(flicker)) > 0.5


def test_vertex_flicker_correspondence_aware():
    n, h, w = 3, 16, 16
    ids = np.zeros((n, h, w, 4), np.int32)
    # same vertex grid visible in all frames (static camera)
    for f in range(n):
        for y in range(4, 12):
            for x in range(4, 12):
                ids[f, y, x] = [1, 1, 0, y * w + x]
    ids_j = jnp.asarray(ids)
    base = jax.random.uniform(jax.random.PRNGKey(0), (1, h, w, 3))
    stable = jnp.broadcast_to(base, (n, h, w, 3))
    assert float(vertex_flicker(stable, ids_j, num_segments=1024)) < 1e-6
    flicker = jnp.stack(
        [jax.random.uniform(jax.random.PRNGKey(i), (h, w, 3)) for i in range(n)]
    )
    assert float(vertex_flicker(flicker, ids_j, num_segments=1024)) > 0.1
    # background changes do NOT count (mask-aware)
    bg_only = stable.at[:, 0, 0].set(
        jnp.stack([jnp.full((3,), i / 3.0) for i in range(n)])
    )
    assert float(vertex_flicker(bg_only, ids_j, num_segments=1024)) < 1e-6


def test_lpips_shapes_and_zero_distance():
    """LPIPS (VGG16 + lin heads) with random VGG-shaped weights: identical
    frames score exactly 0; different frames score > 0; jittable."""
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.ops.metrics import lpips, lpips_flicker

    rng = np.random.default_rng(0)
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    idxs = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    taps = {2: 64, 7: 128, 14: 256, 21: 512, 28: 512}
    flat = {}
    in_c = 3
    for i, o in zip(idxs, chans):
        flat[f"features.{i}.weight"] = rng.normal(size=(o, in_c, 3, 3)).astype(np.float32) * 0.05
        flat[f"features.{i}.bias"] = np.zeros(o, np.float32)
        in_c = o
    for k, (i, c) in enumerate(sorted(taps.items())):
        flat[f"lin{k}.model.1.weight"] = np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    d_same = np.asarray(lpips(flat, a, a))
    d_diff = np.asarray(lpips(flat, a, b))
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()
    frames = jnp.concatenate([a, b], axis=0)
    f = float(jax.jit(lpips_flicker)(frames, flat))
    assert f > 0 and np.isfinite(f)
