"""HWIO conv-weight compute view (round-4 perf: scripts/sweep_conv.py measured
OIHW paying a relayout inside the conv lowering on TPU — 1.1-1.65x at the SD
hot shapes). Canonical trees stay checkpoint-format OIHW; the jitted programs
consume the cached HWIO view from DiffusionPipeline.compute_params."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.unet import TINY_UNET_CONFIG, UNetModel
from stable_renderer_tpu.models.vae import TINY_VAE_CONFIG, VAE
from stable_renderer_tpu.models.weights import flatten, tree_to_hwio


def test_tree_to_hwio_structure():
    unet = UNetModel(TINY_UNET_CONFIG)
    params = unet.init(jax.random.PRNGKey(0))
    view = tree_to_hwio(params)
    fp, fv = flatten(params), flatten(view)
    convs = [k for k, v in fp.items()
             if k.endswith(".weight") and getattr(v, "ndim", 0) == 4]
    assert convs, "tiny UNet should have conv weights"
    for k in convs:
        hk = k[: -len(".weight")] + ".w_hwio"
        assert hk in fv and k not in fv
        np.testing.assert_array_equal(
            np.asarray(fv[hk]), np.asarray(fp[k]).transpose(2, 3, 1, 0))
    # linear weights untouched
    lin = [k for k, v in fp.items()
           if k.endswith(".weight") and getattr(v, "ndim", 0) == 2]
    for k in lin[:5]:
        assert k in fv


def test_unet_forward_exact_with_hwio_view():
    unet = UNetModel(TINY_UNET_CONFIG)
    params = unet.init(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    t = jnp.asarray([321.0])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 64))
    a = unet.apply(params, x, t, ctx)
    b = unet.apply(tree_to_hwio(params), x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vae_roundtrip_exact_with_hwio_view():
    vae = VAE(TINY_VAE_CONFIG)
    params = vae.init(jax.random.PRNGKey(4))
    view = tree_to_hwio(params)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3)) * 2 - 1
    np.testing.assert_allclose(
        np.asarray(vae.encode(params, x)), np.asarray(vae.encode(view, x)),
        atol=1e-5)
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 4))
    np.testing.assert_allclose(
        np.asarray(vae.decode(params, z)), np.asarray(vae.decode(view, z)),
        atol=1e-5)


def test_compute_params_cache_and_invalidation():
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.workflow.config import ControlNetSpec, RenderConfig

    pipe = DiffusionPipeline.from_random(
        RenderConfig(prompt="x", steps=2), tiny=True)
    v1 = pipe.compute_params()
    v2 = pipe.compute_params()
    assert v1 is v2  # cached
    fv = flatten(v1[0])
    assert any(k.endswith(".w_hwio") for k in fv)
    pipe.unet_params = dict(pipe.unet_params)  # swap -> invalidate
    v3 = pipe.compute_params()
    assert v3 is not v1
    # controlnet appends invalidate too
    pipe.add_random_controlnet(ControlNetSpec(source="normal"))
    v4 = pipe.compute_params()
    assert v4 is not v3 and len(v4[2]) == 1
    assert any(k.endswith(".w_hwio") for k in flatten(v4[2][0]))
