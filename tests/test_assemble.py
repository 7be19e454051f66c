"""Unified denoiser assembly (models/sampling/assemble.py) tests.

Covers VERDICT r2 items #6 (9-channel inpaint-model c_concat) and #8 (one
shared conditioning/control/inpaint program builder behind BOTH the engine
pipeline and the executor KSampler, verified by output equality).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
from stable_renderer_tpu.data.engine_data import EngineData
from stable_renderer_tpu.models.unet import TINY_UNET_CONFIG, UNetModel
from stable_renderer_tpu.workflow.config import RenderConfig
from stable_renderer_tpu.workflow.executor import NODE_REGISTRY, InferenceContext


class _N:
    def __init__(self, type, widgets=None, id=1):
        self.type = type
        self.widgets = widgets or []
        self.id = id


def test_pipeline_and_executor_share_denoise_assembly():
    """The engine pipeline program and the executor KSampler graph produce the
    SAME image for the same model/config/noise — both assemble their denoiser
    through models/sampling/assemble.build_denoiser (VERDICT r2 #8)."""
    cfg = RenderConfig(prompt="a boat", negative_prompt="bad", steps=3,
                       cfg_scale=2.0, sampler="euler", scheduler="normal",
                       denoise=1.0, vertex_noise=False, keep_background=False)
    pipe = DiffusionPipeline.from_random(cfg, tiny=True, seed=3)
    key = jax.random.PRNGKey(123)

    h = w = 32
    color = jax.random.uniform(jax.random.PRNGKey(9), (1, h, w, 3))
    ed = EngineData(frame_indices=jnp.arange(1), color_maps=color)
    imgs_pipeline = pipe.render(ed, key=key)

    # --- executor graph: VAEEncode -> KSampler -> VAEDecode -----------------
    ictx = InferenceContext(model_dirs=(), jit_cache={})
    model = {"unet": pipe.unet, "params": pipe.unet_params,
             "sampling": pipe.model_sampling}
    vae = {"vae": pipe.vae, "params": pipe.vae_params}
    ctx_p, ctx_n = pipe.encode_prompts([cfg.prompt], [cfg.negative_prompt])
    (latent,) = NODE_REGISTRY["VAEEncode"](
        ictx, _N("VAEEncode"), pixels=color, vae=vae)
    # same starting noise the pipeline drew (pipeline.py _jit_render: no
    # noise_maps / id_maps -> jax.random.normal(key, latent.shape))
    latent["noise"] = jax.random.normal(key, latent["samples"].shape)
    (out_latent,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", widgets=[0, "fixed", cfg.steps, cfg.cfg_scale,
                                      cfg.sampler, cfg.scheduler, cfg.denoise]),
        model=model, positive={"context": ctx_p}, negative={"context": ctx_n},
        latent_image=latent)
    (imgs_exec,) = NODE_REGISTRY["VAEDecode"](
        ictx, _N("VAEDecode"), samples=out_latent, vae=vae)

    a, b = np.asarray(imgs_pipeline), np.asarray(imgs_exec)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-4)


def _tiny_inpaint_unet():
    cfg9 = dataclasses.replace(TINY_UNET_CONFIG, in_channels=9)
    unet = UNetModel(cfg9)
    params = unet.init(jax.random.PRNGKey(0))
    return unet, params


def test_inpaint_model_concat_denoise():
    """A 9-channel inpaint UNet denoises with [mask, masked-latent] concat
    channels (comfy model_base.py:93-126 extra_conds)."""
    from stable_renderer_tpu.models.sampling import (
        build_denoiser,
        calculate_sigmas,
        inpaint_concat_channels,
        sample,
    )
    from stable_renderer_tpu.models.sampling.schedules import ModelSampling

    unet, params = _tiny_inpaint_unet()
    ms = ModelSampling()
    key = jax.random.PRNGKey(1)
    latent = jax.random.normal(key, (2, 8, 8, 4))
    mask = jnp.zeros((2, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    concat = inpaint_concat_channels(latent, mask)
    assert concat.shape == (2, 8, 8, 5)
    ctx = jax.random.normal(key, (2, 7, unet.config.context_dim))
    den = build_denoiser(
        unet, params, cond_context=ctx, uncond_context=ctx,
        log_sigmas=jnp.asarray(ms.log_sigmas), cfg_scale=2.0,
        concat_latent=concat,
    )
    sigmas = jnp.asarray(calculate_sigmas(ms, "normal", 3, 1.0))
    noise = jax.random.normal(jax.random.fold_in(key, 1), latent.shape)
    out = sample(den, noise, sigmas, latent_image=latent, sampler="euler",
                 key=key)
    assert out.shape == latent.shape
    assert np.isfinite(np.asarray(out)).all()


def test_inpaint_model_checkpoint_detected_and_runs_in_executor():
    """detect_unet_config picks up in_channels=9 and the executor KSampler
    feeds concat channels automatically; pixels outside the noise_mask hole
    keep the source latent."""
    from stable_renderer_tpu.models.weights import detect_unet_config, flatten

    unet, params = _tiny_inpaint_unet()
    flat = {f"model.diffusion_model.{k}": np.asarray(v)
            for k, v in flatten(params).items()}
    cfg = detect_unet_config(flat)
    assert cfg.in_channels == 9

    from stable_renderer_tpu.models.sampling.schedules import ModelSampling

    ictx = InferenceContext(model_dirs=(), jit_cache={})
    model = {"unet": unet, "params": params, "sampling": ModelSampling()}
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, unet.config.context_dim))
    latent_arr = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    mask = np.zeros((1, 8, 8), np.float32)
    mask[:, 3:6, 3:6] = 1.0
    latent = {"samples": latent_arr, "noise_mask": jnp.asarray(mask)}
    (out,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", widgets=[0, "fixed", 2, 1.0, "euler", "normal", 1.0]),
        model=model, positive={"context": ctx}, negative=None,
        latent_image=latent)
    o = np.asarray(out["samples"])
    assert np.isfinite(o).all()
    # outside the hole the latent is kept (KSamplerX0Inpaint semantics)
    keep = (1.0 - mask)[..., None]
    np.testing.assert_allclose(o * keep, np.asarray(latent_arr) * keep, atol=1e-5)


def test_inpaint_model_conditioning_node():
    """InpaintModelConditioning returns both conds with the masked-image latent
    attached and a noise-masked latent (nodes.py InpaintModelConditioning)."""
    pipe = DiffusionPipeline.from_random(RenderConfig(), tiny=True, seed=0)
    vae = {"vae": pipe.vae, "params": pipe.vae_params}
    pixels = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3))
    mask = jnp.zeros((1, 32, 32)).at[:, 8:24, 8:24].set(1.0)
    pos, neg, latent = NODE_REGISTRY["InpaintModelConditioning"](
        InferenceContext(model_dirs=(), jit_cache={}),
        _N("InpaintModelConditioning"),
        positive={"context": jnp.zeros((1, 7, 64))},
        negative={"context": jnp.zeros((1, 7, 64))},
        vae=vae, pixels=pixels, mask=mask)
    assert "concat_latent_image" in pos and "concat_latent_image" in neg
    assert "noise_mask" in latent and "concat_latent_image" in latent
    assert latent["samples"].shape == latent["concat_latent_image"].shape
