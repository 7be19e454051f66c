"""ControlLora + T2IAdapter tests (reference comfy/controlnet.py:303-560)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.controlnet import ControlNet, ControlNetConfig
from stable_renderer_tpu.models.t2i_adapter import (
    T2IAdapter,
    T2IAdapterConfig,
    load_t2i_adapter,
    pixel_unshuffle,
)
from stable_renderer_tpu.models.unet import TINY_UNET_CONFIG, UNetConfig, UNetModel
from stable_renderer_tpu.models.weights import flatten, nest

# SD15 topology at tiny widths: the t2i residual placement (blocks 2/5/8/11)
# assumes the 12-input-block layout
SD15_TINY = UNetConfig(
    model_channels=8,
    num_res_blocks=2,
    channel_mult=(1, 2, 4, 4),
    attention_levels=(0, 1, 2),
    num_heads=2,
    context_dim=32,
)


def test_pixel_unshuffle_matches_torch():
    import torch

    x = np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 4))
    ref = (
        torch.nn.PixelUnshuffle(4)(torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_t2i_adapter_feature_alignment_and_effect():
    """Adapter features land after input blocks 2/5/8/11 with matching channels
    and resolutions; residuals actually change the UNet output."""
    unet = UNetModel(SD15_TINY)
    up = unet.init(jax.random.PRNGKey(0))
    cfg = T2IAdapterConfig(channels=(8, 16, 32, 32), nums_rb=2, cin=192, ksize=1,
                           sk=True, use_conv=False)
    ad = T2IAdapter(cfg)
    ap = ad.init(jax.random.PRNGKey(1))
    hint = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    feats = ad.features(ap, hint)
    plan_in, _, _ = unet.block_plan()
    assert len(feats) == 12 == len(plan_in)
    present = [i for i, f in enumerate(feats) if f is not None]
    assert present == [2, 5, 8, 11]
    assert feats[2].shape == (1, 8, 8, 8)
    assert feats[5].shape == (1, 4, 4, 16)
    assert feats[8].shape == (1, 2, 2, 32)
    assert feats[11].shape == (1, 1, 1, 32)

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, 32))
    t = jnp.asarray([500.0])
    control = ad.apply(ap, x, hint, t, ctx, strength=1.0)
    out_ctl = unet.apply(up, x, t, ctx, control=control)
    out_plain = unet.apply(up, x, t, ctx)
    assert out_ctl.shape == out_plain.shape
    assert not np.allclose(np.asarray(out_ctl), np.asarray(out_plain))
    # strength 0 gates the residuals off
    control0 = ad.apply(ap, x, hint, t, ctx, strength=0.0)
    out_zero = unet.apply(up, x, t, ctx, control=control0)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_plain), atol=1e-6)


def test_t2i_adapter_loader_detection():
    """load_t2i_adapter reconstructs config from checkpoint keys
    (comfy controlnet.py:541-560)."""
    cfg = T2IAdapterConfig(channels=(8, 16, 32, 32), nums_rb=2, cin=192, ksize=1)
    ad = T2IAdapter(cfg)
    flat = {k: np.asarray(v) for k, v in flatten(ad.init(jax.random.PRNGKey(0))).items()}
    ad2, params = load_t2i_adapter(flat)
    assert ad2.config.cin == 192
    assert ad2.config.channels == (8, 16, 32, 32)
    assert ad2.config.ksize == 1 and not ad2.config.xl
    hint = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    f1 = ad.features(ad.init(jax.random.PRNGKey(0)), hint)
    f2 = ad2.features(params, hint)
    np.testing.assert_allclose(np.asarray(f1[2]), np.asarray(f2[2]), atol=1e-5)


def test_control_lora_composition():
    """init_control_lora: UNet trunk + low-rank deltas + full control tensors
    (comfy controlnet.py:303-352)."""
    unet = UNetModel(TINY_UNET_CONFIG)
    up = unet.init(jax.random.PRNGKey(0))
    cn = ControlNet(ControlNetConfig(unet=TINY_UNET_CONFIG))
    donor = cn.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    cw = {"lora_controlnet": np.zeros(1, np.float32)}
    for k, v in flatten(donor).items():
        if k.startswith(("zero_convs.", "input_hint_block.", "middle_block_out.")):
            cw[k] = np.asarray(v)
    target = "input_blocks.1.1.transformer_blocks.0.attn1.to_q"
    w = np.asarray(flatten(up)[target + ".weight"])
    upv = rng.normal(size=(w.shape[0], 4)).astype(np.float32) * 0.1
    down = rng.normal(size=(4, w.shape[1])).astype(np.float32) * 0.1
    cw[target + ".up"] = upv
    cw[target + ".down"] = down

    params = cn.init_control_lora(up, cw)
    flat_c = flatten(params)
    np.testing.assert_allclose(
        np.asarray(flat_c[target + ".weight"]), w + upv @ down, atol=1e-5
    )
    # untouched trunk weights come straight from the UNet
    np.testing.assert_allclose(
        np.asarray(flat_c["input_blocks.1.0.in_layers.2.weight"]),
        np.asarray(flatten(up)["input_blocks.1.0.in_layers.2.weight"]),
    )
    # the composed ControlNet runs
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    hint = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    ctl = cn.apply(params, x, hint, jnp.asarray([500.0]), jnp.zeros((1, 77, 64)))
    assert len(ctl["output"]) > 0 and ctl["middle"][0].shape[-1] > 0


def test_pipeline_t2i_adapter_render():
    """A pipeline frame renders with a T2I adapter hint (VERDICT r1 missing #8):
    the adapter layout needs the SD15 12-block plan, so build the pipeline on
    the tiny SD15-topology UNet."""
    from dataclasses import replace

    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.models.clip import CLIPTextModel, TINY_CLIP_CONFIG, Tokenizer
    from stable_renderer_tpu.models.vae import TINY_VAE_CONFIG, VAE
    from stable_renderer_tpu.workflow.config import ControlNetSpec, RenderConfig

    ucfg = replace(SD15_TINY, context_dim=64)
    ccfg = TINY_CLIP_CONFIG  # hidden 64 == ctx dim
    unet, vae, clip = UNetModel(ucfg), VAE(TINY_VAE_CONFIG), CLIPTextModel(ccfg)
    key = jax.random.PRNGKey(0)
    pipe = DiffusionPipeline(
        unet=unet, vae=vae, clip=clip, tokenizer=Tokenizer(ccfg),
        unet_params=unet.init(key),
        vae_params=vae.init(jax.random.fold_in(key, 1)),
        clip_params=clip.init(jax.random.fold_in(key, 2)),
        config=RenderConfig(steps=2, cfg_scale=1.0, sampler="euler"),
    )
    # tiny VAE halves: 32 img -> 16 latent -> 128 hint -> unshuffle(8) -> 16
    cfg = T2IAdapterConfig(channels=(8, 16, 32, 32), nums_rb=2, cin=192, ksize=1)
    ad = T2IAdapter(cfg)
    pipe.add_t2i_adapter(ad.init(jax.random.PRNGKey(7)), ControlNetSpec(source="normal"),
                         config=cfg)
    ed = EngineData(
        frame_indices=jnp.arange(1),
        color_maps=jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3)),
        normal_maps=jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)),
    )
    images = pipe.render(ed, key=jax.random.PRNGKey(2))
    assert images.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(images)).all()

import pytest  # noqa: E402
# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
