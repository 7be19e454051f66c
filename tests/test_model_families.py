"""Generic UNet architecture detection + the reference's full model-family zoo.

Covers the capability of comfy/model_detection.py detect_unet_config +
comfy/supported_models.py models list (reference supported_models.py:403):
per-block transformer depths (SSD-1B / Segmind Vega / KOALA layouts), missing
middle transformers, per-level res-block counts, disabled self-attention
(SD_X4Upscaler), SD2.1-unclip classification + the CLIP-embed noise augmentor
(model_base.py:271-295 unclip_adm).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.unet import UNetConfig, UNetModel
from stable_renderer_tpu.models.weights import (
    detect_model_family,
    detect_unet_config,
    flatten,
)


def _flat_from_config(cfg: UNetConfig):
    unet = UNetModel(cfg)
    params = unet.init(jax.random.PRNGKey(0))
    return {f"model.diffusion_model.{k}": np.asarray(v)
            for k, v in flatten(params).items()}, unet, params


def _tree_shapes(tree):
    return {k: tuple(v.shape) for k, v in flatten(tree).items()}


# --- SSD-1B-style: per-block depths, no middle transformer --------------------

SSD_LIKE = UNetConfig(
    in_channels=4,
    model_channels=32,
    channel_mult=(1, 2, 4),
    num_res_blocks=2,
    transformer_depth_blocks=(0, 0, 1, 1, 2, 2),
    transformer_depth_blocks_out=(0, 0, 0, 1, 1, 1, 2, 2, 2),
    transformer_depth_middle=-1,
    context_dim=64,
    head_dim=16,
    adm_in_channels=80,
)


def test_detect_per_block_depths_round_trip():
    """SSD-1B layout (supported_models.py:217: transformer_depth [0,0,2,2,4,4],
    middle transformer removed) detects exactly and re-initializes to the same
    param tree."""
    flat, unet, params = _flat_from_config(SSD_LIKE)
    cfg = detect_unet_config(flat)
    assert cfg.channel_mult == (1, 2, 4)
    assert cfg.num_res_blocks_per_level == (2, 2, 2)
    assert cfg.transformer_depth_blocks == (0, 0, 1, 1, 2, 2)
    assert cfg.transformer_depth_blocks_out == (0, 0, 0, 1, 1, 1, 2, 2, 2)
    assert cfg.transformer_depth_middle == -1
    assert cfg.adm_in_channels == 80
    re_params = UNetModel(cfg).init(jax.random.PRNGKey(1))
    assert _tree_shapes(re_params) == _tree_shapes(params)


def test_ssd_like_forward_runs():
    """The detected config runs: no middle transformer, depth-0 levels skip
    attention params entirely."""
    flat, unet, params = _flat_from_config(SSD_LIKE)
    cfg = detect_unet_config(flat)
    model = UNetModel(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 7, 64))
    y = jnp.zeros((1, 80))
    out = model.apply(params, x, jnp.array([1.0]), ctx, y=y)
    assert out.shape == (1, 16, 16, 4)
    assert "middle_block" in params and "1" not in params["middle_block"]


def test_detect_per_level_res_blocks():
    """KOALA-style pruned blocks (supported_models.py:237): one res block per
    level detects as num_res_blocks_per_level (1, 1, 1)."""
    cfg_in = UNetConfig(
        model_channels=32,
        channel_mult=(1, 2, 4),
        num_res_blocks=1,
        transformer_depth_blocks=(0, 1, 2),
        transformer_depth_blocks_out=(0, 0, 1, 1, 2, 2),
        transformer_depth_middle=1,
        context_dim=64,
        head_dim=16,
        adm_in_channels=80,
    )
    flat, _, params = _flat_from_config(cfg_in)
    cfg = detect_unet_config(flat)
    assert cfg.num_res_blocks_per_level == (1, 1, 1)
    assert cfg.transformer_depth_blocks == (0, 1, 2)
    assert cfg.transformer_depth_middle == 1
    re_params = UNetModel(cfg).init(jax.random.PRNGKey(1))
    assert _tree_shapes(re_params) == _tree_shapes(params)


# --- SD_X4Upscaler-style: disabled self-attention ------------------------------

def test_detect_disable_self_attn():
    """SD_X4Upscaler (supported_models.py:308): attn1 cross-attends the text
    context on the disabled levels — detected from the attn1.to_k input width."""
    cfg_in = UNetConfig(
        in_channels=7,
        model_channels=32,
        channel_mult=(1, 2),
        num_res_blocks=1,
        transformer_depth_blocks=(1, 1),
        transformer_depth_blocks_out=(1, 1, 1, 1),
        transformer_depth_middle=1,
        context_dim=48,
        head_dim=16,
        disable_self_attn_levels=(True, False),
    )
    flat, _, params = _flat_from_config(cfg_in)
    cfg = detect_unet_config(flat)
    assert cfg.disable_self_attn_levels == (True, False)
    assert cfg.in_channels == 7
    # forward runs with the context-width attn1 projections
    out = UNetModel(cfg).apply(
        params, jnp.zeros((1, 8, 8, 7)), jnp.array([1.0]), jnp.zeros((1, 5, 48))
    )
    assert out.shape == (1, 8, 8, 4)
    re_params = UNetModel(cfg).init(jax.random.PRNGKey(1))
    assert _tree_shapes(re_params) == _tree_shapes(params)


def test_sd15_detection_still_exact():
    """The generic walker reproduces the SD1.5 preset layout bit-for-bit."""
    from stable_renderer_tpu.models.unet import TINY_UNET_CONFIG

    flat, _, params = _flat_from_config(TINY_UNET_CONFIG)
    cfg = detect_unet_config(flat)
    re_params = UNetModel(cfg).init(jax.random.PRNGKey(1))
    assert _tree_shapes(re_params) == _tree_shapes(params)


# --- family classification -----------------------------------------------------

def _family_of(context_dim, adm, in_channels=4, extra_flat=None):
    cfg = UNetConfig(context_dim=context_dim, adm_in_channels=adm,
                     in_channels=in_channels)
    return detect_model_family(extra_flat or {}, cfg)


def test_family_classification():
    assert _family_of(768, None)["family"] == "sd1"
    assert _family_of(1024, None)["family"] == "sd2"
    assert _family_of(2048, 2816)["family"] == "sdxl"
    assert _family_of(1280, 2560)["family"] == "sdxl-refiner"
    f = _family_of(1024, 2048)
    assert f["family"] == "sd21-unclip" and f["prediction"] == "v"
    assert f["noise_aug_dim"] == 1024
    f = _family_of(1024, 1536)
    assert f["noise_aug_dim"] == 768
    f = _family_of(1024, None, in_channels=7)
    assert f["family"] == "sd-x4-upscaler" and f["prediction"] == "v"


def test_sd2_v_prediction_heuristic():
    """comfy supported_models.py SD20.model_type: out-layer statistics with
    std > 0.09 classify as v-prediction."""
    k = "model.diffusion_model.output_blocks.11.1.transformer_blocks.0.norm1.bias"
    eps = _family_of(1024, None, extra_flat={k: np.zeros((1280,), np.float32)})
    assert eps["prediction"] == "eps"
    rng = np.random.default_rng(0)
    v = _family_of(1024, None,
                   extra_flat={k: rng.normal(0, 0.5, (1280,)).astype(np.float32)})
    assert v["prediction"] == "v"


# --- unCLIP noise augmentation ---------------------------------------------------

def test_noise_augmentor_math():
    """q_sample parity with the reference formula (upscaling.py:44-52):
    z = sqrt(alphas_cumprod[t]) * x + sqrt(1 - alphas_cumprod[t]) * noise,
    squaredcos_cap_v2 schedule."""
    from stable_renderer_tpu.models.noise_aug import (
        NoiseAugmentor,
        betas_squaredcos_cap_v2,
    )

    betas = betas_squaredcos_cap_v2(1000)
    # independent oracle for the schedule endpoints
    assert betas.shape == (1000,)
    assert 0 < betas[0] < 1e-4 and betas[-1] == pytest.approx(0.999, abs=1e-3)
    ac = np.cumprod(1.0 - betas)

    aug = NoiseAugmentor(timestep_dim=8)
    x = jnp.ones((1, 8))
    key = jax.random.PRNGKey(3)
    t = 500
    z, emb = aug.augment(x, t, key)
    noise = jax.random.normal(key, x.shape, x.dtype)
    expect = np.sqrt(ac[t]) * np.asarray(x) + np.sqrt(1 - ac[t]) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(z), expect, rtol=1e-4)
    assert emb.shape == (1, 8)
    # level 0 is nearly the identity
    z0, _ = aug.augment(x, 0, key)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(x), atol=0.05)


def test_unclip_adm_single_and_merge():
    from stable_renderer_tpu.models.noise_aug import NoiseAugmentor, unclip_adm

    aug = NoiseAugmentor(timestep_dim=8)
    key = jax.random.PRNGKey(0)
    e1 = {"embeds": np.ones((8,), np.float32), "strength": 1.0,
          "noise_augmentation": 0.0}
    y = unclip_adm([e1], aug, key)
    assert y.shape == (1, 16)
    # strength scales the whole row (model_base.py:281 adm_out * weight)
    e2 = dict(e1, strength=0.5)
    y2 = unclip_adm([e2], aug, key)
    np.testing.assert_allclose(np.asarray(y2), 0.5 * np.asarray(y), rtol=1e-5)
    # two entries go through the merge re-augmentation -> still (1, 2D)
    ym = unclip_adm([e1, e2], aug, key)
    assert ym.shape == (1, 16)
    assert not np.allclose(np.asarray(ym), np.asarray(y))


def test_unclip_executor_e2e():
    """unCLIPConditioning entries reach the UNet's ADM vector: a tiny
    adm-conditioned checkpoint + CLIPVisionEncode -> unCLIPConditioning ->
    KSampler runs and the image embedding changes the output
    (nodes.py unCLIPConditioning + model_base.py SD21UNCLIP.encode_adm)."""
    from stable_renderer_tpu.models.sampling import ModelSampling
    from stable_renderer_tpu.workflow.executor import (
        InferenceContext,
        NODE_REGISTRY,
        WorkflowNode,
    )

    adm = 32  # noise_aug_dim 16
    # model_channels >= 64 so GroupNorm keeps >1 channel per group — at tiny
    # widths GN degenerates to InstanceNorm and per-channel emb shifts cancel
    cfg = UNetConfig(
        model_channels=64, channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(0, 1), transformer_depth=1, context_dim=32,
        num_heads=4, adm_in_channels=adm,
    )
    unet = UNetModel(cfg)
    params = unet.init(jax.random.PRNGKey(0))
    model = {"unet": unet, "params": params,
             "sampling": ModelSampling(prediction="v"),
             "family": "sd21-unclip", "noise_aug_dim": adm // 2}
    ctx = InferenceContext()
    latent = {"samples": jnp.zeros((1, 8, 8, 4))}
    pos = {"context": jnp.zeros((1, 5, 32)), "controls": []}
    neg = {"context": jnp.zeros((1, 5, 32)), "controls": []}
    node = WorkflowNode(id="1", type="KSampler",
                        widgets=[0, "fixed", 2, 2.0, "euler", "normal", 1.0])
    ks = NODE_REGISTRY["KSampler"]
    out_plain = ks(ctx, node, model=model, positive=pos, negative=neg,
                   latent_image=latent)[0]["samples"]
    embeds = jnp.ones((1, adm // 2)) * 3.0
    pos_unclip = dict(pos, unclip=[{"embeds": embeds, "strength": 1.0,
                                    "noise_augmentation": 0.1}])
    out_unclip = ks(ctx, node, model=model, positive=pos_unclip, negative=neg,
                    latent_image=latent)[0]["samples"]
    assert out_plain.shape == out_unclip.shape
    assert not np.allclose(np.asarray(out_plain), np.asarray(out_unclip),
                           atol=1e-5)


def test_pooled_random_init_structure():
    """models/init_pool.pooled_random_init reproduces the exact init() tree
    (structure, shapes, dtypes) from one pooled draw, with sane scales."""
    from stable_renderer_tpu.models.init_pool import pooled_random_init

    unet = UNetModel(SSD_LIKE)
    ref = unet.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    pooled = pooled_random_init(
        lambda k: unet.init(k, dtype=jnp.bfloat16), jax.random.PRNGKey(1))
    ref_s = {jax.tree_util.keystr(p): (tuple(v.shape), str(v.dtype))
             for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    pool_s = {jax.tree_util.keystr(p): (tuple(v.shape), str(v.dtype))
              for p, v in jax.tree_util.tree_flatten_with_path(pooled)[0]}
    assert ref_s == pool_s
    w = pooled["input_blocks"]["1"]["0"]["in_layers"]["2"]["weight"]
    std = float(jnp.std(w.astype(jnp.float32)))
    fan_in = w.shape[1] * w.shape[2] * w.shape[3]
    assert abs(std - 1.0 / np.sqrt(fan_in)) < 0.3 / np.sqrt(fan_in)
    # norm scales are ones, biases zeros
    assert float(jnp.min(pooled["out"]["0"]["weight"])) == 1.0
    assert float(jnp.max(jnp.abs(pooled["out"]["0"]["bias"]))) == 0.0


def test_checkpoint_loader_family_towers(tmp_path):
    """The executor CheckpointLoaderSimple builds the family's text tower:
    SDXL-class files load dual towers from conditioner.embedders.{0,1}, unclip
    files load the OpenCLIP-H tower + carry noise_aug_dim (comfy sd.py
    load_checkpoint_guess_config clip_target dispatch)."""
    from safetensors.numpy import save_file

    from stable_renderer_tpu.workflow.executor import (
        InferenceContext,
        NODE_REGISTRY,
        WorkflowNode,
    )

    def make_ckpt(name, context_dim, adm):
        cfg = UNetConfig(
            model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
            attention_levels=(0, 1), transformer_depth=1,
            context_dim=context_dim, head_dim=16, adm_in_channels=adm,
        )
        unet = UNetModel(cfg)
        flat = {f"model.diffusion_model.{k}": np.asarray(v)
                for k, v in flatten(unet.init(jax.random.PRNGKey(0))).items()}
        flat["first_stage_model.decoder.conv_in.weight"] = np.zeros(
            (4, 4, 3, 3), np.float32)
        flat["conditioner.embedders.0.transformer.text_model.embeddings."
             "token_embedding.weight"] = np.zeros((8, 16), np.float32)
        flat["conditioner.embedders.1.model.text_projection"] = np.zeros(
            (16, 16), np.float32)
        flat["cond_stage_model.model.ln_final.weight"] = np.ones(
            (16,), np.float32)
        p = tmp_path / name
        save_file(flat, str(p))
        return p

    ctx = InferenceContext(model_dirs=(str(tmp_path),))
    loader = NODE_REGISTRY["CheckpointLoaderSimple"]

    make_ckpt("xl.safetensors", context_dim=2048, adm=2816)
    node = WorkflowNode(id="1", type="CheckpointLoaderSimple",
                        widgets=["xl.safetensors"])
    model, clip, vae = loader(ctx, node)
    assert model["family"] == "sdxl"
    assert clip.get("clip_g") is not None
    assert "model" in clip["params_g"] and clip["params_g"]["model"]

    make_ckpt("unclip.safetensors", context_dim=1024, adm=2048)
    node = WorkflowNode(id="2", type="CheckpointLoaderSimple",
                        widgets=["unclip.safetensors"])
    model, clip, vae = loader(ctx, node)
    assert model["family"] == "sd21-unclip"
    assert model["noise_aug_dim"] == 1024
    assert model["sampling"].prediction == "v"
    from stable_renderer_tpu.models.clip import SD2ClipH

    assert isinstance(clip["clip"], SD2ClipH)


def test_x4_class_embedding_detection_round_trip():
    """SD_X4Upscaler's label_emb is an embedding TABLE indexed by the noise
    level (openaimodel num_classes path) — detected from label_emb.weight."""
    cfg_in = UNetConfig(
        in_channels=7, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(0, 1), transformer_depth=1, context_dim=64,
        head_dim=16, num_classes=351, disable_self_attn_levels=(True, False),
    )
    flat, _, params = _flat_from_config(cfg_in)
    cfg = detect_unet_config(flat)
    assert cfg.num_classes == 351 and cfg.adm_in_channels is None
    re_params = UNetModel(cfg).init(jax.random.PRNGKey(1))
    assert _tree_shapes(re_params) == _tree_shapes(params)
    # integer y indexes the table and conditions the output
    model = UNetModel(cfg)
    x = jnp.ones((1, 8, 8, 7))
    ctx = jnp.zeros((1, 5, 64))
    o0 = model.apply(params, x, jnp.array([1.0]), ctx, y=jnp.array([0]))
    o1 = model.apply(params, x, jnp.array([1.0]), ctx, y=jnp.array([350]))
    assert not np.allclose(np.asarray(o0), np.asarray(o1), atol=1e-4)


def test_x4_linear_q_sample_oracle():
    from stable_renderer_tpu.models.noise_aug import NoiseAugmentor, betas_linear

    betas = betas_linear(1000, 1e-4, 2e-2)
    ac = np.cumprod(1.0 - betas)
    aug = NoiseAugmentor(timestep_dim=1, max_noise_level=350, schedule="linear")
    x = jnp.ones((1, 4, 4, 3))
    key = jax.random.PRNGKey(7)
    z = aug.q_sample(x, 300, key)
    noise = jax.random.normal(key, x.shape, x.dtype)
    expect = np.sqrt(ac[300]) * np.asarray(x) + np.sqrt(1 - ac[300]) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(z), expect, rtol=1e-4)


def test_x4_upscaler_executor_e2e(tmp_path):
    """Full SD_X4Upscaler flow: checkpoint -> family detection (v-pred,
    linear_start 1e-4) -> SD_4XUpscale_Conditioning -> KSampler consuming
    concat_image as c_concat + the augmentation level as class-label y
    (nodes_sdupscale.py + model_base.py:449-479)."""
    from safetensors.numpy import save_file

    from stable_renderer_tpu.workflow.executor import (
        InferenceContext,
        NODE_REGISTRY,
        WorkflowNode,
    )

    cfg = UNetConfig(
        in_channels=7, model_channels=64, channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(0, 1), transformer_depth=1, context_dim=1024,
        head_dim=16, num_classes=351, disable_self_attn_levels=(True, False),
    )
    unet = UNetModel(cfg)
    flat = {f"model.diffusion_model.{k}": np.asarray(v)
            for k, v in flatten(unet.init(jax.random.PRNGKey(0))).items()}
    flat["first_stage_model.decoder.conv_in.weight"] = np.zeros(
        (4, 4, 3, 3), np.float32)
    flat["cond_stage_model.model.ln_final.weight"] = np.ones((16,), np.float32)
    save_file(flat, str(tmp_path / "x4.safetensors"))

    ctx = InferenceContext(model_dirs=(str(tmp_path),))
    model, clip, vae = NODE_REGISTRY["CheckpointLoaderSimple"](
        ctx, WorkflowNode(id="1", type="CheckpointLoaderSimple",
                          widgets=["x4.safetensors"]))
    assert model["family"] == "sd-x4-upscaler"
    assert model["sampling"].prediction == "v"
    assert model["sampling"].beta_start == pytest.approx(0.0001)

    images = jnp.ones((1, 8, 8, 3)) * 0.5
    pos = {"context": jnp.zeros((1, 5, 1024)), "controls": []}
    neg = {"context": jnp.zeros((1, 5, 1024)), "controls": []}
    pos4, neg4, latent = NODE_REGISTRY["SD_4XUpscale_Conditioning"](
        ctx, WorkflowNode(id="2", type="SD_4XUpscale_Conditioning",
                          widgets=[4.0, 0.2]),
        images=images, positive=pos, negative=neg)
    assert latent["samples"].shape == (1, 8, 8, 4)
    assert pos4["concat_image"].shape[-1] == 3

    node = WorkflowNode(id="3", type="KSampler",
                        widgets=[0, "fixed", 2, 2.0, "euler", "normal", 1.0])
    out = NODE_REGISTRY["KSampler"](
        ctx, node, model=model, positive=pos4, negative=neg4,
        latent_image=latent)[0]["samples"]
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # the augmentation level (class label) + noised image change the output
    pos0, neg0, latent0 = NODE_REGISTRY["SD_4XUpscale_Conditioning"](
        ctx, WorkflowNode(id="4", type="SD_4XUpscale_Conditioning",
                          widgets=[4.0, 0.0]),
        images=images, positive=pos, negative=neg)
    out0 = NODE_REGISTRY["KSampler"](
        ctx, node, model=model, positive=pos0, negative=neg0,
        latent_image=latent0)[0]["samples"]
    assert not np.allclose(np.asarray(out), np.asarray(out0), atol=1e-5)


def test_refiner_adm_vector_layout():
    """SDXLRefiner ADM = pooled(1280) + Fourier[h, w, crop, aesthetic] = 2560
    (model_base.py:319-344); positive/negative differ via the aesthetic score."""
    from stable_renderer_tpu.models.sdxl import sdxl_refiner_adm_vector

    pooled = jnp.ones((2, 1280))
    y_pos = sdxl_refiner_adm_vector(pooled, aesthetic_score=6.0)
    y_neg = sdxl_refiner_adm_vector(pooled, aesthetic_score=2.5)
    assert y_pos.shape == (2, 2560)
    # only the aesthetic-score quarter of the Fourier block differs
    assert not np.allclose(np.asarray(y_pos), np.asarray(y_neg))
    np.testing.assert_allclose(np.asarray(y_pos[:, :1280]),
                               np.asarray(y_neg[:, :1280]))
