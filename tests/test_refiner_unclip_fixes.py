"""Regression tests for the round-3 advisor findings:

- SDXL-Refiner checkpoints encode text with the G tower ALONE (comfy
  sdxl_clip.py SDXLRefinerClipModel): context is the 1280-wide G penultimate
  hidden state, never the L+G concat (refiner files have no L tower and the
  refiner UNet's context_dim is 1280).
- sd21-unclip checkpoints must NOT take the SDXL ADM branch: absent unclip
  image conditioning the ADM vector is zeros((B, adm)) (comfy model_base.py
  SD21UNCLIP.encode_adm).
- SD_X4Upscaler checkpoints loaded via DiffusionPipeline.from_checkpoint get
  the linear_start 1e-4 / linear_end 2e-2 beta schedule (supported_models.py
  SD_X4Upscaler.sampling_settings), same as the executor loader.
- 9-channel SD2 inpaint checkpoints are never classified v-prediction
  ("SD2.0 inpainting models are not v prediction", supported_models.py SD20).
- Conditioning caches key on a params-version counter, not id(): swapping
  clip params must not serve stale embeddings.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.clip import (
    OpenCLIPTextModel,
    TINY_CLIP_G_CONFIG,
    encode_token_weights_batch_g,
)
from stable_renderer_tpu.models.unet import UNetConfig, UNetModel
from stable_renderer_tpu.models.weights import detect_model_family, flatten


def test_encode_token_weights_batch_g_shapes_and_weighting():
    """G-only encoding returns (B, C*L, width_g) context + (B, proj) pooled;
    token weights interpolate against the empty-prompt encoding."""
    g = OpenCLIPTextModel(TINY_CLIP_G_CONFIG)
    params = g.init(jax.random.PRNGKey(0))
    ids = np.zeros((2, 1, 10), np.int32)
    ids[:, 0, 0] = 49406 % 1000
    ids[:, 0, 1:4] = [[5, 7, 49407 % 1000], [9, 11, 49407 % 1000]]
    w = np.ones((2, 1, 10), np.float32)
    ctx, pooled = encode_token_weights_batch_g(
        g, params, jnp.asarray(ids), jnp.asarray(w))
    assert ctx.shape == (2, 10, TINY_CLIP_G_CONFIG.width)
    assert pooled.shape == (2, TINY_CLIP_G_CONFIG.projection_dim)
    # weighting: w != 1 moves the encoding toward the empty-prompt baseline
    w2 = w.copy()
    w2[:, 0, 1] = 0.3
    ctx2, _ = encode_token_weights_batch_g(
        g, params, jnp.asarray(ids), jnp.asarray(w2))
    assert not np.allclose(np.asarray(ctx), np.asarray(ctx2), atol=1e-6)


def _refiner_checkpoint(tmp_path):
    """Tiny checkpoint in the SDXL-Refiner layout: 1280-ctx 2560-ADM UNet +
    G tower at conditioner.embedders.0.model (NO embedders.0.transformer)."""
    from safetensors.numpy import save_file

    cfg = UNetConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(0, 1), transformer_depth=1,
        context_dim=1280, head_dim=16, adm_in_channels=2560,
    )
    unet = UNetModel(cfg)
    flat = {f"model.diffusion_model.{k}": np.asarray(v)
            for k, v in flatten(unet.init(jax.random.PRNGKey(0))).items()}
    flat["first_stage_model.decoder.conv_in.weight"] = np.zeros(
        (4, 4, 3, 3), np.float32)
    # the refiner's ONLY text tower: G at embedders.0.model.*
    g = OpenCLIPTextModel(TINY_CLIP_G_CONFIG)
    for k, v in flatten(g.init(jax.random.PRNGKey(1))).items():
        flat[f"conditioner.embedders.0.model.{k}"] = np.asarray(v)
    p = tmp_path / "refiner.safetensors"
    save_file(flat, str(p))
    return p


def test_executor_refiner_loader_g_only(tmp_path):
    """CheckpointLoaderSimple on a refiner file: g_only clip dict, params_g
    populated from embedders.0.model, empty L params."""
    from stable_renderer_tpu.workflow.executor import (
        InferenceContext,
        NODE_REGISTRY,
        WorkflowNode,
    )

    _refiner_checkpoint(tmp_path)
    ctx = InferenceContext(model_dirs=(str(tmp_path),))
    model, clip, vae = NODE_REGISTRY["CheckpointLoaderSimple"](
        ctx, WorkflowNode(id="1", type="CheckpointLoaderSimple",
                          widgets=["refiner.safetensors"]))
    assert model["family"] == "sdxl-refiner"
    assert clip.get("g_only") is True
    assert clip["params"] == {}
    assert clip["params_g"]["model"]  # the G tower actually loaded


def test_pipeline_refiner_g_only_flag(tmp_path):
    """DiffusionPipeline.from_checkpoint on a refiner file takes the G-only
    text path (no L params nested, _clip_g_only true)."""
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline

    p = _refiner_checkpoint(tmp_path)
    pipe = DiffusionPipeline.from_checkpoint(str(p))
    assert pipe.model_family == "sdxl-refiner"
    assert pipe.clip_params == {}
    assert pipe._clip_g_only
    assert pipe.clip_g_params["model"]


def test_unclip_prepare_conditioning_zero_adm():
    """sd21-unclip pipelines emit zeros((B, adm)) as the ADM vector instead of
    routing the SD2 pooled output through the SDXL size-ADM builder."""
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline

    pipe = DiffusionPipeline.from_random(family="sdxl", tiny=True)
    pipe.model_family = "sd21-unclip"
    adm = pipe.unet.config.adm_in_channels
    _, ctx, nctx, y_cond, y_uncond = pipe.prepare_conditioning(
        {}, (), 3, prompts=["a"] * 3, negatives=[""] * 3)
    assert y_cond.shape == (3, adm) and y_uncond.shape == (3, adm)
    assert float(jnp.abs(y_cond).max()) == 0.0
    assert float(jnp.abs(y_uncond).max()) == 0.0


def test_sd2_inpaint_never_v_prediction():
    """The SD2 eps-vs-v std heuristic only applies to 4-channel models."""
    k = "model.diffusion_model.output_blocks.11.1.transformer_blocks.0.norm1.bias"
    rng = np.random.default_rng(0)
    high_std = {k: rng.normal(0, 0.5, (1280,)).astype(np.float32)}
    cfg9 = UNetConfig(context_dim=1024, in_channels=9)
    fam = detect_model_family(high_std, cfg9)
    assert fam["family"] == "sd2" and fam["prediction"] == "eps"
    cfg4 = UNetConfig(context_dim=1024, in_channels=4)
    assert detect_model_family(high_std, cfg4)["prediction"] == "v"


def test_from_checkpoint_x4_beta_override(tmp_path):
    """from_checkpoint applies the X4 upscaler's linear_start/linear_end."""
    from safetensors.numpy import save_file

    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline

    cfg = UNetConfig(
        in_channels=7, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(0, 1), transformer_depth=1, context_dim=1024,
        head_dim=16, num_classes=351, disable_self_attn_levels=(True, False),
    )
    unet = UNetModel(cfg)
    flat = {f"model.diffusion_model.{k}": np.asarray(v)
            for k, v in flatten(unet.init(jax.random.PRNGKey(0))).items()}
    flat["first_stage_model.decoder.conv_in.weight"] = np.zeros(
        (4, 4, 3, 3), np.float32)
    flat["cond_stage_model.model.ln_final.weight"] = np.ones((16,), np.float32)
    p = tmp_path / "x4.safetensors"
    save_file(flat, str(p))
    from stable_renderer_tpu.workflow.config import RenderConfig

    # non-lcm sampler so the family's detected prediction type is kept
    pipe = DiffusionPipeline.from_checkpoint(
        str(p), config=RenderConfig(sampler="euler"))
    assert pipe.model_family == "sd-x4-upscaler"
    assert pipe.model_sampling.beta_start == pytest.approx(1e-4)
    assert pipe.model_sampling.beta_end == pytest.approx(2e-2)
    assert pipe.model_sampling.prediction == "v"


def test_clip_params_swap_invalidates_conditioning_cache():
    """Swapping clip_params must re-encode cached prompts (version-counter
    cache keys; id()-keyed caches can serve stale results after id reuse)."""
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline

    pipe = DiffusionPipeline.from_random(tiny=True, seed=0)
    ctx1, _ = pipe.encode_prompts(["hello world"], [""])
    # new params: a different random init => different embeddings
    new_clip = pipe.clip.init(jax.random.PRNGKey(99))
    pipe.clip_params = new_clip
    ctx2, _ = pipe.encode_prompts(["hello world"], [""])
    assert not np.allclose(np.asarray(ctx1), np.asarray(ctx2), atol=1e-6)
    # and the new result is itself cached (same object back on a repeat call)
    ctx3, _ = pipe.encode_prompts(["hello world"], [""])
    np.testing.assert_array_equal(np.asarray(ctx2), np.asarray(ctx3))
