"""SD2.x family support tests (comfy model_detection.py SD2 head config,
sd2_clip.py SD2ClipHModel, v-prediction)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.clip import (
    TINY_CLIP_H_CONFIG,
    SD2ClipH,
    encode_token_weights_batch,
)
from stable_renderer_tpu.models.weights import detect_unet_config


def test_detect_sd2_head_config():
    """context_dim 1024 (OpenCLIP-H) -> fixed 64-wide heads
    (model_detection.py num_head_channels=64)."""
    prefix = "model.diffusion_model."
    flat = {
        prefix + "input_blocks.0.0.weight": np.zeros((320, 4, 3, 3), np.float32),
        prefix + "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight":
            np.zeros((320, 1024), np.float32),
    }
    cfg = detect_unet_config(flat)
    assert cfg.context_dim == 1024
    assert cfg.head_dim == 64
    assert cfg.adm_in_channels is None
    # SD1.5 keeps 8 fixed heads
    flat[prefix + "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight"] = \
        np.zeros((320, 768), np.float32)
    cfg1 = detect_unet_config(flat)
    assert cfg1.head_dim is None and cfg1.num_heads == 8


def test_sd2_clip_h_adapter():
    """SD2ClipH speaks the CLIPTextModel interface: penultimate hidden with
    the final layer norm (sd2_clip.py layer='penultimate',
    layer_norm_hidden_state=True), plus projected pooled output."""
    model = SD2ClipH(TINY_CLIP_H_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.array([[[1, 5, 9, 2, 0, 0, 0, 0]]], jnp.int32)  # (B=1, C=1, L=8)
    w = jnp.ones((1, 1, 8))
    ctx, pooled = encode_token_weights_batch(model, params, ids, w)
    assert ctx.shape == (1, 8, 64)
    assert pooled.shape == (1, 64)
    assert np.isfinite(np.asarray(ctx)).all()
    # penultimate (default) differs from the last layer
    out_pen = model.apply(params, ids[0], clip_skip=-1)
    out_last = model.apply(params, ids[0], clip_skip=-3)
    assert not np.allclose(np.asarray(out_pen), np.asarray(out_last), atol=1e-5)


def test_v_prediction_render():
    """RenderConfig(prediction='v') flows into the compiled denoise
    (ModelSamplingDiscrete v_prediction) and changes the output."""
    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.workflow.config import RenderConfig

    k = jax.random.PRNGKey(0)
    ed = EngineData(
        frame_indices=jnp.arange(1),
        color_maps=jax.random.uniform(k, (1, 32, 32, 3)),
        noise_maps=jax.random.normal(jax.random.fold_in(k, 1), (1, 16, 16, 4)),
    )
    outs = {}
    for pred in ("eps", "v"):
        cfg = RenderConfig(prompt="x", steps=2, cfg_scale=1.0, sampler="euler",
                           prediction=pred)
        pipe = DiffusionPipeline.from_random(cfg, tiny=True)
        assert pipe.model_sampling.prediction == pred
        outs[pred] = np.asarray(pipe.render(ed, key=jax.random.PRNGKey(3)))
        assert np.isfinite(outs[pred]).all()
    assert not np.allclose(outs["eps"], outs["v"], atol=1e-4)

import pytest  # noqa: E402
# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
