"""CLIP vision tower tests (VERDICT r1 §2.4 gap; reference clip_vision.py +
clip_model.py CLIPVisionModelProjection)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.clip_vision import (
    TINY_VISION_CONFIG,
    VITG_CONFIG,
    VITH_CONFIG,
    VITL_CONFIG,
    CLIPVisionModel,
    clip_preprocess,
    detect_vision_config,
)


def test_preprocess_resize_crop_normalize():
    img = jnp.ones((1, 100, 160, 3)) * 0.5
    out = clip_preprocess(img, size=28)
    assert out.shape == (1, 28, 28, 3)
    # 0.5 normalized: (0.5 - mean)/std, channel 0: (0.5-0.48145466)/0.26862954
    np.testing.assert_allclose(
        float(out[0, 14, 14, 0]), (0.5 - 0.48145466) / 0.26862954, atol=2e-2)
    # already-correct-size images skip the resize entirely
    out2 = clip_preprocess(jnp.ones((2, 28, 28, 3)) * 0.5, size=28)
    assert out2.shape == (2, 28, 28, 3)


def test_vision_forward_shapes_and_outputs():
    model = CLIPVisionModel(TINY_VISION_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 48, 3))
    out = jax.jit(lambda p, x: model.encode_image(p, x))(params, img)
    n_tok = (28 // 14) ** 2 + 1  # patches + class token
    assert out.last_hidden_state.shape == (2, n_tok, 64)
    assert out.penultimate_hidden_states.shape == (2, n_tok, 64)
    assert out.image_embeds.shape == (2, 32)
    assert np.isfinite(np.asarray(out.image_embeds)).all()
    # penultimate is the pre-final-layer hidden state, not the last
    assert not np.allclose(np.asarray(out.last_hidden_state),
                           np.asarray(out.penultimate_hidden_states))


def test_config_detection_by_depth():
    assert detect_vision_config(
        ["vision_model.encoder.layers.47.layer_norm1.weight"]) is VITG_CONFIG
    assert detect_vision_config(
        ["vision_model.encoder.layers.30.layer_norm1.weight"]) is VITH_CONFIG
    assert detect_vision_config(
        ["vision_model.encoder.layers.22.layer_norm1.weight"]) is VITL_CONFIG
    assert detect_vision_config(["foo"]) is None


def test_unclip_conditioning_node():
    from stable_renderer_tpu.workflow.executor import NODE_REGISTRY

    cond = {"context": jnp.zeros((1, 77, 64)), "controls": []}
    cvo = {"image_embeds": jnp.ones((1, 32))}

    class _N:
        widgets = [0.8, 0.1]
        type = "unCLIPConditioning"

    (out,) = NODE_REGISTRY["unCLIPConditioning"](None, _N(), conditioning=cond,
                                                 clip_vision_output=cvo)
    assert out["unclip"][0]["strength"] == 0.8
    assert out["unclip"][0]["noise_augmentation"] == 0.1
    assert out["context"] is cond["context"]

import pytest  # noqa: E402
# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
