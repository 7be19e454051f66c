"""GLIGEN grounded-box conditioning tests (VERDICT r1 §2.4 gap; reference
comfy/gligen.py + nodes.py GLIGENTextBoxApply)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.gligen import (
    MAX_OBJS,
    fourier_embed,
    gated_self_attention,
    init_random_gligen,
    position_net_apply,
)


def test_fourier_embed_shape_and_bands():
    x = jnp.ones((2, 3, 4))
    out = fourier_embed(x, num_freqs=8)
    assert out.shape == (2, 3, 64)
    # first band freq=1: sin(1), cos(1)
    np.testing.assert_allclose(float(out[0, 0, 0]), np.sin(1.0), atol=1e-6)


def test_position_net_null_padding():
    """Masked-out slots use the learned null features (gligen.py:221-231)."""
    gl = init_random_gligen(jax.random.PRNGKey(0), n_fusers=1)
    b, n = 2, MAX_OBJS
    boxes = jnp.zeros((b, n, 4))
    masks = jnp.zeros((b, n)).at[:, 0].set(1.0)
    conds = jax.random.normal(jax.random.PRNGKey(1), (b, n, gl.key_dim))
    objs = position_net_apply(gl.position_net, boxes, masks, conds)
    assert objs.shape == (b, n, 64)
    # all padded slots share the identical null embedding
    np.testing.assert_allclose(np.asarray(objs[:, 1]), np.asarray(objs[:, 2]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(objs[:, 0]), np.asarray(objs[:, 1]))


def test_gated_attention_zero_alpha_is_identity():
    """alpha=0 -> tanh(0)=0 -> module is exactly the identity (gligen.py:71-73
    'when it is set to 0, then the entire model is same as original one')."""
    gl = init_random_gligen(jax.random.PRNGKey(0), n_fusers=1)
    p = dict(gl.fusers[0])
    p["alpha_attn"] = jnp.asarray(0.0)
    p["alpha_dense"] = jnp.asarray(0.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 64))
    objs = jax.random.normal(jax.random.PRNGKey(3), (1, MAX_OBJS, 64))
    out = gated_self_attention(p, x, objs, n_heads=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    # nonzero alpha changes the output
    out2 = gated_self_attention(gl.fusers[0], x, objs, n_heads=2)
    assert not np.allclose(np.asarray(out2), np.asarray(x), atol=1e-4)


def test_gligen_mid_hook_in_denoise_moves_output():
    """The full denoise runs with a GLIGEN mid hook and boxed grounding
    changes the output vs no hook (unet.py AttnHooks.mid point)."""
    from stable_renderer_tpu.models.sampling import calculate_sigmas, sample
    from stable_renderer_tpu.models.sampling.cfg import make_denoiser
    from stable_renderer_tpu.models.sampling.schedules import ModelSampling
    from stable_renderer_tpu.models.unet import TINY_UNET_CONFIG, AttnHooks, UNetModel

    cfg = TINY_UNET_CONFIG
    unet = UNetModel(cfg)
    params = unet.init(jax.random.PRNGKey(0))
    gl = init_random_gligen(jax.random.PRNGKey(1), n_fusers=16,
                            query_dim=cfg.model_channels, key_dim=64, n_heads=2)
    ms = ModelSampling()
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, cfg.context_dim))
    log_sigmas = jnp.asarray(ms.log_sigmas)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (64,))
    objs = gl.grounding_tokens(1, [(pooled, 4, 4, 0, 0)], (8, 8))
    hooks = AttnHooks(mid=gl.make_mid_hook(objs))

    noise = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4))
    sigmas = jnp.asarray(calculate_sigmas(ms, "normal", 2))

    def run(h):
        den = make_denoiser(unet, params, ctx, None, log_sigmas,
                            cfg_scale=1.0, hooks=h)
        return sample(den, noise, sigmas, sampler="euler",
                      key=jax.random.PRNGKey(5))

    out_g = run(hooks)
    out_plain = run(AttnHooks())
    assert np.isfinite(np.asarray(out_g)).all()
    assert not np.allclose(np.asarray(out_g), np.asarray(out_plain), atol=1e-5)


def test_gligen_textbox_node_appends_position():
    from stable_renderer_tpu.models.clip import TINY_CLIP_CONFIG, CLIPTextModel, Tokenizer
    from stable_renderer_tpu.workflow.executor import NODE_REGISTRY

    clip_model = CLIPTextModel(TINY_CLIP_CONFIG)
    clip = {"clip": clip_model, "params": clip_model.init(jax.random.PRNGKey(0)),
            "tokenizer": Tokenizer(TINY_CLIP_CONFIG)}
    gl = init_random_gligen(jax.random.PRNGKey(1), n_fusers=1)

    class _N:
        widgets = ["a red hat", 256, 128, 64, 32]
        type = "GLIGENTextBoxApply"

    cond = {"context": jnp.zeros((1, 77, 64)), "controls": []}
    (out,) = NODE_REGISTRY["GLIGENTextBoxApply"](
        None, _N(), conditioning_to=cond, clip=clip, gligen_textbox_model=gl)
    kind, model, params = out["gligen"]
    assert kind == "position" and model is gl
    emb, bh, bw, by, bx = params[0]
    assert (bh, bw, by, bx) == (16, 32, 4, 8)  # /8 latent cells
    assert emb.shape[-1] == 64

import pytest  # noqa: E402
# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
