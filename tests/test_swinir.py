"""SwinIR + SRVGG upscaler tests (VERDICT r1 missing #9; reference
chainner_models/architecture/SwinIR.py, SRVGG.py).

Includes numeric parity vs a from-scratch torch re-execution of the same
weights for the window-attention core — the strongest check that the JAX
reimplementation matches the reference architecture."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.swinir import (
    TINY_SWINIR_CONFIG,
    SwinIR,
    SwinIRConfig,
    detect_swinir_config,
    pixel_shuffle,
    pixel_unshuffle,
)
from stable_renderer_tpu.models.upscale import (
    SRVGGConfig,
    SRVGGNetCompact,
    detect_srvgg_config,
)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(2, 4, 6, 16).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    # unshuffle inverts
    back = np.asarray(pixel_unshuffle(jnp.asarray(ours), 2))
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_swinir_tiny_forward_shapes():
    model = SwinIR(TINY_SWINIR_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 12, 10, 3))  # non-multiple of window
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 24, 20, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("upsampler,scale", [
    ("pixelshuffle", 4), ("nearest+conv", 4), ("", 1)])
def test_swinir_upsampler_flavors(upsampler, scale):
    cfg = SwinIRConfig(embed_dim=16, depths=(2,), num_heads=(2,), window_size=4,
                       mlp_ratio=2.0, upsampler=upsampler, upscale=scale,
                       num_feat=8)
    model = SwinIR(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
    out = model.apply(params, x)
    assert out.shape == (1, 8 * scale, 8 * scale, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_swinir_window_attention_parity_vs_torch():
    """The W-MSA core (qkv + relative position bias + softmax + proj) matches
    a direct torch evaluation of the same weights (SwinIR.py:145-194)."""
    torch = pytest.importorskip("torch")
    from stable_renderer_tpu.models.swinir import _rel_pos_index, _window_attention

    rng = np.random.RandomState(0)
    ws, heads, c = 4, 2, 16
    n = ws * ws
    qkv_w = rng.randn(3 * c, c).astype(np.float32) * 0.1
    qkv_b = rng.randn(3 * c).astype(np.float32) * 0.1
    proj_w = rng.randn(c, c).astype(np.float32) * 0.1
    proj_b = rng.randn(c).astype(np.float32) * 0.1
    table = rng.randn((2 * ws - 1) ** 2, heads).astype(np.float32) * 0.1
    x = rng.randn(3, n, c).astype(np.float32)

    p = {"qkv": {"weight": jnp.asarray(qkv_w), "bias": jnp.asarray(qkv_b)},
         "proj": {"weight": jnp.asarray(proj_w), "bias": jnp.asarray(proj_b)},
         "relative_position_bias_table": jnp.asarray(table)}
    ours = np.asarray(_window_attention(p, jnp.asarray(x), heads, ws, None))

    # torch reference (literal transcription of SwinIR.py WindowAttention)
    tx = torch.from_numpy(x)
    qkv = torch.nn.functional.linear(tx, torch.from_numpy(qkv_w),
                                     torch.from_numpy(qkv_b))
    qkv = qkv.reshape(3, n, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (c // heads) ** -0.5
    attn = q @ k.transpose(-2, -1)
    idx = torch.from_numpy(_rel_pos_index(ws).reshape(-1))
    bias = torch.from_numpy(table)[idx].view(n, n, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias.unsqueeze(0), dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(3, n, c)
    theirs = torch.nn.functional.linear(out, torch.from_numpy(proj_w),
                                        torch.from_numpy(proj_b)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_swinir_config_detection_roundtrip():
    """init() -> flatten -> detect recovers the config (SwinIR.py:820-990)."""
    from stable_renderer_tpu.models.weights import flatten

    cfg = SwinIRConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 2),
                       window_size=4, mlp_ratio=2.0, upsampler="pixelshuffle",
                       upscale=4, num_feat=8)
    model = SwinIR(cfg)
    flat = {k: np.asarray(v) for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_swinir_config(flat)
    assert det is not None
    assert det.embed_dim == 16 and det.depths == (2, 2)
    assert det.window_size == 4 and det.upscale == 4
    assert det.upsampler == "pixelshuffle" and det.num_feat == 8
    assert det.mlp_ratio == 2.0


def test_srvgg_forward_and_detection():
    from stable_renderer_tpu.models.weights import flatten

    cfg = SRVGGConfig(num_feat=16, num_conv=2, scale=2)
    net = SRVGGNetCompact(cfg)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
    out = net.apply(params, x)
    assert out.shape == (1, 16, 16, 3)
    # zero body weights -> output == nearest-upsampled input (residual form)
    zero = jax.tree.map(jnp.zeros_like, params)
    out0 = net.apply(zero, x)
    base = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-6)

    flat = {k: np.asarray(v) for k, v in flatten(params).items()}
    det = detect_srvgg_config(flat)
    assert det == cfg


def test_srvgg_prelu_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(1, 4, 4, 8).astype(np.float32)
    w = np.random.RandomState(1).rand(8).astype(np.float32)
    ours = np.maximum(x, 0) + w * np.minimum(x, 0)
    theirs = torch.nn.functional.prelu(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_swift_srgan_forward_and_detection():
    from stable_renderer_tpu.models.upscale import (
        SwiftSRGAN,
        SwiftSRGANConfig,
        detect_swift_srgan_config,
    )
    from stable_renderer_tpu.models.weights import flatten

    cfg = SwiftSRGANConfig(num_channels=8, num_blocks=2, scale=2)
    net = SwiftSRGAN(cfg)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
    out = net.apply(params, x)
    assert out.shape == (1, 16, 16, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0

    flat = {k: np.asarray(v) for k, v in flatten(params).items()}
    det = detect_swift_srgan_config(flat)
    assert det == cfg

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
