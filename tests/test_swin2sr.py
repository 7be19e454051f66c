"""Swin2SR tests (reference chainner_models/architecture/Swin2SR.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.swin2sr import (
    TINY_SWIN2SR_CONFIG,
    Swin2SR,
    Swin2SRConfig,
    _coords_table,
    detect_swin2sr_config,
)


def test_coords_table_log_spacing():
    t = _coords_table(4)
    assert t.shape == (49, 2)
    # log2(8+1)/log2(8) at the extremes (Swin2SR.py:140-145)
    import math
    lim = math.log2(9.0) / math.log2(8.0)
    assert abs(float(t.max()) - lim) < 1e-6
    assert abs(float(t.min()) + lim) < 1e-6


def test_swin2sr_tiny_forward():
    model = Swin2SR(TINY_SWIN2SR_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 10, 14, 3))
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 20, 28, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_swin2sr_aux_flavor():
    cfg = Swin2SRConfig(embed_dim=16, depths=(2,), num_heads=(2,),
                        window_size=4, mlp_ratio=2.0,
                        upsampler="pixelshuffle_aux", upscale=4, num_feat=8)
    model = Swin2SR(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 3))
    out = model.apply(params, x)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_swin2sr_cosine_attention_parity_vs_torch():
    """SwinV2 cosine attention with split q/v bias + clamped logit scale
    matches a direct torch transcription (Swin2SR.py:178-235, minus CPB)."""
    torch = pytest.importorskip("torch")
    import math

    from stable_renderer_tpu.models.swin2sr import _v2_window_attention

    rng = np.random.RandomState(0)
    ws, heads, c = 4, 2, 16
    n = ws * ws
    qkv_w = rng.randn(3 * c, c).astype(np.float32) * 0.1
    qb = rng.randn(c).astype(np.float32) * 0.1
    vb = rng.randn(c).astype(np.float32) * 0.1
    proj_w = rng.randn(c, c).astype(np.float32) * 0.1
    proj_b = rng.randn(c).astype(np.float32) * 0.1
    ls = np.full((heads, 1, 1), math.log(5.0), np.float32)
    cpb0_w = rng.randn(512, 2).astype(np.float32) * 0.01
    cpb0_b = np.zeros(512, np.float32)
    cpb2_w = np.zeros((heads, 512), np.float32)  # zero CPB -> bias = 16*sig(0)=8
    x = rng.randn(2, n, c).astype(np.float32)

    p = {"qkv": {"weight": jnp.asarray(qkv_w)},
         "q_bias": jnp.asarray(qb), "v_bias": jnp.asarray(vb),
         "proj": {"weight": jnp.asarray(proj_w), "bias": jnp.asarray(proj_b)},
         "logit_scale": jnp.asarray(ls),
         "cpb_mlp": {"0": {"weight": jnp.asarray(cpb0_w), "bias": jnp.asarray(cpb0_b)},
                     "2": {"weight": jnp.asarray(cpb2_w)}}}
    ours = np.asarray(_v2_window_attention(p, jnp.asarray(x), heads, ws, None))

    tx = torch.from_numpy(x)
    bias = torch.cat([torch.from_numpy(qb), torch.zeros(c), torch.from_numpy(vb)])
    qkv = torch.nn.functional.linear(tx, torch.from_numpy(qkv_w), bias)
    qkv = qkv.reshape(2, n, 3, heads, c // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = torch.nn.functional.normalize(q, dim=-1) @ \
        torch.nn.functional.normalize(k, dim=-1).transpose(-2, -1)
    scale = torch.clamp(torch.from_numpy(ls),
                        max=torch.log(torch.tensor(100.0))).exp()
    attn = attn * scale + 8.0  # zero CPB -> constant bias 16*sigmoid(0)
    attn = torch.softmax(attn, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(2, n, c)
    theirs = torch.nn.functional.linear(out, torch.from_numpy(proj_w),
                                        torch.from_numpy(proj_b)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5)


def test_detection_and_loader_dispatch(tmp_path):
    from stable_renderer_tpu.models.upscale import load_upscale_model
    from stable_renderer_tpu.models.weights import flatten

    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    model = Swin2SR(TINY_SWIN2SR_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_swin2sr_config(flat)
    assert det is not None and det.embed_dim == 16
    assert det.upsampler == "pixelshuffledirect" and det.upscale == 2

    p = tmp_path / "swin2sr_tiny.safetensors"
    save_file(flat, str(p))
    loaded, params = load_upscale_model(str(p))
    assert type(loaded).__name__ == "Swin2SR"
    out = loaded.apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 16, 16, 3)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
