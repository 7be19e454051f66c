"""GFPGAN (clean) face-restoration tests (VERDICT r1 missing #9 face-restore
zoo; reference face/gfpganv1_clean_arch.py + stylegan2_clean_arch.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.gfpgan import (
    TINY_GFPGAN_CONFIG,
    GFPGAN,
    _modulated_conv,
    detect_gfpgan_config,
)


def test_modulated_conv_matches_torch():
    """Per-sample modulated+demodulated conv equals torch's grouped-conv
    formulation (stylegan2_clean_arch.py:102-140)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    b, cin, cout, k, nsf, h = 2, 6, 5, 3, 7, 8
    w = (rng.randn(1, cout, cin, k, k) / np.sqrt(cin * k * k)).astype(np.float32)
    mw = rng.randn(cin, nsf).astype(np.float32) * 0.1
    mb = np.ones(cin, np.float32)
    x = rng.randn(b, h, h, cin).astype(np.float32)
    style = rng.randn(b, nsf).astype(np.float32)

    p = {"weight": jnp.asarray(w),
         "modulation": {"weight": jnp.asarray(mw), "bias": jnp.asarray(mb)}}
    ours = np.asarray(_modulated_conv(p, jnp.asarray(x), jnp.asarray(style)))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    s = torch.nn.functional.linear(torch.from_numpy(style),
                                   torch.from_numpy(mw),
                                   torch.from_numpy(mb)).view(b, 1, cin, 1, 1)
    weight = torch.from_numpy(w) * s
    demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
    weight = weight * demod.view(b, cout, 1, 1, 1)
    weight = weight.view(b * cout, cin, k, k)
    out = torch.nn.functional.conv2d(tx.reshape(1, b * cin, h, h), weight,
                                     padding=k // 2, groups=b)
    theirs = out.view(b, cout, h, h).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_gfpgan_tiny_forward():
    model = GFPGAN(TINY_GFPGAN_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # stored noise buffers make it deterministic
    out2 = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_gfpgan_input_changes_output():
    """The restoration is actually conditioned on the input face (style code
    + SFT conditions from the UNet), not just the StyleGAN prior."""
    model = GFPGAN(TINY_GFPGAN_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    a = model.apply(params, jnp.zeros((1, 32, 32, 3)))
    bimg = model.apply(params, jnp.ones((1, 32, 32, 3)) * 0.5)
    assert not np.allclose(np.asarray(a), np.asarray(bimg), atol=1e-4)


def test_gfpgan_detection_roundtrip():
    from stable_renderer_tpu.models.weights import flatten

    model = GFPGAN(TINY_GFPGAN_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_gfpgan_config(flat)
    assert det is not None
    assert det.out_size == 32 and det.num_style_feat == 16
    assert det.base_channels == 32

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
