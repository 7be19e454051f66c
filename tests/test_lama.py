"""LaMa inpainting tests (reference chainner_models/architecture/LaMa.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.lama import (
    TINY_LAMA_CONFIG,
    LaMa,
    _conv_transpose_s2,
    _fourier_unit,
    detect_lama_config,
)


def test_fourier_unit_matches_torch():
    """rfft2 -> stacked-real/imag 1x1 conv -> irfft2 equals the torch
    FourierUnit with identity BN (LaMa.py:126-221)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    b, h, w, c = 1, 8, 6, 4
    cw = rng.randn(2 * c, 2 * c, 1, 1).astype(np.float32) * 0.1
    x = rng.randn(b, h, w, c).astype(np.float32)
    p = {"conv_layer": {"weight": jnp.asarray(cw)},
         "bn": {"weight": jnp.ones(2 * c), "bias": jnp.zeros(2 * c),
                "running_mean": jnp.zeros(2 * c), "running_var": jnp.ones(2 * c)}}
    ours = np.asarray(_fourier_unit(p, jnp.asarray(x)))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    f = torch.fft.rfftn(tx, dim=(-2, -1), norm="ortho")
    st = torch.stack((f.real, f.imag), dim=-1)
    st = st.permute(0, 1, 4, 2, 3).reshape(b, -1, h, w // 2 + 1)
    y = torch.nn.functional.conv2d(st, torch.from_numpy(cw))
    y = torch.relu(y)  # identity BN
    y = y.view(b, c, 2, h, w // 2 + 1).permute(0, 1, 3, 4, 2)
    comp = torch.complex(y[..., 0], y[..., 1])
    out = torch.fft.irfftn(comp, s=(h, w), dim=(-2, -1), norm="ortho")
    theirs = out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    w = rng.randn(6, 4, 3, 3).astype(np.float32) * 0.1
    bias = rng.randn(4).astype(np.float32)
    x = rng.randn(2, 5, 7, 6).astype(np.float32)
    ours = np.asarray(_conv_transpose_s2(
        {"weight": jnp.asarray(w), "bias": jnp.asarray(bias)}, jnp.asarray(x)))
    theirs = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
        torch.from_numpy(bias), stride=2, padding=1, output_padding=1
    ).permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_lama_inpaint_preserves_unmasked():
    model = LaMa(TINY_LAMA_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 20, 28, 3))
    mask = jnp.zeros((1, 20, 28, 1)).at[:, 6:14, 8:20].set(1.0)
    out = jax.jit(lambda p, i, m: model.apply(p, i, m))(params, img, mask)
    assert out.shape == (1, 20, 28, 3)
    assert np.isfinite(np.asarray(out)).all()
    # unmasked pixels pass through exactly (LaMa.py:690-694 composite)
    keep = np.asarray(1.0 - mask)[..., 0] > 0.5
    np.testing.assert_allclose(np.asarray(out)[0][keep[0]],
                               np.asarray(img)[0][keep[0]], atol=1e-6)
    # hole pixels actually changed
    hole = ~keep
    assert not np.allclose(np.asarray(out)[0][hole[0]],
                           np.asarray(img)[0][hole[0]], atol=1e-3)


def test_lama_detection():
    from stable_renderer_tpu.models.weights import flatten

    model = LaMa(TINY_LAMA_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_lama_config(flat)
    assert det is not None and det.ngf == 8 and det.in_nc == 4

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
