"""SCUNet denoiser tests (VERDICT r1 missing #9; reference
chainner_models/architecture/SCUNet.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.scunet import (
    TINY_SCUNET_CONFIG,
    SCUNet,
    _conv_transpose_up,
    detect_scunet_config,
)


def test_conv_transpose_up_matches_torch():
    """The einsum+depth-to-space upsample equals torch ConvTranspose2d
    (stride 2, kernel 2, no bias) on the same (in, out, 2, 2) weight."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    w = rng.randn(8, 4, 2, 2).astype(np.float32) * 0.1
    x = rng.randn(2, 5, 6, 8).astype(np.float32)
    ours = np.asarray(_conv_transpose_up({"weight": jnp.asarray(w)}, jnp.asarray(x)))
    theirs = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w), stride=2
    ).permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape == (2, 10, 12, 4)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_scunet_tiny_forward():
    model = SCUNet(TINY_SCUNET_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    # 40x24: not a multiple of 8*window=32 -> exercises reflect padding
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 24, 3))
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 40, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_scunet_config_detection_roundtrip():
    from stable_renderer_tpu.models.weights import flatten

    model = SCUNet(TINY_SCUNET_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_scunet_config(flat)
    assert det is not None
    assert det.dim == 16 and det.config == (1, 1, 1, 1, 1, 1, 1)
    assert det.head_dim == 8 and det.window_size == 4 and det.in_nc == 3


def test_unified_loader_dispatches_scunet(tmp_path):
    from stable_renderer_tpu.models.upscale import load_upscale_model
    from stable_renderer_tpu.models.weights import flatten

    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    model = SCUNet(TINY_SCUNET_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    p = tmp_path / "scunet_tiny.safetensors"
    save_file(flat, str(p))
    loaded, params = load_upscale_model(str(p))
    assert type(loaded).__name__ == "SCUNet"
    out = loaded.apply(params, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 32, 32, 3)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
