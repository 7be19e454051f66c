"""HAT (Hybrid Attention Transformer) tests (VERDICT r1 missing #9; reference
chainner_models/architecture/HAT.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.hat import (
    TINY_HAT_CONFIG,
    HAT,
    _extract_overlap_windows,
    _rpi_oca,
    detect_hat_config,
)


def test_overlap_window_extraction_matches_torch_unfold():
    """The strided gather equals torch Unfold(kernel=ow, stride=ws,
    pad=(ow-ws)/2) (HAT.py:430-436,478-492)."""
    torch = pytest.importorskip("torch")
    ws, ow = 4, 6
    x = np.random.RandomState(0).randn(2, 8, 12, 5).astype(np.float32)
    ours = np.asarray(_extract_overlap_windows(jnp.asarray(x), ws, ow))
    unf = torch.nn.functional.unfold(
        torch.from_numpy(x).permute(0, 3, 1, 2), kernel_size=ow, stride=ws,
        padding=(ow - ws) // 2)  # (B, C*ow*ow, nW)
    b = 2
    c = 5
    theirs = unf.view(b, c, ow, ow, -1).permute(0, 4, 2, 3, 1)
    theirs = theirs.reshape(b, -1, ow * ow, c).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_rpi_oca_in_table_range():
    ws, ow = 4, 6
    idx = _rpi_oca(ws, ow)
    assert idx.shape == (ws * ws, ow * ow)
    assert idx.min() >= 0
    assert idx.max() < (ws + ow - 1) ** 2


def test_hat_tiny_forward():
    model = HAT(TINY_HAT_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 10, 14, 3))  # pads to 12x16
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 20, 28, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_hat_config_detection_roundtrip():
    from stable_renderer_tpu.models.weights import flatten

    model = HAT(TINY_HAT_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_hat_config(flat)
    assert det is not None
    assert det.embed_dim == 16 and det.depths == (2,)
    assert det.window_size == 4 and det.upscale == 2
    assert det.overlap_ratio == 0.5
    assert det.compress_ratio == 2 and det.squeeze_factor == 4


def test_unified_loader_prefers_hat_over_swinir(tmp_path):
    """HAT checkpoints share SwinIR's residual_group layout; the loader must
    dispatch on the OCAB marker first."""
    from stable_renderer_tpu.models.upscale import load_upscale_model
    from stable_renderer_tpu.models.weights import flatten

    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    model = HAT(TINY_HAT_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    p = tmp_path / "hat_tiny.safetensors"
    save_file(flat, str(p))
    loaded, params = load_upscale_model(str(p))
    assert type(loaded).__name__ == "HAT"
    out = loaded.apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 16, 16, 3)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
