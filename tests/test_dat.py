"""DAT (Dual Aggregation Transformer) tests (VERDICT r1 missing #9; reference
chainner_models/architecture/DAT.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.dat import (
    TINY_DAT_CONFIG,
    DAT,
    DATConfig,
    _bn,
    _do_shift,
    detect_dat_config,
)


def test_batchnorm_inference_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    c = 8
    p = {"weight": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
         "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
         "running_mean": jnp.asarray(rng.randn(c).astype(np.float32)),
         "running_var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)}
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    ours = np.asarray(_bn(p, jnp.asarray(x)))
    m = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(np.asarray(p["weight"])))
        m.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        m.running_mean.copy_(torch.from_numpy(np.asarray(p["running_mean"])))
        m.running_var.copy_(torch.from_numpy(np.asarray(p["running_var"])))
        theirs = m(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_shift_cadence_matches_reference():
    """DAT.py:363-366: shift at (rg even, b in {2,6,10,...}) or
    (rg odd, b in {0,4,8,...})."""
    assert not _do_shift(0, 0)
    assert _do_shift(0, 2)
    assert not _do_shift(0, 4)
    assert _do_shift(0, 6)
    assert _do_shift(1, 0)
    assert not _do_shift(1, 2)
    assert _do_shift(1, 4)


def test_dat_tiny_forward():
    model = DAT(TINY_DAT_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dat_pixelshuffle_flavor_and_deeper():
    cfg = DATConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 2),
                    split_size=(2, 4), expansion_factor=2.0,
                    upsampler="pixelshuffle", upscale=4, num_feat=8)
    model = DAT(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # 10x14 exercises the internal rectangle-window padding
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 10, 14, 3))
    out = model.apply(params, x)
    assert out.shape == (1, 40, 56, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dat_config_detection_roundtrip():
    from stable_renderer_tpu.models.weights import flatten

    model = DAT(TINY_DAT_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_dat_config(flat)
    assert det is not None
    assert det.embed_dim == 16 and det.depths == (1,) * 1 or det.depths == (2,)
    assert det.upscale == 2 and det.upsampler == "pixelshuffledirect"
    assert det.expansion_factor == 2.0


def test_unified_loader_dispatches_dat(tmp_path):
    from stable_renderer_tpu.models.upscale import load_upscale_model
    from stable_renderer_tpu.models.weights import flatten

    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    model = DAT(TINY_DAT_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    p = tmp_path / "dat_tiny.safetensors"
    save_file(flat, str(p))
    loaded, params = load_upscale_model(str(p))
    assert type(loaded).__name__ == "DAT"
    out = loaded.apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 16, 16, 3)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
