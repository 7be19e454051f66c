"""SPSR tests (reference chainner_models/architecture/SPSR.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.spsr import (
    TINY_SPSR_CONFIG,
    SPSRNet,
    detect_spsr_config,
    gradient_map,
)


def test_gradient_map_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.rand(1, 6, 7, 3).astype(np.float32)
    ours = np.asarray(gradient_map(jnp.asarray(x)))
    kv = torch.tensor([[0., -1, 0], [0, 0, 0], [0, 1, 0]]).view(1, 1, 3, 3)
    kh = torch.tensor([[0., 0, 0], [-1, 0, 1], [0, 0, 0]]).view(1, 1, 3, 3)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    outs = []
    for i in range(3):
        xi = tx[:, i:i + 1]
        v = torch.nn.functional.conv2d(xi, kv, padding=1)
        h = torch.nn.functional.conv2d(xi, kh, padding=1)
        outs.append(torch.sqrt(v ** 2 + h ** 2 + 1e-6))
    theirs = torch.cat(outs, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_spsr_tiny_forward():
    model = SPSRNet(TINY_SPSR_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 12, 16, 3))
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 24, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_spsr_detection_and_loader(tmp_path):
    from stable_renderer_tpu.models.upscale import load_upscale_model
    from stable_renderer_tpu.models.weights import flatten

    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    model = SPSRNet(TINY_SPSR_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_spsr_config(flat)
    assert det is not None
    assert det.num_filters == 16 and det.num_blocks == 4 and det.scale == 2

    p = tmp_path / "spsr_tiny.safetensors"
    save_file(flat, str(p))
    loaded, params = load_upscale_model(str(p))
    assert type(loaded).__name__ == "SPSRNet"
    out = loaded.apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 16, 16, 3)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
