"""OmniSR tests (reference chainner_models/architecture/OmniSR/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.omnisr import (
    TINY_OMNISR_CONFIG,
    OmniSR,
    _block_partition,
    _block_reverse,
    detect_omnisr_config,
)


def test_grid_vs_block_partition():
    """Block windows tile contiguously; grid windows are stride-dilated
    (OSA.py Rearrange 'b d (x w1) (y w2)' vs 'b d (w1 x) (w2 y)')."""
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    blk = _block_partition(x, 2, grid=False)
    grd = _block_partition(x, 2, grid=True)
    # block window 0 = top-left 2x2 patch
    np.testing.assert_allclose(np.asarray(blk[0, :, 0]), [0, 1, 4, 5])
    # grid window 0 = stride-2 samples
    np.testing.assert_allclose(np.asarray(grd[0, :, 0]), [0, 2, 8, 10])
    # both reverse exactly
    np.testing.assert_allclose(np.asarray(_block_reverse(blk, 2, 4, 4, False)),
                               np.asarray(x))
    np.testing.assert_allclose(np.asarray(_block_reverse(grd, 2, 4, 4, True)),
                               np.asarray(x))


def test_omnisr_tiny_forward():
    model = OmniSR(TINY_OMNISR_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    # >=15px needed: ESA's stride-2 conv + 7x3 maxpool (min_size_restriction
    # is 16 in the reference too, OmniSR.py:118)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 18, 22, 3))
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 36, 44, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_omnisr_detection_and_loader(tmp_path):
    from stable_renderer_tpu.models.upscale import load_upscale_model
    from stable_renderer_tpu.models.weights import flatten

    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    model = OmniSR(TINY_OMNISR_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_omnisr_config(flat)
    assert det is not None
    assert det.num_feat == 16 and det.res_num == 1
    assert det.window_size == 4 and det.up_scale == 2 and det.block_num == 1

    p = tmp_path / "omnisr_tiny.safetensors"
    save_file(flat, str(p))
    loaded, params = load_upscale_model(str(p))
    assert type(loaded).__name__ == "OmniSR"
    out = loaded.apply(params, jnp.zeros((1, 16, 16, 3)))
    assert out.shape == (1, 32, 32, 3)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
