"""RestoreFormer tests (reference face/restoreformer_arch.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.restoreformer import (
    TINY_RESTOREFORMER_CONFIG,
    RestoreFormer,
    detect_restoreformer_config,
)


def test_restoreformer_tiny_forward():
    model = RestoreFormer(TINY_RESTOREFORMER_CONFIG)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3)) * 2 - 1
    out = jax.jit(lambda p, a: model.apply(p, a))(params, x)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
    # output is conditioned on the input (cross-attn priors + codebook)
    out2 = model.apply(params, jnp.zeros((1, 16, 16, 3)))
    assert not np.allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_restoreformer_detection():
    from stable_renderer_tpu.models.weights import flatten

    model = RestoreFormer(TINY_RESTOREFORMER_CONFIG)
    flat = {k: np.asarray(v)
            for k, v in flatten(model.init(jax.random.PRNGKey(0))).items()}
    det = detect_restoreformer_config(flat)
    assert det is not None
    assert det.ch == 8 and det.ch_mult == (1, 2)
    assert det.codebook_size == 32 and det.embed_dim == 16
    assert det.num_res_blocks == 1

import pytest  # noqa: E402
# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
