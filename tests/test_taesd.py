"""TAESD structural tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.taesd import TAESD


def test_taesd_roundtrip_shapes():
    t = TAESD()
    params = t.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    z = jax.jit(t.encode)(params, x)
    assert z.shape == (1, 8, 8, 4)
    y = jax.jit(t.decode)(params, z)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_taesd_param_keys_match_torch_indices():
    from stable_renderer_tpu.models.weights import flatten

    t = TAESD()
    keys = set(flatten(t.init(jax.random.PRNGKey(0))))
    assert "encoder.0.weight" in keys          # conv(3,64)
    assert "encoder.1.conv.0.weight" in keys   # first block
    assert "encoder.2.weight" in keys          # stride-2 conv
    assert "decoder.1.weight" in keys          # conv(4,64) after clamp
    assert "decoder.3.conv.0.weight" in keys   # first decoder block
    assert "encoder.2.bias" not in keys        # stride convs are bias-free
