"""ESRGAN/RRDBNet upscaler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.upscale import (
    RRDBConfig,
    RRDBNet,
    convert_esrgan_state_dict,
)
from stable_renderer_tpu.models.weights import flatten


def test_rrdbnet_x4_shapes():
    cfg = RRDBConfig(num_feat=16, num_block=2, num_grow_ch=8, scale=4)
    net = RRDBNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    out = jax.jit(net.apply)(params, x)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_rrdbnet_x2_shapes():
    cfg = RRDBConfig(num_feat=16, num_block=1, num_grow_ch=8, scale=2)
    net = RRDBNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    out = net.apply(params, jnp.zeros((1, 8, 8, 3)))
    assert out.shape == (1, 16, 16, 3)


def test_old_arch_key_conversion():
    old = {
        "model.0.weight": np.zeros((16, 3, 3, 3)),
        "model.0.bias": np.zeros((16,)),
        "model.1.sub.0.RDB1.conv1.0.weight": np.zeros((8, 16, 3, 3)),
        "model.1.sub.23.weight": np.zeros((16, 16, 3, 3)),
        "model.3.weight": np.zeros((16, 16, 3, 3)),
        "model.10.weight": np.zeros((3, 16, 3, 3)),
    }
    new = convert_esrgan_state_dict(old)
    assert "conv_first.weight" in new
    assert "body.0.rdb1.conv1.0.weight" in new or "body.0.rdb1.conv1.weight" in new
    assert "conv_body.weight" in new
    assert "conv_up1.weight" in new
    assert "conv_last.weight" in new
    # new-arch passes through untouched
    again = convert_esrgan_state_dict(new)
    assert set(again) == set(new)

import pytest  # noqa: E402
# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
