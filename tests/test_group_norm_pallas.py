"""Pallas fused GroupNorm(+SiLU) kernel correctness vs the XLA path
(interpret mode on CPU; the same kernel compiles on TPU). Reference
capability: torch nn.GroupNorm used throughout the reference model stack
(comfy/ldm/modules/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stable_renderer_tpu.ops.group_norm_pallas as gnp
from stable_renderer_tpu.models import layers


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = gnp.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(gnp.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("n,s,c,g", [(2, 64, 128, 32), (1, 17, 256, 32),
                                     (3, 8, 128, 4)])
def test_group_norm_pallas_matches_xla(n, s, c, g):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, s, c))
    w = jax.random.normal(jax.random.fold_in(key, 1), (c,))
    b = jax.random.normal(jax.random.fold_in(key, 2), (c,))
    ref = layers.group_norm({"weight": w, "bias": b}, x.reshape(n, s, 1, c),
                            num_groups=g).reshape(n, s, c)
    out = gnp.group_norm_pallas(x, w, b, groups=g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_group_norm_pallas_fused_silu():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 32, 128))
    w = jnp.ones((128,))
    b = jnp.zeros((128,))
    ref = jax.nn.silu(layers.group_norm({"weight": w, "bias": b},
                                        x.reshape(2, 32, 1, 128)))
    out = gnp.group_norm_pallas(x, w, b, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref).reshape(2, 32, 128),
                               atol=2e-5, rtol=2e-5)


def test_layers_group_norm_routes_to_pallas(monkeypatch):
    monkeypatch.setattr(layers, "_group_norm_pallas_on", True)
    calls = []
    orig = gnp.group_norm_pallas

    def spy(x, w, b, **kw):
        calls.append(x.shape)
        return orig(x, w, b, **kw)

    monkeypatch.setattr(gnp, "group_norm_pallas", spy)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 128))
    p = {"weight": jnp.ones((128,)), "bias": jnp.zeros((128,))}
    out = layers.group_norm(p, x, act="silu")
    assert out.shape == x.shape
    assert calls == [(2, 64, 128)]
    monkeypatch.setattr(layers, "_group_norm_pallas_on", False)
    ref = jax.nn.silu(layers.group_norm(p, x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_group_norm_act_param_xla_path():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 48))
    p = {"weight": jnp.ones((48,)), "bias": jnp.zeros((48,))}
    fused = layers.group_norm(p, x, act="silu")        # c%128!=0 -> XLA path
    ref = jax.nn.silu(layers.group_norm(p, x))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-6)
