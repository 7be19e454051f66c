"""Flash-attention kernel correctness vs the XLA reference path (interpret mode
on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stable_renderer_tpu.ops.flash_attention as fa
from stable_renderer_tpu.models.layers import attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode on CPU."""
    orig = fa.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fa.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize(
    "lq,lk,d", [(256, 256, 64), (256, 77, 64), (130, 333, 40)]
)
def test_flash_matches_reference(lq, lk, d):
    key = jax.random.PRNGKey(0)
    bh = 2
    q = jax.random.normal(key, (bh, lq, d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (bh, lk, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (bh, lk, d))
    out = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    # reference: plain softmax attention per merged head
    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    ref = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_pallas_wrapper_matches_layers_attention():
    key = jax.random.PRNGKey(3)
    b, l, heads, d = 2, 64, 4, 32
    q = jax.random.normal(key, (b, l, heads * d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, l, heads * d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, l, heads * d))
    ref = attention(q, k, v, heads)
    out = fa.attention_pallas(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_use_pallas_attention_routing():
    from stable_renderer_tpu.models import layers

    fa.use_pallas_attention(True)
    try:
        assert layers._attention_impl is fa.attention_pallas
        q = jnp.ones((1, 8, 16))
        out = layers.attention(q, q, q, heads=2)
        assert out.shape == (1, 8, 16)
    finally:
        fa.use_pallas_attention(False)
        assert layers._attention_impl is None
