"""Exactness tests for ops/conv_pallas.py (interpret mode on the CPU mesh).

The kernel's on-chip perf claims live in scripts/sweep_conv_pallas.py; these
tests pin the semantics: conv3x3_pallas == lax.conv_general_dilated for every
block configuration (halo masking, roll-wrap columns, prologue/epilogue
fusion, int8 static-scale quantization)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import stable_renderer_tpu.ops.conv_pallas as cp
from stable_renderer_tpu.ops.conv_pallas import conv3x3_reference

pytestmark = pytest.mark.slow  # interpret-mode pallas is minutes-scale


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        cp.pl, "pallas_call",
        functools.partial(orig, interpret=True))


def _data(n, h, w_img, ci, co, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h, w_img, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    return x, w, b


@pytest.mark.parametrize(
    "n,h,w_img,ci,co,bh",
    [
        (1, 8, 8, 128, 128, None),   # single block
        (2, 16, 8, 256, 128, 4),     # multi row-block + batch
        (1, 8, 16, 128, 384, 2),     # multi cout-block (384 = 3 blocks of 128)
    ],
)
def test_matches_xla(n, h, w_img, ci, co, bh):
    x, w, b = _data(n, h, w_img, ci, co)
    out = cp.conv3x3_pallas(x, w, b, block_h=bh, block_co=128)
    ref = conv3x3_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_epilogue_silu():
    x, w, b = _data(1, 8, 8, 128, 128)
    out = cp.conv3x3_pallas(x, w, b, act="silu")
    ref = conv3x3_reference(x, w, b, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_prologue_norm_rows_and_act():
    """The fused GroupNorm-normalize prologue: per-(N, C) scale/shift + SiLU
    applied before the taps — equals normalize-then-conv in XLA."""
    n, ci = 2, 128
    x, w, b = _data(n, 8, 8, ci, 128)
    rng = np.random.default_rng(1)
    ps = jnp.asarray(rng.normal(size=(n, ci)), jnp.float32)
    pb = jnp.asarray(rng.normal(size=(n, ci)), jnp.float32)
    out = cp.conv3x3_pallas(x, w, b, pre_scale=ps, pre_shift=pb,
                            pre_act="silu", block_h=4)
    ref = conv3x3_reference(x, w, b, pre_scale=ps, pre_shift=pb,
                            pre_act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_int8_static_scale():
    x, w, b = _data(1, 8, 8, 128, 128)
    wf = np.asarray(w, np.float32)
    ws = np.abs(wf).max(axis=(0, 1, 2)) / 127.0
    wq = jnp.asarray(np.round(wf / ws).clip(-127, 127), jnp.int8)
    a_s = float(np.abs(np.asarray(x)).max() / 127.0)
    out = cp.conv3x3_pallas(x, wq, b, a_scale=a_s, w_scale=jnp.asarray(ws))
    ref = conv3x3_reference(x, w, b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_edge_rows_zero_padded():
    """First/last output rows see a zero halo (pad-1 semantics), not garbage:
    an all-ones input and all-ones weights give row sums 6/9/6 x Cin."""
    ci = 128
    x = jnp.ones((1, 4, 8, ci), jnp.float32)
    w = jnp.ones((3, 3, ci, 128), jnp.float32)
    out = np.asarray(cp.conv3x3_pallas(x, w, block_h=2))
    # interior pixel: 9 taps x ci; edge row, interior col: 6 taps x ci
    assert out[0, 1, 4, 0] == pytest.approx(9 * ci)
    assert out[0, 0, 4, 0] == pytest.approx(6 * ci)
    assert out[0, 3, 4, 0] == pytest.approx(6 * ci)
    assert out[0, 0, 0, 0] == pytest.approx(4 * ci)  # corner
