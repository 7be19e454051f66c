"""Pallas fused GroupNorm (+ optional SiLU) — minimal-HBM-traffic normalize.

Why this kernel exists: the XLA lowering of GroupNorm around the UNet/VAE
convs materializes the conv output twice — device traces show
``(f32, bf16)`` dual-output producer fusions (the f32 copy feeds the
statistics reduces and the normalize pass) plus a separate f32 read for the
normalize, ~14 bytes/element of HBM traffic for a 2-byte activation. This
kernel reads the activation once (bf16), computes the group statistics in
fp32 VREGs, applies the affine normalize and the (optional) SiLU in the same
program, and writes the result once: 4 bytes/element total.

Scope: one grid program per batch element holds the whole (S, C) slab in
VMEM — the right shape for the UNet's spatial resolutions (<= 64x64 x 1280c).
Callers gate on ``fits_vmem`` and fall back to the XLA path for huge spatial
extents (VAE decode at 512^2 stays on XLA until the tiled variant pays off).

STATUS — measured negative result (kept as an opt-in op, not routed by
default): in isolation this kernel matches XLA's GN at every UNet shape
(~0.13 ms incl. harness floor), but inside the full UNet it REGRESSED
17.2 -> 33.4 ms/eval. A Pallas custom-call is a fusion barrier: XLA's GN
fuses its statistics reduce into the producing conv's epilogue and the
normalize into the consumer, and it keeps the conv's blocked activation
layout — the custom-call forces full materialization plus relayout copies
on both sides of every one of the ~44 norm sites. Enable explicitly via
``models.layers._group_norm_pallas_on = True`` for experiments.

Group statistics use a one-hot (C, G) matmul instead of an in-kernel
reshape-to-(G, C/G): C/G is 10 for SD's 320-channel level — a hostile lane
layout — while the tiny matmul rides the MXU.

Reference capability: torch nn.GroupNorm as used throughout the reference's
model stack (comfy/ldm/modules/*; comfy/ops.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-program VMEM budget for the (S, C) slab: in(2B) + out(2B) + fp32
# working set (~8B) per element; 2M elements ~= 24MB of ~128MB VMEM
_MAX_ELEMENTS = 2 * 1024 * 1024


def fits_vmem(spatial: int, channels: int) -> bool:
    return spatial * channels <= _MAX_ELEMENTS


def _gn_kernel(x_ref, w_ref, b_ref, onehot_ref, o_ref, *, groups: int,
               eps: float, act: Optional[str], cnt: float):
    x = x_ref[0]                                   # (S, C) activation dtype
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=0, keepdims=True)        # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
    onehot = onehot_ref[...]                       # (C, G) f32
    gs1 = jax.lax.dot_general(                     # (1, G)
        s1, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gs2 = jax.lax.dot_general(
        s2, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    mean_g = gs1 / cnt
    var_g = jnp.maximum(gs2 / cnt - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast per-group stats back to channels: (1, G) @ (G, C)
    mean_c = jax.lax.dot_general(
        mean_g, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (1, C)
    rstd_c = jax.lax.dot_general(
        rstd_g, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    w = w_ref[...].astype(jnp.float32)             # (1, C)
    b = b_ref[...].astype(jnp.float32)
    scale = rstd_c * w
    shift = b - mean_c * scale
    y = xf * scale + shift                         # fp32 in VREGs, free here
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "act", "interpret"))
def group_norm_pallas(
    x: jax.Array,           # (N, S, C)
    weight: jax.Array,      # (C,)
    bias: jax.Array,        # (C,)
    groups: int = 32,
    eps: float = 1e-6,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    n, s, c = x.shape
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # pallas on XLA:CPU only runs interpreted
    lane_group = jnp.arange(c, dtype=jnp.int32) // (c // groups)
    onehot = (lane_group[:, None] ==
              jnp.arange(groups, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, act=act,
                          cnt=float(s * (c // groups))),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        interpret=interpret,
    )(x, weight.reshape(1, c), bias.reshape(1, c), onehot)
    return out
