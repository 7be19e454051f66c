"""Pallas fused 3x3 conv — the SD hot-shape conv kernel (VERDICT r4 #1).

Why a custom conv when XLA already lowers convolutions to the MXU: the SD
UNet/VAE hot convs (3x3, stride 1, pad 1, NHWC, C in {128..1280}) measure at
26-67% of bf16 peak under XLA at batch 1-2 (PERF.md per-stage budget), and the
two layers XLA cannot give us are (a) an int8 path whose quantize/dequantize
never leaves VMEM — XLA's int8 conv round-trips an s32 accumulator through HBM
with a T(1,128) layout and REGRESSES below ~128^2 spatial (PERF.md round-4
int8 notes) — and (b) a GroupNorm-normalize+SiLU prologue fused into the conv
input read, so a ResBlock's norm->silu->conv chain costs ONE activation
round-trip instead of two. The round-3 Pallas-GroupNorm lesson (custom calls
are fusion barriers; see PERF.md "Negative result: Pallas GroupNorm") is
designed around, not ignored: the group statistics stay in XLA where they fuse
into the producing op's epilogue, and only the tiny per-(N,C) scale/shift
rows cross into this kernel as operands.

Kernel shape (TPU-native, not a translation — the reference just calls
cuDNN through torch, comfy/ops.py Conv2d):

  * conv-as-9-shifted-GEMMs: for tap (dy, dx), out += X_shifted @ W[dy, dx],
    with X flattened to (rows*W, Cin) so every tap is one MXU matmul over the
    whole row-block. BOTH shift directions are static sublane slices into one
    over-sized halo window — in flattened NHWC, tap (dy, dx)'s operand is the
    slab rows [m + dy*W + dx - 1], so a 2-row top/bottom halo makes every
    slice in-bounds (Mosaic cannot rotate packed bf16 sublanes, so no rolls).
    Column-edge contamination (a dx shift pulling the neighbouring row's edge
    pixel) is select-masked per dx variant.
  * the halo: each grid step owns BH output rows but reads BH+4 input rows via
    an element-granular ``pl.Element`` window (overlapping BlockSpec windows,
    stride BH, size BH+4) — no host/XLA zero-padding pass; out-of-image halo
    rows are select-masked in VMEM (Element edge padding is undefined memory).
  * full Cin per block (every SD hot shape fits VMEM), so each grid step
    computes its output tile in one shot — no cross-step accumulator state.
  * int8 mode: int8 HWIO weights + per-output-channel w_scale + a STATIC
    per-tensor activation scale (models/quant.py calibration): the slab is
    quantized once in VMEM, all 9 taps run int8 x int8 -> s32 on the MXU's 2x
    int8 rate, and dequantization is one f32 multiply on the accumulator —
    nothing int8-shaped ever touches HBM except the (halved) weights.

Reference semantics anchor: comfy/ldm/modules/diffusionmodules/openaimodel.py
ResBlock (GN -> SiLU -> conv 3x3 pad 1) and comfy/ldm/models (VAE
ResnetBlock); the reference runs these through torch/cuDNN with fp16/fp8
casts (comfy/ops.py, model_management.py), which has no TPU meaning.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_blocks(h: int, w: int, cin: int, cout: int,
                 bytes_per_elem: int) -> tuple:
    """(BH, BCO): largest row-block x output-channel-block fitting ~10 MB of
    the 16 MB VMEM, accounting for double-buffered slab/weights/output plus
    the f32 accumulator."""
    budget = 10 * 1024 * 1024

    def cost(bh, bco):
        slab = 2 * (bh + 4) * w * cin * bytes_per_elem
        wgt = 2 * 9 * cin * bco * bytes_per_elem
        acc = bh * w * bco * 4
        out = 2 * bh * w * bco * 2
        return slab + wgt + acc + out

    # Mosaic lane constraint: the Cout block must be a multiple of 128 or the
    # whole Cout (320/640-channel UNet levels take the full-Cout block)
    cands = [cout] + [d for d in (1024, 512, 256, 128)
                      if d < cout and cout % d == 0]
    bco = cout
    for c in cands:
        bco = c
        if cost(1, c) <= budget // 2:
            break
    bh = h
    while bh > 1 and (h % bh or cost(bh, bco) > budget):
        bh //= 2
    return bh, bco


def _conv3x3_kernel(
    x_ref,       # (1, BH+2, W, Cin) haloed input window
    w_ref,       # (3, 3, Cin, BCO)
    b_ref,       # (1, BCO) f32 bias (zeros when absent)
    ps_ref,      # (N, Cin) f32 prologue scale, FULL array (tiny; Mosaic
    pb_ref,      # (N, Cin) f32 prologue shift    forbids (1, C) row blocks)
    ws_ref,      # (1, BCO) f32 int8 weight scales (unused unless int8)
    as_ref,      # (1, 1) f32 SMEM int8 activation scale — an OPERAND, not a
    # static value: calibrated scales live in the params pytree (traced)
    o_ref,       # (1, BH, W, BCO)
    *,
    h: int,
    w_img: int,
    bh: int,
    act: Optional[str],
    pre: bool,
    pre_act: Optional[str],
    int8_mode: bool,
    out_dtype,
):
    ni = pl.program_id(0)
    hi = pl.program_id(2)
    m_slab = (bh + 4) * w_img   # 2-row halo above AND below (see docstring)
    m_win = (bh + 2) * w_img    # the 1-row-halo window the dx variants cover
    cin = x_ref.shape[-1]

    xs = x_ref[0].reshape(m_slab, cin)
    if pre:
        # fused GroupNorm-normalize (+ activation): the per-(N, C) scale and
        # shift rows are tiny XLA-side math; applying them here makes the
        # ResBlock's norm -> act -> conv chain a single activation read.
        # Math in f32 (Mosaic mis-verifies bf16 logistic broadcasts), cast
        # back for the MXU. The wrapper zero-pads 2 halo rows top/bottom;
        # the prologue turns them into silu(shift) != 0, so restore them to
        # zero (slab row k is padded row hi*bh + k; real rows are [2, h+1]).
        dt = xs.dtype
        xs = xs.astype(jnp.float32) * ps_ref[ni][None, :] \
            + pb_ref[ni][None, :]
        if pre_act == "silu":
            xs = jax.nn.silu(xs)
        row = (jax.lax.broadcasted_iota(jnp.int32, (m_slab, 1), 0) // w_img
               + hi * bh)
        xs = jnp.where((row >= 2) & (row <= h + 1), xs, 0)
        if not int8_mode:  # int8 quantizes from f32 directly below
            xs = xs.astype(dt)

    if int8_mode:
        inv = 1.0 / as_ref[0, 0]
        xs = jnp.clip(jnp.round(xs.astype(jnp.float32) * inv),
                      -127, 127).astype(jnp.int8)
        acc_t = jnp.int32
    else:
        acc_t = jnp.float32

    # dx variants over the inner window: v_dx[j] = xs[j + W + dx - 1], i.e.
    # the whole slab shifted so tap (dy, dx) is the static slice
    # v_dx[dy*W : dy*W + m_out]. Static sublane slices — no rotates.
    col = jax.lax.broadcasted_iota(jnp.int32, (m_win, 1), 0) % w_img
    x0 = jnp.where(col != 0, xs[w_img - 1: w_img - 1 + m_win], 0)
    x1 = xs[w_img: w_img + m_win]
    x2 = jnp.where(col != w_img - 1, xs[w_img + 1: w_img + 1 + m_win], 0)

    m_out = bh * w_img
    acc = None
    for dy in range(3):
        base = dy * w_img
        for dx, xv in enumerate((x0, x1, x2)):
            part = jax.lax.dot_general(
                xv[base:base + m_out], w_ref[dy, dx],
                (((1,), (0,)), ((), ())), preferred_element_type=acc_t,
            )
            acc = part if acc is None else acc + part

    if int8_mode:
        out = acc.astype(jnp.float32) * (as_ref[0, 0] * ws_ref[0][None, :])
    else:
        out = acc
    out = out + b_ref[0][None, :]
    if act == "silu":
        out = jax.nn.silu(out)
    o_ref[0] = out.reshape(bh, w_img, -1).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "pre_act", "block_h", "block_co", "out_dtype"),
)
def conv3x3_pallas(
    x: jax.Array,                      # (N, H, W, Cin) bf16/f32
    w: jax.Array,                      # (3, 3, Cin, Cout) HWIO; int8 => int8 mode
    bias: Optional[jax.Array] = None,  # (Cout,)
    *,
    act: Optional[str] = None,         # epilogue: None | 'silu'
    pre_scale: Optional[jax.Array] = None,  # (N, Cin) f32 prologue rows
    pre_shift: Optional[jax.Array] = None,
    pre_act: Optional[str] = None,     # prologue activation: None | 'silu'
    a_scale=None,                      # int8 activation scale (traced scalar
    # or float — calibrated scales live in the params pytree)
    w_scale: Optional[jax.Array] = None,  # (Cout,) f32 int8 weight scales
    block_h: Optional[int] = None,
    block_co: Optional[int] = None,
    out_dtype=None,
) -> jax.Array:
    """3x3 stride-1 pad-1 conv on NHWC with fused prologue/epilogue. See the
    module docstring. Exactness vs lax.conv_general_dilated asserted in
    tests/test_conv_pallas.py."""
    n, h, w_img, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    int8_mode = w.dtype == jnp.int8
    if int8_mode:
        assert a_scale is not None and w_scale is not None
    bpe = 1 if int8_mode else x.dtype.itemsize

    bh0, bco0 = _pick_blocks(h, w_img, cin, cout, bpe)
    bh = block_h or bh0
    while h % bh:
        bh //= 2
    bco = block_co or bco0
    while cout % bco:
        bco //= 2

    bias_f = (jnp.zeros((cout,), jnp.float32) if bias is None
              else bias.astype(jnp.float32)).reshape(1, cout)
    pre = pre_scale is not None
    ps = (pre_scale.astype(jnp.float32) if pre
          else jnp.zeros((n, cin), jnp.float32))
    pb = (pre_shift.astype(jnp.float32) if pre_shift is not None
          else jnp.zeros((n, cin), jnp.float32))
    ws = (w_scale.astype(jnp.float32) if w_scale is not None
          else jnp.zeros((cout,), jnp.float32)).reshape(1, cout)
    asv = jnp.asarray(a_scale if a_scale is not None else 1.0,
                      jnp.float32).reshape(1, 1)

    # grid order (n, co, hi): hi innermost so the weight block stays resident
    # across a whole row sweep; the input slab refetches per co block, but
    # n_co > 1 only at the tiny-spatial/huge-channel shapes
    # 2-row zero halo top/bottom: Mosaic rejects low-padded Element windows,
    # so the pad happens XLA-side (usually fused with the producer; worst
    # case one extra input round-trip, ~2 orders below the conv's compute)
    x = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))

    grid = (n, cout // bco, h // bh)
    kernel = functools.partial(
        _conv3x3_kernel,
        h=h, w_img=w_img, bh=bh, act=act, pre=pre, pre_act=pre_act,
        int8_mode=int8_mode, out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # haloed window over the row-padded input: element-granular start
            # hi*bh, size bh+4, stride bh — overlapping windows. Mosaic
            # requires all-or-none Element dims (trivial Elements elsewhere)
            # and rejects logical low padding, hence the XLA-side jnp.pad
            # (one cheap fused copy, ~2 orders below the conv's compute).
            pl.BlockSpec((pl.Element(1), pl.Element(bh + 4),
                          pl.Element(w_img), pl.Element(cin)),
                         lambda ni, co, hi: (ni, hi * bh, 0, 0)),
            pl.BlockSpec((3, 3, cin, bco),
                         lambda ni, co, hi: (0, 0, 0, co)),
            pl.BlockSpec((1, bco), lambda ni, co, hi: (0, co)),
            pl.BlockSpec((n, cin), lambda ni, co, hi: (0, 0)),
            pl.BlockSpec((n, cin), lambda ni, co, hi: (0, 0)),
            pl.BlockSpec((1, bco), lambda ni, co, hi: (0, co)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, w_img, bco),
                               lambda ni, co, hi: (ni, hi, 0, co)),
        out_shape=jax.ShapeDtypeStruct((n, h, w_img, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_img * cin * cout * 9,
            bytes_accessed=n * h * w_img * (cin + cout) * bpe
            + 9 * cin * cout * bpe,
            transcendentals=n * h * w_img * cout if act else 0,
        ),
    )(x, w, bias_f, ps, pb, ws, asv)
    return out


def conv3x3_reference(x, w, bias=None, *, act=None, pre_scale=None,
                      pre_shift=None, pre_act=None):
    """XLA implementation with identical semantics (tests/sweeps and the
    non-TPU fallback of the fused-prologue path)."""
    if pre_scale is not None:
        bshape = (x.shape[0], 1, 1, x.shape[-1])
        x = x * pre_scale.reshape(bshape).astype(x.dtype) \
            + pre_shift.reshape(bshape).astype(x.dtype)
        if pre_act == "silu":
            x = jax.nn.silu(x)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if act == "silu":
        out = jax.nn.silu(out)
    return out


def use_pallas_conv(enable: bool = True) -> None:
    """Route eligible 3x3 convs (models.layers.conv2d + norm_act_conv)
    through this kernel — TPU only. The shape gate is the measured table in
    layers._pallas_conv_gate (scripts/sweep_conv_pallas.py)."""
    from stable_renderer_tpu.models import layers

    layers._conv_pallas_on = enable
