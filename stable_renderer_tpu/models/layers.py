"""Shared neural-net layers as pure functions over torch-layout param dicts.

Design: every model in models/ is a pure function ``apply(params, ...) -> array``
where ``params`` is a nested dict whose leaf names and layouts match the reference
checkpoints (torch Linear weight = (out, in), Conv2d = (O, I, kH, kW)), so
safetensors load with zero renaming gymnastics (see models/weights.py). Activations
are NHWC (TPU-native); torch NCHW convs map via dimension_numbers.

Replaces torch.nn usage across the reference's model stack
(reference: source/comfyUI/comfy/ldm/modules/*, comfy/ops.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(p: dict, x: jax.Array) -> jax.Array:
    """torch nn.Linear: weight (out, in), optional bias."""
    out = x @ p["weight"].T.astype(x.dtype)
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


_conv_pallas_on = False  # set by ops.conv_pallas.use_pallas_conv (TPU only)

# routing scope experiment knob (A/B without source edits — every source
# edit rekeys the persistent compile cache): "all" | "vae" | "unet".
# SD channel sets are disjoint (VAE 128/256/512 vs SD-UNet 320/640/1280),
# so Cin identifies the model family without plumbing a flag through.
import os as _os  # noqa: E402

_conv_scope = _os.environ.get("SR_PALLAS_CONV_SCOPE", "all")


def _pallas_conv_gate(h: int, w: int, cin: int, cout: int) -> bool:
    """Measured routing table (scripts/sweep_conv_pallas.py, v5e fori-loop
    marginals): the Pallas kernel wins at >= 64^2 spatial with big channels
    (bf16 1.1-1.3x, int8 1.5-2.3x); below 64^2 the ops are sub-0.1 ms and
    XLA's fusion wins; 256^2 x cin>=512 measured 0.97x — keep XLA there."""
    px = h * w
    if px < 64 * 64 or cin < 128 or cout < 128:
        return False
    if px == 256 * 256 and cin >= 512:
        return False
    if _conv_scope == "vae" and cin not in (128, 256, 512):
        return False
    if _conv_scope == "unet" and cin not in (320, 640, 1280):
        return False
    return True


def conv2d(p: dict, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """torch nn.Conv2d on NHWC activations; weight (O, I, kH, kW).

    Trees transformed by ``weights.tree_to_hwio`` carry ``w_hwio``
    ((kH, kW, I, O)) instead — the TPU-native layout, measured 1.1-1.65x
    faster than OIHW at the SD hot shapes (scripts/sweep_conv.py on v5e;
    OIHW pays a relayout inside the conv lowering). Checkpoint-format trees
    keep torch's OIHW and still work.

    Params quantized by models.quant.quantize_tree carry ``weight_q``
    (int8 HWIO) instead and take the int8 MXU path. On TPU with
    ``use_pallas_conv(True)``, eligible 3x3 stride-1 convs (bf16 HWIO and
    calibrated int8 alike) route to ops/conv_pallas.py's fused kernel
    (_pallas_conv_gate — the measured shape table)."""
    if "weight_q" in p:
        # int8 gate is LOOSER than bf16's: the Pallas int8 path beat XLA bf16
        # down to 32^2 spatial in the sweep (0.056 vs 0.091 ms at 32^2 x 640),
        # while the XLA int8 fallback REGRESSES below 128^2 (PERF.md r4)
        if (_conv_pallas_on and stride == 1 and padding == 1
                and p["weight_q"].shape[:2] == (3, 3)
                and "a_scale" in p
                and x.shape[1] * x.shape[2] >= 32 * 32
                and x.shape[3] >= 128 and p["weight_q"].shape[-1] >= 128):
            from stable_renderer_tpu.ops.conv_pallas import conv3x3_pallas

            return conv3x3_pallas(
                x, p["weight_q"], p.get("bias"),
                a_scale=p["a_scale"], w_scale=p["w_scale"],
                out_dtype=x.dtype)
        from stable_renderer_tpu.models.quant import conv2d_q

        return conv2d_q(p, x, stride=stride, padding=padding)
    from stable_renderer_tpu.models import quant as _quant

    if _quant._CAL.active:
        _quant._CAL.record(p, x)
    if "w_hwio" in p:
        w = p["w_hwio"].astype(x.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        w = p["weight"].astype(x.dtype)
        dn = ("NHWC", "OIHW", "NHWC")
    if (_conv_pallas_on and stride == 1 and padding == 1
            and "w_hwio" in p and w.shape[:2] == (3, 3)
            and _pallas_conv_gate(x.shape[1], x.shape[2],
                                  x.shape[3], w.shape[-1])):
        from stable_renderer_tpu.ops.conv_pallas import conv3x3_pallas

        return conv3x3_pallas(x, w, p.get("bias"), out_dtype=x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=dn,
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


_group_norm_pallas_on = False  # set by ops.flash_attention.use_pallas_attention


def norm_act_conv(pnorm: dict, pconv: dict, x: jax.Array,
                  num_groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """The ResBlock hot chain GroupNorm -> SiLU -> conv3x3(pad 1) as ONE
    fused Pallas kernel when routed (openaimodel.py ResBlock in_layers /
    model.py ResnetBlock): the group statistics are two cheap XLA reduces
    that fuse into the producer; the normalize multiply-add + SiLU + conv
    run inside conv_pallas's prologue, so the activation crosses HBM once
    instead of twice. Falls back to group_norm(act='silu') + conv2d when the
    kernel isn't routed (CPU, ineligible shape, quantized tree — the int8
    path keeps its own calibrated pre-conv scale semantics)."""
    n, h, w, c = x.shape
    eligible = (_conv_pallas_on and "w_hwio" in pconv
                and "weight_q" not in pconv
                and pconv["w_hwio"].shape[:2] == (3, 3)
                and _pallas_conv_gate(h, w, c, pconv["w_hwio"].shape[-1]))
    if not eligible:
        return conv2d(pconv, group_norm(pnorm, x, num_groups, eps,
                                        act="silu"), padding=1)
    from stable_renderer_tpu.ops.conv_pallas import conv3x3_pallas

    g = num_groups
    while c % g:
        g //= 2
    spatial = h * w
    xf = x.reshape(n, spatial, c)
    s1 = jnp.sum(xf, axis=1, dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(xf), axis=1, dtype=jnp.float32)
    cnt = float(spatial * (c // g))
    gs1 = jnp.sum(s1.reshape(n, g, c // g), axis=-1)
    gs2 = jnp.sum(s2.reshape(n, g, c // g), axis=-1)
    mean_g = gs1 / cnt
    var_g = jnp.maximum(gs2 / cnt - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)
    rstd_c = jnp.repeat(rstd_g, c // g, axis=-1)
    scale = rstd_c * pnorm["weight"].astype(jnp.float32)[None]   # (N, C)
    shift = pnorm["bias"].astype(jnp.float32)[None] - mean_c * scale
    return conv3x3_pallas(
        x, pconv["w_hwio"].astype(x.dtype), pconv.get("bias"),
        pre_scale=scale, pre_shift=shift, pre_act="silu",
        out_dtype=x.dtype)


def group_norm(p: dict, x: jax.Array, num_groups: int = 32, eps: float = 1e-6,
               act: Optional[str] = None) -> jax.Array:
    """torch nn.GroupNorm over NHWC (normalizes per group of channels), with
    an optionally fused activation (``act="silu"``).

    Statistics in float32 for bf16 stability. TPU layout note: the naive
    reshape-to-(N, S, G, C/G) formulation puts C/G (e.g. 10) in the lane
    dimension — a relayout of the whole tensor. Here the spatial reduction
    keeps C in lanes ((N, S, C) sums), and only the tiny (N, C) row is folded
    per group, so the heavy passes stay in the native layout. On TPU, the
    Pallas fused kernel (ops/group_norm_pallas.py) replaces the whole thing
    with a single 1-read/1-write program when the slab fits VMEM.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = num_groups
    while c % g:  # tiny test configs have c < 32; checkpoints always divide evenly
        g //= 2
    n = x.shape[0]
    spatial = 1
    for d in x.shape[1:-1]:
        spatial *= d
    if _group_norm_pallas_on and c % 128 == 0 and spatial >= 8:
        from stable_renderer_tpu.ops.group_norm_pallas import (
            fits_vmem, group_norm_pallas,
        )

        if fits_vmem(spatial, c):
            out = group_norm_pallas(
                x.reshape(n, spatial, c), p["weight"], p["bias"],
                groups=g, eps=eps, act=act,
            )
            return out.reshape(x.shape)
    # Accumulate stats in f32 WITHOUT converting the tensor upfront: an
    # upfront astype(f32) makes XLA materialize the producing conv's output
    # as f32 tuple elements (2x HBM writes — seen as (f32,f32) convolution
    # fusions in the device trace). dtype-arg reductions keep the tensor
    # bf16-resident; the f32 convert then fuses into the reduce and the
    # final normalize pass.
    xf = x.reshape(n, spatial, c)
    s1 = jnp.sum(xf, axis=1, dtype=jnp.float32)            # (N, C), lanes kept
    # square in the activation dtype, accumulate f32: squaring an explicit
    # f32 copy makes XLA emit the producer as an (f32 x, f32 x^2) tuple —
    # 4x the HBM writes. bf16 x^2 with f32 accumulation costs ~0.2% on the
    # variance (well inside bf16 activation noise) and keeps the producer
    # fusion's output bf16.
    s2 = jnp.sum(jnp.square(xf), axis=1, dtype=jnp.float32)
    cnt = float(spatial * (c // g))
    gs1 = jnp.sum(s1.reshape(n, g, c // g), axis=-1)  # (N, G): tiny
    gs2 = jnp.sum(s2.reshape(n, g, c // g), axis=-1)
    mean_g = gs1 / cnt
    var_g = jnp.maximum(gs2 / cnt - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)       # (N, C)
    rstd_c = jnp.repeat(rstd_g, c // g, axis=-1)
    bshape = (n,) + (1,) * (x.ndim - 2) + (c,)
    scale = rstd_c * p["weight"].astype(jnp.float32)   # (N, C), tiny
    shift = p["bias"].astype(jnp.float32) - mean_c * scale
    # The big multiply-add runs in the activation dtype: an astype(f32) here
    # gets CSE'd with the reduces' converts into one materialized f32 copy of
    # the whole tensor ((f32, bf16) dual-output producer fusions in the device
    # trace — 3x the HBM writes). scale/shift are f32-computed tiny rows; the
    # output is orig_dtype anyway, so bf16 FMA costs one rounding step.
    out = x * scale.reshape(bshape).astype(orig_dtype) \
        + shift.reshape(bshape).astype(orig_dtype)
    if act == "silu":
        out = jax.nn.silu(out)
    elif act is not None:
        raise ValueError(f"unknown group_norm act {act!r}")
    return out


def layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    # Stats accumulate in f32 via reduce dtype args (not an upfront astype,
    # which would force the producer to materialize f32 — see group_norm).
    orig_dtype = x.dtype
    mean = jnp.mean(x, -1, dtype=jnp.float32, keepdims=True)
    m2 = jnp.mean(jnp.square(x), -1, dtype=jnp.float32, keepdims=True)
    var = jnp.maximum(m2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    scale, shift = rstd, -mean * rstd
    if p is not None and "weight" in p:
        w = p["weight"].astype(jnp.float32)
        scale = rstd * w
        shift = -mean * scale
        if "bias" in p and p["bias"] is not None:
            shift = shift + p["bias"].astype(jnp.float32)
    # activation-dtype FMA for the same reason as group_norm (avoid a CSE'd
    # full-size f32 materialization); scale/shift are f32 rows
    out = x * scale.astype(orig_dtype) + shift.astype(orig_dtype)
    return out


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def gelu_quick(x: jax.Array) -> jax.Array:
    """CLIP's quick-gelu: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(p: dict, x: jax.Array) -> jax.Array:
    """GEGLU feed-forward gate (attention.py FeedForward net.0)."""
    proj = linear(p["proj"], x)
    a, b = jnp.split(proj, 2, axis=-1)
    return a * jax.nn.gelu(b)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding (openaimodel timestep_embedding).

    Args: t (N,) float; returns (N, dim).
    """
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


_attention_impl = None  # set by ops.flash_attention.use_pallas_attention


def attention(
    q: jax.Array,  # (B, Lq, H*D)
    k: jax.Array,  # (B, Lk, H*D)
    v: jax.Array,  # (B, Lk, H*D)
    heads: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head scaled dot-product attention over packed head dims.

    The reference dispatches between xformers/pytorch/split kernels
    (comfy/ldm/modules/attention.py optimized_attention); here the default is the
    XLA einsum chain, and ops/flash_attention.py's Pallas kernel swaps in via
    ``use_pallas_attention()`` for unmasked attention on TPU.
    """
    if _attention_impl is not None and mask is None:
        return _attention_impl(q, k, v, heads)
    b, lq, hd = q.shape
    d = hd // heads
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    qh = q.reshape(b, lq, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, hd)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """2x nearest upsampling on NHWC (openaimodel Upsample F.interpolate)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
