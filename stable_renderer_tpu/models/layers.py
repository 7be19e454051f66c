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


def conv2d(p: dict, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """torch nn.Conv2d on NHWC activations; weight (O, I, kH, kW)."""
    w = p["weight"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def group_norm(p: dict, x: jax.Array, num_groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """torch nn.GroupNorm over NHWC (normalizes per group of channels).

    Statistics in float32 for bf16 stability. TPU layout note: the naive
    reshape-to-(N, S, G, C/G) formulation puts C/G (e.g. 10) in the lane
    dimension — a relayout of the whole tensor. Here the spatial reduction
    keeps C in lanes ((N, S, C) sums), and only the tiny (N, C) row is folded
    per group, so the heavy passes stay in the native layout.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    c = x32.shape[-1]
    g = num_groups
    while c % g:  # tiny test configs have c < 32; checkpoints always divide evenly
        g //= 2
    n = x32.shape[0]
    spatial = 1
    for d in x32.shape[1:-1]:
        spatial *= d
    xf = x32.reshape(n, spatial, c)
    s1 = jnp.sum(xf, axis=1)            # (N, C), lanes preserved
    s2 = jnp.sum(xf * xf, axis=1)
    cnt = float(spatial * (c // g))
    gs1 = jnp.sum(s1.reshape(n, g, c // g), axis=-1)  # (N, G): tiny
    gs2 = jnp.sum(s2.reshape(n, g, c // g), axis=-1)
    mean_g = gs1 / cnt
    var_g = jnp.maximum(gs2 / cnt - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)       # (N, C)
    rstd_c = jnp.repeat(rstd_g, c // g, axis=-1)
    bshape = (n,) + (1,) * (x32.ndim - 2) + (c,)
    out = (x32 - mean_c.reshape(bshape)) * rstd_c.reshape(bshape)
    out = out * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if p is not None and "weight" in p:
        out = out * p["weight"].astype(jnp.float32)
        if "bias" in p and p["bias"] is not None:
            out = out + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


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
