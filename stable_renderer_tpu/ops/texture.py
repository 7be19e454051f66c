"""Texture sampling as array gathers — replaces GL samplers.

The reference binds GL texture objects with NEAREST filtering for id/pos/noise and
LINEAR for color (reference: renderManager.py:239-240, texture.py loading). On TPU a
texture is just an (H, W, C) array; sampling is a gather, which XLA lowers to
dynamic-slice/one-hot matmuls. UV convention matches GL: u right, v UP — so v is
flipped into image row space here (the reference instead flips whole textures when
moving GL<->torch, texture.py flip=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _uv_to_xy(uv: jax.Array, h: int, w: int) -> tuple[jax.Array, jax.Array]:
    u = jnp.clip(uv[..., 0], 0.0, 1.0)
    v = jnp.clip(uv[..., 1], 0.0, 1.0)
    x = u * (w - 1)
    y = (1.0 - v) * (h - 1)  # GL v-up -> image row
    return x, y


def sample_nearest(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """Nearest sample of tex (H, W, C) at uv (..., 2) in [0,1]. Returns (..., C)."""
    h, w = tex.shape[0], tex.shape[1]
    x, y = _uv_to_xy(uv, h, w)
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    return tex[yi, xi]


def sample_bilinear(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample of tex (H, W, C) at uv (..., 2) in [0,1]. Returns (..., C)."""
    h, w = tex.shape[0], tex.shape[1]
    x, y = _uv_to_xy(uv, h, w)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    t00 = tex[y0, x0]
    t01 = tex[y0, x1]
    t10 = tex[y1, x0]
    t11 = tex[y1, x1]
    top = t00 * (1 - fx) + t01 * fx
    bot = t10 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def noise_texture(key: jax.Array, height: int, width: int, channels: int = 4) -> jax.Array:
    """Gaussian noise texture (the reference's Texture.CreateNoiseTex,
    texture.py:506-569): per-object latent noise rendered into the G-buffer."""
    return jax.random.normal(key, (height, width, channels), jnp.float32)
