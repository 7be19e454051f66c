"""Image-space edge detection for ControlNet conditioning.

Capability match for the reference's Kornia-based canny node
(reference: comfyUI/comfy_extras/nodes_canny.py used by OutputAICannyMap,
diffusionManager.py:126-131). Implemented as a fused Sobel + hysteresis-free
double-threshold — the usual approximation used for diffusion conditioning, fully
jittable (Kornia's full NMS hysteresis is a host-side nicety the conditioning does
not need; NMS via 4-direction comparison is included).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel(size: int = 5, sigma: float = 1.0) -> jax.Array:
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (ax / sigma) ** 2)
    k = jnp.outer(g, g)
    return k / k.sum()


def _conv(x: jax.Array, k: jax.Array) -> jax.Array:
    """Depthwise 2D convolution of (N, H, W, 1) with kernel (kh, kw), SAME."""
    kh, kw = k.shape
    return jax.lax.conv_general_dilated(
        x,
        k[None, None],
        (1, 1),
        [(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )


@partial(jax.jit, static_argnames=("low_threshold", "high_threshold"))
def canny(
    images: jax.Array,  # (N, H, W, 3) in [0, 1]
    low_threshold: float = 0.4,
    high_threshold: float = 0.8,
) -> jax.Array:
    """(N, H, W, 3) edge map in {0, 1} (replicated to 3 channels like the
    reference's canny buffer)."""
    gray = (
        0.299 * images[..., 0] + 0.587 * images[..., 1] + 0.114 * images[..., 2]
    )[..., None]
    blurred = _conv(gray, _gaussian_kernel())
    sobel_x = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    sobel_y = sobel_x.T
    gx = _conv(blurred, sobel_x)[..., 0]
    gy = _conv(blurred, sobel_y)[..., 0]
    mag = jnp.sqrt(gx**2 + gy**2)
    mag = mag / jnp.maximum(mag.max(axis=(1, 2), keepdims=True), 1e-8)

    # quantized-direction non-maximum suppression
    angle = jnp.arctan2(gy, gx)
    q = jnp.round(angle / (jnp.pi / 4)).astype(jnp.int32) % 4
    sh = lambda a, dy, dx: jnp.roll(jnp.roll(a, dy, axis=1), dx, axis=2)
    n0a, n0b = sh(mag, 0, 1), sh(mag, 0, -1)      # horizontal
    n1a, n1b = sh(mag, 1, 1), sh(mag, -1, -1)     # diag /
    n2a, n2b = sh(mag, 1, 0), sh(mag, -1, 0)      # vertical
    n3a, n3b = sh(mag, 1, -1), sh(mag, -1, 1)     # diag \
    na = jnp.select([q == 0, q == 1, q == 2, q == 3], [n0a, n1a, n2a, n3a])
    nb = jnp.select([q == 0, q == 1, q == 2, q == 3], [n0b, n1b, n2b, n3b])
    keep = (mag >= na) & (mag >= nb)
    mag = jnp.where(keep, mag, 0.0)

    strong = mag >= high_threshold
    weak = mag >= low_threshold
    # one-hop hysteresis: weak pixels survive when an 8-neighbor is strong
    strong_f = strong.astype(jnp.float32)
    neighbor = jnp.zeros_like(strong_f)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            neighbor = neighbor + sh(strong_f, dy, dx)
    edges = strong | (weak & (neighbor > 0))
    return jnp.broadcast_to(edges[..., None].astype(jnp.float32), (*edges.shape, 3))
