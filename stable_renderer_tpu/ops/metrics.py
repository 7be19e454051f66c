"""Temporal-consistency and image-quality metrics.

BASELINE.md metric #2 is temporal flicker between consecutive frames. The
reference ships no metric harness at all (SURVEY.md section 5); this module
provides:

  * ``temporal_flicker_l1`` / ``temporal_flicker_ssim`` — consecutive-frame
    distance (the usual LPIPS-style proxy, weight-free and jittable).
  * ``vertex_flicker`` — correspondence-aware flicker: the mean per-3D-vertex
    color variance across frames, computed from the ID maps. This measures
    exactly what the Corresponder machinery is supposed to minimize (the same
    pixel on the object changing color between frames) and is independent of
    camera motion — stricter and more meaningful than frame-difference proxies.
  * ``ssim`` — standard SSIM for image-pair quality.

LPIPS proper requires pretrained VGG features (unavailable offline); when
parity-vs-reference runs are needed, plug frames into any external LPIPS — these
metrics cover in-repo regression tracking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from stable_renderer_tpu.ops.correspondence import latent_vertex_ids
from stable_renderer_tpu.ops.math import group_average_by_id


def temporal_flicker_l1(frames: jax.Array) -> jax.Array:
    """Mean |frame_t - frame_{t-1}| over the sequence. frames: (N, H, W, C)."""
    return jnp.mean(jnp.abs(frames[1:] - frames[:-1]))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-0.5 * (ax / sigma) ** 2)
    w = jnp.outer(g, g)
    return w / w.sum()


def ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Mean SSIM between (H, W, C) or (N, H, W, C) images (standard constants)."""
    if a.ndim == 3:
        a, b = a[None], b[None]
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    win = _gaussian_window()[None, None]  # (1, 1, 11, 11) OIHW

    def filt(x):
        # depthwise gaussian via per-channel conv
        n, h, w, c = x.shape
        xc = x.transpose(0, 3, 1, 2).reshape(n * c, 1, h, w)
        out = jax.lax.conv_general_dilated(
            xc, win, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        oh, ow = out.shape[2], out.shape[3]
        return out.reshape(n, c, oh, ow).transpose(0, 2, 3, 1)

    mu_a, mu_b = filt(a), filt(b)
    sa = filt(a * a) - mu_a**2
    sb = filt(b * b) - mu_b**2
    sab = filt(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * sab + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (sa + sb + c2)
    return jnp.mean(num / den)


def temporal_flicker_ssim(frames: jax.Array) -> jax.Array:
    """1 - mean SSIM of consecutive frame pairs (0 = perfectly stable)."""
    vals = jax.vmap(ssim)(frames[:-1], frames[1:])
    return 1.0 - jnp.mean(vals)


@partial(jax.jit, static_argnames=("num_segments",))
def vertex_flicker(
    frames: jax.Array,    # (N, H, W, C) rendered frames
    id_maps: jax.Array,   # (N, H, W, 4) int32
    num_segments: int = 262144,
) -> jax.Array:
    """Correspondence-aware flicker: RMS deviation of each pixel's color from
    its 3D vertex's mean color across all frames, averaged over AI pixels.

    0 = every vertex keeps one color in every frame it appears in.
    """
    n, h, w, c = frames.shape
    vids, valid = latent_vertex_ids(id_maps, h, w)
    flat = frames.reshape(-1, c)
    per_row_mean, _ = group_average_by_id(
        flat, vids.reshape(-1), num_segments, valid=valid.reshape(-1)
    )
    sq = jnp.sum((flat - per_row_mean) ** 2, axis=-1)
    mask = valid.reshape(-1).astype(jnp.float32)
    mse = jnp.sum(sq * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sqrt(mse)
