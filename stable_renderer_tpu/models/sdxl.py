"""SDXL conditioning helpers.

Capability match for the reference's SDXL support (reference:
comfy/supported_models.py SDXL + comfy/model_base.py SDXL.encode_adm): the ADM
vector concatenates the pooled CLIP-G embedding with Fourier embeddings of
(original size, crop, target size) — 1280 + 6*256 = 2816 channels, matching
UNetConfig.adm_in_channels of SDXL base.

Pipeline integration (dual-CLIP encode + y threading through the denoiser) lands
with full SDXL weights support; the components (SDXL_UNET_CONFIG, SDXLClip,
this ADM builder) are in place.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import timestep_embedding


def sdxl_adm_vector(
    pooled: jax.Array,  # (B, 1280) CLIP-G pooled embedding
    original_size: Tuple[int, int] = (1024, 1024),
    crop: Tuple[int, int] = (0, 0),
    target_size: Tuple[int, int] = (1024, 1024),
) -> jax.Array:
    """(B, 2816) ADM conditioning (model_base.py SDXL.encode_adm semantics:
    fourier_features of [h, w, crop_h, crop_w, target_h, target_w], 256 dims
    each, concatenated after the pooled text embedding)."""
    b = pooled.shape[0]
    vals = jnp.asarray(
        [original_size[0], original_size[1], crop[0], crop[1], target_size[0], target_size[1]],
        jnp.float32,
    )
    emb = timestep_embedding(vals, 256)  # (6, 256)
    emb = jnp.broadcast_to(emb.reshape(1, -1), (b, 6 * 256))
    return jnp.concatenate([pooled.astype(jnp.float32), emb], axis=-1)


def sdxl_refiner_adm_vector(
    pooled: jax.Array,  # (B, 1280) CLIP-G pooled embedding
    original_size: Tuple[int, int] = (1024, 1024),
    crop: Tuple[int, int] = (0, 0),
    aesthetic_score: float = 6.0,
) -> jax.Array:
    """(B, 2560) refiner ADM (model_base.py:319-344 SDXLRefiner.encode_adm):
    Fourier embeddings of [h, w, crop_h, crop_w, aesthetic_score] after the
    pooled embedding. The reference defaults the score to 6.0 for positive and
    2.5 for negative conds (nodes_clip_sdxl.py)."""
    b = pooled.shape[0]
    vals = jnp.asarray(
        [original_size[0], original_size[1], crop[0], crop[1], aesthetic_score],
        jnp.float32,
    )
    emb = timestep_embedding(vals, 256)  # (5, 256)
    emb = jnp.broadcast_to(emb.reshape(1, -1), (b, 5 * 256))
    return jnp.concatenate([pooled.astype(jnp.float32), emb], axis=-1)
