"""CLIP-embedding noise augmentation for unCLIP (SD2.1-unclip) checkpoints.

Capability match for the reference's unCLIP conditioning path
(reference: comfy/ldm/modules/encoders/noise_aug_modules.py
CLIPEmbeddingNoiseAugmentation, comfy/ldm/modules/diffusionmodules/upscaling.py
AbstractLowScaleModel.q_sample, comfy/model_base.py:271-295 unclip_adm +
SD21UNCLIP.encode_adm): the CLIP-vision image embedding is diffused forward to
a chosen noise level with the squaredcos_cap_v2 schedule, and the ADM vector
fed to the UNet's label_emb is ``concat([noised_embed, timestep_emb(level)])``.

The reference's CLIPEmbeddingNoiseAugmentation normalizes by CLIP data stats
only when a clip_stats_path is configured; the shipped SD21UnclipL/H configs
(comfy/supported_models.py:91-115) configure none, so scale/unscale are
identity here too — exact parity with the deployed models.

TPU-first notes: the whole augmentation is a handful of (B, D) elementwise ops
and one gather over the 1000-entry schedule table — it traces into the caller's
jit and fuses; no module/state object is needed, just the alphas_cumprod
constant.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import timestep_embedding


def betas_squaredcos_cap_v2(timesteps: int = 1000, max_beta: float = 0.999) -> np.ndarray:
    """The squaredcos_cap_v2 beta schedule (ldm util make_beta_schedule):
    beta_t = min(1 - alpha_bar((t+1)/T) / alpha_bar(t/T), max_beta) with
    alpha_bar(u) = cos^2((u + 0.008) / 1.008 * pi/2)."""

    def alpha_bar(u: float) -> float:
        return float(np.cos((u + 0.008) / 1.008 * np.pi / 2) ** 2)

    betas = [
        min(1.0 - alpha_bar((i + 1) / timesteps) / alpha_bar(i / timesteps), max_beta)
        for i in range(timesteps)
    ]
    return np.asarray(betas, np.float64)


def betas_linear(
    timesteps: int = 1000, linear_start: float = 1e-4, linear_end: float = 2e-2
) -> np.ndarray:
    """The ldm "linear" schedule (sqrt-space linspace, make_beta_schedule)."""
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, timesteps, dtype=np.float64)
        ** 2
    )


@dataclasses.dataclass(frozen=True)
class NoiseAugmentor:
    """q_sample over an embedding vector + a timestep embedding of the level.

    ``timestep_dim`` is the embedding width D (768 for SD21UnclipL, 1024 for
    SD21UnclipH); the resulting ADM vector is 2*D wide. ``schedule`` picks the
    beta schedule: "squaredcos_cap_v2" (unCLIP) or "linear" (SD_X4Upscaler's
    ImageConcatWithNoiseAugmentation, model_base.py:452: linear_start 1e-4,
    linear_end 2e-2, max_noise_level 350 over a 1000-step table).
    """

    timestep_dim: int
    max_noise_level: int = 1000
    schedule: str = "squaredcos_cap_v2"
    num_timesteps: int = 1000
    linear_start: float = 1e-4
    linear_end: float = 2e-2

    def _alphas_cumprod(self) -> np.ndarray:
        if self.schedule == "linear":
            betas = betas_linear(self.num_timesteps, self.linear_start, self.linear_end)
        else:
            betas = betas_squaredcos_cap_v2(self.num_timesteps)
        return np.cumprod(1.0 - betas)

    @property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(self._alphas_cumprod()).astype(np.float32)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 - self._alphas_cumprod()).astype(np.float32)

    def q_sample(self, x: jax.Array, noise_level: int, key: jax.Array) -> jax.Array:
        """Forward-diffuse ``x`` (any shape) to ``noise_level``
        (upscaling.py:44-52): z = sqrt(ac[t]) x + sqrt(1-ac[t]) noise."""
        t = int(np.clip(noise_level, 0, self.num_timesteps - 1))
        a = float(self.sqrt_alphas_cumprod[t])
        s = float(self.sqrt_one_minus_alphas_cumprod[t])
        return a * x + s * jax.random.normal(key, x.shape, x.dtype)

    def augment(
        self, embed: jax.Array, noise_level: int, key: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """(B, D) embed -> (noised (B, D), level timestep-embedding (B, D)).

        Mirrors CLIPEmbeddingNoiseAugmentation.forward with identity data
        stats: z = sqrt(ac[t]) * x + sqrt(1 - ac[t]) * noise.
        """
        embed = jnp.asarray(embed, jnp.float32)
        if embed.ndim == 1:
            embed = embed[None]
        t = int(np.clip(noise_level, 0, self.max_noise_level - 1))
        z = self.q_sample(embed, t, key)
        lvl = jnp.full((embed.shape[0],), float(t), jnp.float32)
        emb = timestep_embedding(lvl, self.timestep_dim)
        return z, emb


def unclip_adm(
    entries: List[dict],
    augmentor: NoiseAugmentor,
    key: jax.Array,
    noise_augment_merge: float = 0.05,
) -> Optional[jax.Array]:
    """Fold unCLIPConditioning entries into the (1, 2*D) ADM vector.

    Mirrors comfy/model_base.py unclip_adm: each entry's image embeds are
    noise-augmented at round((max-1) * noise_augmentation), weighted by
    ``strength`` and summed; with more than one entry the merged embedding is
    re-augmented at ``noise_augment_merge``. entries: [{"embeds": (B, D) or
    (D,), "strength": float, "noise_augmentation": float}, ...].
    """
    if not entries:
        return None
    adm_rows = []
    count = 0
    for i, e in enumerate(entries):
        embeds = jnp.asarray(e["embeds"], jnp.float32)
        if embeds.ndim == 1:
            embeds = embeds[None]
        strength = float(e.get("strength", 1.0))
        aug = float(e.get("noise_augmentation", 0.0))
        level = int(round((augmentor.max_noise_level - 1) * aug))
        for row in range(embeds.shape[0]):
            z, lvl_emb = augmentor.augment(
                embeds[row : row + 1], level, jax.random.fold_in(key, count)
            )
            adm_rows.append(jnp.concatenate([z, lvl_emb], axis=1) * strength)
            count += 1
    if count > 1:
        merged = jnp.stack(adm_rows).sum(0)
        level = int(round((augmentor.max_noise_level - 1) * noise_augment_merge))
        z, lvl_emb = augmentor.augment(
            merged[:, : augmentor.timestep_dim], level, jax.random.fold_in(key, 10_000)
        )
        return jnp.concatenate([z, lvl_emb], axis=1)
    return adm_rows[0]
