"""Per-sprite masked text conditioning — SceneTextEncode / MaskedTextEncode.

Capability match for the reference's scene conditioning nodes
(reference: comfyUI/stable_rendering/_nodes/conditions.py:52-110 SceneTextEncode —
per-sprite masked conditioning from the ID map + an environment prompt for the
background — and comfy's mask-conditioning blend in calc_cond_uncond_batch,
comfy/samplers.py:175-327).

Semantics: each sprite's prompt conditions only the latent pixels whose ID-map
spriteID matches; the env prompt conditions the background. The denoiser runs all
S+1 conditionings (+ 1 uncond) as ONE batched UNet call and blends the eps
predictions by normalized masks — the reference's area/mask conditioning made
static-shape.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.sampling.cfg import (
    calculate_denoised,
    timestep_from_sigma,
)
from stable_renderer_tpu.models.unet import AttnHooks, UNetModel


def sprite_masks(
    id_maps: jax.Array,  # (B, H, W, 4) int32
    sprite_ids: Sequence[int],
    latent_h: int,
    latent_w: int,
) -> jax.Array:
    """(S+1, B, h, w) masks: one per sprite + background last, at latent res.

    Matches SceneTextEncode's mask derivation: sprite mask = pixels whose
    spriteID matches; background = everything else.
    """
    b, ih, iw, _ = id_maps.shape
    rows = (jnp.arange(latent_h) * ih // latent_h).astype(jnp.int32)
    cols = (jnp.arange(latent_w) * iw // latent_w).astype(jnp.int32)
    small = id_maps[:, rows][:, :, cols]  # (B, h, w, 4)
    masks = [
        (small[..., 0] == sid).astype(jnp.float32) for sid in sprite_ids
    ]
    any_sprite = jnp.zeros((b, latent_h, latent_w))
    for m in masks:
        any_sprite = jnp.maximum(any_sprite, m)
    masks.append(1.0 - any_sprite)  # background/env
    return jnp.stack(masks)


def make_scene_denoiser(
    unet: UNetModel,
    params: dict,
    contexts: jax.Array,        # (S+1, B, L, D) per-sprite + env contexts
    masks: jax.Array,           # (S+1, B, h, w)
    uncond_context: Optional[jax.Array],  # (B, L, D)
    log_sigmas: jax.Array,
    cfg_scale: float = 7.0,
    prediction: str = "eps",
    hooks: AttnHooks = AttnHooks(),
    control_fn: Optional[Callable] = None,
    y_cond: Optional[jax.Array] = None,     # (B, adm) SDXL ADM conditioning
    y_uncond: Optional[jax.Array] = None,
    concat_latent: Optional[jax.Array] = None,  # (B, h, w, E) inpaint-model
    # c_concat channels (comfy model_base.py:93-126), same per cond group
) -> Callable:
    """(x, sigma) -> denoised with mask-blended multi-conditioning.

    Batch layout through the UNet: [cond_0 .. cond_S, uncond] x B frames —
    the direct analogue of calc_cond_uncond_batch's cond batching.
    """
    s1, b = contexts.shape[0], contexts.shape[1]
    use_cfg = uncond_context is not None
    from stable_renderer_tpu.models.sampling.cfg import _params_dtype

    compute_dtype = _params_dtype(params)

    # normalize masks so every latent pixel's blend weights sum to 1
    weights = masks / jnp.maximum(jnp.sum(masks, axis=0, keepdims=True), 1e-6)

    def wrap_hooks(user: AttnHooks) -> AttnHooks:
        """Apply the correspondence hooks per conditioning group (frames axis),
        never across groups or onto the uncond rows — the batch layout is
        [cond_0 x B, ..., cond_S x B, uncond x B]."""
        passthru = dict(pre_all=user.pre_all, pre_cross=user.pre_cross,
                        attn_all=user.attn_all, out_block=user.out_block,
                        in_block=user.in_block,
                        in_block_after=user.in_block_after)
        if (user.pre is None and user.post is None and user.attn is None
                and user.mid is None):
            return AttnHooks(**passthru)

        def pre(q, k, v, layer):
            if user.pre is None:
                return q, k, v
            qc = q[: s1 * b].reshape(s1, b, *q.shape[1:])
            kc = k[: s1 * b].reshape(s1, b, *k.shape[1:])
            vc = v[: s1 * b].reshape(s1, b, *v.shape[1:])
            qo, ko, vo = jax.vmap(lambda a, c, d: user.pre(a, c, d, layer))(qc, kc, vc)
            qo = qo.reshape(s1 * b, *qo.shape[2:])
            ko = ko.reshape(s1 * b, *ko.shape[2:])
            vo = vo.reshape(s1 * b, *vo.shape[2:])
            if not use_cfg:
                return qo, ko, vo
            kn, vn = k[s1 * b :], v[s1 * b :]
            if ko.shape[1] != kn.shape[1]:
                reps = -(-ko.shape[1] // kn.shape[1])
                kn = jnp.tile(kn, (1, reps, 1))[:, : ko.shape[1]]
                vn = jnp.tile(vn, (1, reps, 1))[:, : vo.shape[1]]
            return (
                jnp.concatenate([qo, q[s1 * b :]], 0),
                jnp.concatenate([ko, kn], 0),
                jnp.concatenate([vo, vn], 0),
            )

        def post(vals, layer):
            if user.post is None:
                return vals
            cond = vals[: s1 * b].reshape(s1, b, *vals.shape[1:])
            out = jax.vmap(lambda g: user.post(g, layer))(cond)
            out = out.reshape(s1 * b, *out.shape[2:])
            if not use_cfg:
                return out
            return jnp.concatenate([out, vals[s1 * b :]], 0)

        attn = None
        if user.attn is not None:
            from stable_renderer_tpu.models.layers import attention as _default_attn

            def attn(q, k, v, heads, layer):
                # apply the replaced (cross-frame) attention per conditioning
                # group (frames axis); uncond rows keep plain attention.
                # static python loop: ring shard_map composes per group.
                outs = [
                    user.attn(
                        q[g * b : (g + 1) * b], k[g * b : (g + 1) * b],
                        v[g * b : (g + 1) * b], heads, layer,
                    )
                    for g in range(s1)
                ]
                if use_cfg:
                    outs.append(_default_attn(q[s1 * b :], k[s1 * b :], v[s1 * b :], heads))
                return jnp.concatenate(outs, 0)

        mid = None
        if user.mid is not None:

            def mid(x, layer):
                outs = [user.mid(x[g * b : (g + 1) * b], layer) for g in range(s1)]
                if use_cfg:
                    outs.append(x[s1 * b :])
                return jnp.concatenate(outs, 0)

        return AttnHooks(pre=pre, post=post, attn=attn, mid=mid, **passthru)

    def denoise(x: jax.Array, sigma: jax.Array) -> jax.Array:
        t = timestep_from_sigma(log_sigmas, sigma)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        x_in = (x * c_in).astype(compute_dtype)
        x_tiled = jnp.concatenate([x_in] * (s1 + (1 if use_cfg else 0)), axis=0)
        ctx_flat = contexts.reshape(s1 * b, *contexts.shape[2:])
        if use_cfg:
            ctx_flat = jnp.concatenate([ctx_flat, uncond_context], axis=0)
        ctx_flat = ctx_flat.astype(compute_dtype)
        tb = jnp.broadcast_to(t, (x_tiled.shape[0],))
        y = None
        if y_cond is not None:
            y = jnp.concatenate([y_cond] * s1, axis=0)
            if use_cfg:
                yu = y_uncond if y_uncond is not None else y_cond
                y = jnp.concatenate([y, yu], axis=0)
        control = control_fn(x_tiled, tb, ctx_flat) if control_fn is not None else None
        xc = x_tiled
        if concat_latent is not None:
            extra = concat_latent.astype(compute_dtype)
            extra_b = jnp.concatenate([extra] * (s1 + (1 if use_cfg else 0)), axis=0)
            xc = jnp.concatenate([x_tiled, extra_b], axis=-1)
        out = unet.apply(
            params, xc, tb, ctx_flat, control=control, hooks=wrap_hooks(hooks), y=y
        ).astype(jnp.float32)
        cond_out = out[: s1 * b].reshape(s1, b, *out.shape[1:])
        # mask-weighted blend of the S+1 model outputs
        blended = jnp.sum(cond_out * weights[..., None], axis=0)
        x32 = x.astype(jnp.float32)
        den_c = calculate_denoised(prediction, x32, blended, sigma, t)
        if not use_cfg:
            return den_c
        den_u = calculate_denoised(prediction, x32, out[s1 * b :], sigma, t)
        return den_u + (den_c - den_u) * cfg_scale

    return denoise
