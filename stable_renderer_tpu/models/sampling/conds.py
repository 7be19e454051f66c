"""General conditioning semantics: per-cond area / mask / timestep-range.

Capability match for the reference's cond batching
(reference: comfy/samplers.py:50-327 — get_area_and_mult :50-135 (area crop,
mask mult, strength, 8px feather, timestep_start/end gating) and
calc_cond_uncond_batch :175-327 (batched model calls, out_cond/out_count
mask-weighted accumulation with 1e-37 epsilon, division at the end)).

TPU-native shape: all full-frame conds + the uncond run as ONE batched UNet
call (MXU-friendly); each area-cropped cond runs as its own (statically shaped)
call on the cropped latent. Timestep-range gating cannot drop a model call from
a compiled graph, so inactive conds still execute but contribute zero weight —
identical math, slightly more compute (documented deviation).

Blending happens in model-output space and converts to x0 once; for eps/v/lcm
predictions that is affine-equivalent to the reference's blend-in-denoised-space.

Correspondence attention hooks apply to the full-frame positive conds
(vmapped per cond group, as in scene_cond.py); area-cropped conds bypass hooks
(their token grids don't align with the frame's vertex correspondence).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.sampling.cfg import (
    calculate_denoised,
    timestep_from_sigma,
)
from stable_renderer_tpu.models.unet import AttnHooks, UNetModel


@dataclass(frozen=True)
class CondSpec:
    """Static (hashable) metadata of one conditioning entry.

    area: (h, w, y, x) in latent units, or None for full-frame.
    sigma_start/sigma_end: active while sigma_end <= sigma <= sigma_start
    (comfy timestep_start/end semantics, samplers.py:60-67).
    """

    area: Optional[Tuple[int, int, int, int]] = None
    strength: float = 1.0
    mask_strength: float = 1.0
    sigma_start: float = float("inf")
    sigma_end: float = 0.0
    has_mask: bool = False


def _feather_mult(area: Tuple[int, int, int, int], h_in: int, w_in: int) -> np.ndarray:
    """8-pixel edge feathering for maskless area conds (samplers.py:89-102)."""
    ah, aw, ay, ax = area
    rr = 8
    mult = np.ones((ah, aw), np.float32)
    if ay != 0:
        for t in range(rr):
            if t < ah:
                mult[t, :] *= (t + 1) / rr
    if ay + ah < h_in:
        for t in range(rr):
            if ah - 1 - t >= 0:
                mult[ah - 1 - t, :] *= (t + 1) / rr
    if ax != 0:
        for t in range(rr):
            if t < aw:
                mult[:, t] *= (t + 1) / rr
    if ax + aw < w_in:
        for t in range(rr):
            if aw - 1 - t >= 0:
                mult[:, aw - 1 - t] *= (t + 1) / rr
    return mult


def _pad_context(ctx: jax.Array, target_len: int) -> jax.Array:
    """Tile a (B, L, D) context to target_len tokens (CONDCrossAttn.concat
    pads mismatched conds by self-repetition, comfy/conds.py)."""
    if ctx.shape[1] == target_len:
        return ctx
    reps = -(-target_len // ctx.shape[1])
    return jnp.tile(ctx, (1, reps, 1))[:, :target_len]


def make_cond_denoiser(
    unet: UNetModel,
    params: dict,
    contexts: List[jax.Array],          # per cond: (B, L_i, D)
    specs: List[CondSpec],              # aligned static metadata
    masks: List[Optional[jax.Array]],   # per cond: (B, h, w) latent-res or None
    uncond_context: Optional[jax.Array],
    log_sigmas: jax.Array,
    cfg_scale: float = 7.0,
    prediction: str = "eps",
    hooks: AttnHooks = AttnHooks(),
    control_fn: Optional[Callable] = None,
    y_cond: Optional[jax.Array] = None,     # (B, adm) SDXL ADM conditioning
    y_uncond: Optional[jax.Array] = None,
    concat_latent: Optional[jax.Array] = None,  # (B, h, w, E) inpaint-model
    # c_concat channels (comfy model_base.py:93-126); area crops slice it
) -> Callable:
    """(x, sigma) -> denoised with the full comfy cond-list semantics."""
    assert len(contexts) == len(specs) == len(masks) and contexts
    use_cfg = uncond_context is not None
    from stable_renderer_tpu.models.sampling.cfg import _params_dtype

    compute_dtype = _params_dtype(params)
    max_len = max(c.shape[1] for c in contexts)
    if use_cfg:
        max_len = max(max_len, uncond_context.shape[1])
    contexts = [_pad_context(c, max_len) for c in contexts]
    if use_cfg:
        uncond_context = _pad_context(uncond_context, max_len)

    full_idx = [i for i, s in enumerate(specs) if s.area is None]
    crop_idx = [i for i, s in enumerate(specs) if s.area is not None]
    nf = len(full_idx)

    def wrap_hooks(user: AttnHooks, batch: int, n_groups: int) -> AttnHooks:
        """Per-cond-group hook application on the full-frame batch
        [cond_0 x B ... cond_{nf-1} x B, uncond x B] (scene_cond.py layout)."""
        passthru = dict(pre_all=user.pre_all, pre_cross=user.pre_cross,
                        attn_all=user.attn_all, out_block=user.out_block,
                        in_block=user.in_block,
                        in_block_after=user.in_block_after)
        if user.pre is None and user.post is None:
            return AttnHooks(**passthru)

        def pre(q, k, v, layer):
            if user.pre is None:
                return q, k, v
            qc = q[: n_groups * batch].reshape(n_groups, batch, *q.shape[1:])
            kc = k[: n_groups * batch].reshape(n_groups, batch, *k.shape[1:])
            vc = v[: n_groups * batch].reshape(n_groups, batch, *v.shape[1:])
            qo, ko, vo = jax.vmap(lambda a, c, d: user.pre(a, c, d, layer))(qc, kc, vc)
            qo = qo.reshape(n_groups * batch, *qo.shape[2:])
            ko = ko.reshape(n_groups * batch, *ko.shape[2:])
            vo = vo.reshape(n_groups * batch, *vo.shape[2:])
            if not use_cfg:
                return qo, ko, vo
            kn, vn = k[n_groups * batch:], v[n_groups * batch:]
            if ko.shape[1] != kn.shape[1]:
                reps = -(-ko.shape[1] // kn.shape[1])
                kn = jnp.tile(kn, (1, reps, 1))[:, : ko.shape[1]]
                vn = jnp.tile(vn, (1, reps, 1))[:, : vo.shape[1]]
            return (
                jnp.concatenate([qo, q[n_groups * batch:]], 0),
                jnp.concatenate([ko, kn], 0),
                jnp.concatenate([vo, vn], 0),
            )

        def post(vals, layer):
            if user.post is None:
                return vals
            cond = vals[: n_groups * batch].reshape(n_groups, batch, *vals.shape[1:])
            out = jax.vmap(lambda g: user.post(g, layer))(cond)
            out = out.reshape(n_groups * batch, *out.shape[2:])
            if not use_cfg:
                return out
            return jnp.concatenate([out, vals[n_groups * batch:]], 0)

        return AttnHooks(pre=pre, post=post, **passthru)

    def denoise(x: jax.Array, sigma: jax.Array) -> jax.Array:
        b, h, w, c_lat = x.shape
        t = timestep_from_sigma(log_sigmas, sigma)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        x_in = (x * c_in).astype(compute_dtype)

        def active(spec: CondSpec) -> jax.Array:
            ok = jnp.logical_and(sigma <= spec.sigma_start, sigma >= spec.sigma_end)
            return ok.astype(jnp.float32)

        def mult_for(i: int, ah: int, aw: int) -> jax.Array:
            spec = specs[i]
            area = spec.area or (h, w, 0, 0)
            if masks[i] is not None:
                m = masks[i][:, area[2]:area[2] + ah, area[3]:area[3] + aw]
                m = m * spec.mask_strength
            else:
                m = jnp.asarray(_feather_mult((ah, aw, area[2], area[3]), h, w))[None]
                m = jnp.broadcast_to(m, (b, ah, aw))
            return (m * spec.strength * active(spec))[..., None]  # (B, ah, aw, 1)

        out_cond = jnp.zeros_like(x, dtype=jnp.float32)
        out_count = jnp.full_like(x, 1e-37, dtype=jnp.float32)

        # --- full-frame conds + uncond: one batched call -----------------------
        parts = [x_in] * (nf + (1 if use_cfg else 0))
        ctxs = [contexts[i] for i in full_idx] + ([uncond_context] if use_cfg else [])
        x_b = jnp.concatenate(parts, axis=0)
        ctx_b = jnp.concatenate(ctxs, axis=0).astype(compute_dtype)
        tb = jnp.broadcast_to(t, (x_b.shape[0],))
        control = control_fn(x_b, tb, ctx_b) if control_fn is not None else None
        xc_b = x_b
        if concat_latent is not None:
            extra = concat_latent.astype(compute_dtype)
            xc_b = jnp.concatenate(
                [x_b, jnp.concatenate([extra] * len(parts), axis=0)], axis=-1)
        y_b = None
        if y_cond is not None:
            ys = [y_cond] * nf + ([y_uncond if y_uncond is not None else y_cond]
                                  if use_cfg else [])
            y_b = jnp.concatenate(ys, axis=0)
        out = unet.apply(
            params, xc_b, tb, ctx_b, control=control,
            hooks=wrap_hooks(hooks, b, nf), y=y_b,
        ).astype(jnp.float32)
        for gi, i in enumerate(full_idx):
            mult = mult_for(i, h, w)
            out_cond = out_cond + out[gi * b:(gi + 1) * b] * mult
            out_count = out_count + mult
        uncond_out = out[nf * b:] if use_cfg else None

        # --- area-cropped conds: one statically-shaped call each ---------------
        for i in crop_idx:
            ah, aw, ay, ax_ = specs[i].area
            x_crop = x_in[:, ay:ay + ah, ax_:ax_ + aw]
            tb1 = jnp.broadcast_to(t, (b,))
            ctx_i = contexts[i].astype(compute_dtype)
            control_i = control_fn(x_crop, tb1, ctx_i) if control_fn is not None else None
            xc_crop = x_crop
            if concat_latent is not None:
                xc_crop = jnp.concatenate(
                    [x_crop, concat_latent[:, ay:ay + ah, ax_:ax_ + aw].astype(compute_dtype)],
                    axis=-1)
            o = unet.apply(params, xc_crop, tb1, ctx_i, control=control_i,
                           y=y_cond).astype(jnp.float32)
            mult = mult_for(i, ah, aw)
            out_cond = out_cond.at[:, ay:ay + ah, ax_:ax_ + aw].add(o * mult)
            out_count = out_count.at[:, ay:ay + ah, ax_:ax_ + aw].add(mult)

        blended = out_cond / out_count
        x32 = x.astype(jnp.float32)
        den_c = calculate_denoised(prediction, x32, blended, sigma, t)
        if not use_cfg:
            return den_c
        den_u = calculate_denoised(prediction, x32, uncond_out, sigma, t)
        return den_u + (den_c - den_u) * cfg_scale

    return denoise
