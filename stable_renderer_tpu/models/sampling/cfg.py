"""CFG denoiser assembly: raw UNet -> (x, sigma) -> denoised, with hooks.

Capability match for the reference's CFG path
(reference: comfy/samplers.py:175-358 calc_cond_uncond_batch + sampling_function +
CFGNoisePredictor, comfy/model_base.py:93-126 BaseModel.apply_model input/output
scaling, comfy/model_sampling.py calculate_input/calculate_denoised + LCM).

The cond and uncond passes are batched into ONE UNet call (batch axis
[positive..., negative...]) exactly like calc_cond_uncond_batch — which also makes
the positive-rows-only slicing of post_atten_inject (attention.py:596-599)
expressible as a static slice inside the traced hook wrapper.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.unet import AttnHooks, UNetModel


def timestep_from_sigma(log_sigmas: jax.Array, sigma: jax.Array) -> jax.Array:
    """Jittable ModelSamplingDiscrete.timestep (log-sigma interpolation)."""
    log_sigma = jnp.log(jnp.maximum(sigma, 1e-10))
    dists = log_sigma - log_sigmas
    low_idx = jnp.clip(
        jnp.argmax(jnp.cumsum((dists >= 0).astype(jnp.int32))), 0, log_sigmas.shape[0] - 2
    )
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = jnp.clip((low - log_sigma) / (low - high), 0.0, 1.0)
    return (1.0 - w) * low_idx + w * high_idx


def calculate_denoised(
    prediction: str,
    x: jax.Array,
    model_out: jax.Array,
    sigma: jax.Array,
    timestep: jax.Array,
    sigma_data: float = 0.5,
    timestep_scaling: float = 10.0,
) -> jax.Array:
    """model output -> x0 (ModelSamplingDiscrete/V/LCM.calculate_denoised)."""
    if prediction == "eps":
        return x - model_out * sigma
    if prediction == "v":
        c_skip = 1.0 / (sigma**2 + 1.0)
        c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
        return c_skip * x + c_out * model_out
    if prediction == "lcm":
        x0 = x - model_out * sigma
        scaled_t = timestep * timestep_scaling
        c_skip = sigma_data**2 / (scaled_t**2 + sigma_data**2)
        c_out = scaled_t / jnp.sqrt(scaled_t**2 + sigma_data**2)
        return c_out * x0 + c_skip * x
    raise ValueError(f"unknown prediction type {prediction}")


def make_denoiser(
    unet: UNetModel,
    params: dict,
    cond_context: jax.Array,           # (B, L, D) positive text conditioning
    uncond_context: Optional[jax.Array],  # (B, L, D) negative; None = no CFG
    log_sigmas: jax.Array,             # (1000,) from ModelSampling
    cfg_scale: float = 7.0,
    prediction: str = "eps",
    hooks: AttnHooks = AttnHooks(),
    control_fn: Optional[Callable] = None,  # (x_in, t, batched_context) -> control dict
    mask: Optional[jax.Array] = None,       # (B, h, w, 1) inpaint mask (1 = denoise)
    masked_latent: Optional[jax.Array] = None,
    y_cond: Optional[jax.Array] = None,     # (B, adm) SDXL ADM conditioning
    y_uncond: Optional[jax.Array] = None,
) -> Callable:
    """Build the (x, sigma) -> denoised closure for samplers.sample().

    CFG semantics: uncond + (cond - uncond) * cfg_scale (samplers.py:329-358).
    With uncond_context=None the model runs cond-only (cfg ignored), matching
    comfy's cfg=1 fast path.
    """

    use_cfg = uncond_context is not None

    def wrap_hooks(batch: int) -> AttnHooks:
        """Apply user hooks per reference slicing: pre on the full batch, post
        (and the attn replacement) on positive rows only (attention.py:565-599).
        mid (GLIGEN) also applies to positive rows only — the reference
        attaches gligen per-cond, and the uncond normally carries none
        (samplers.py gligen cond field)."""
        if (hooks.pre is None and hooks.post is None and hooks.attn is None
                and hooks.mid is None):
            return AttnHooks()

        def pre(q, k, v, layer):
            if hooks.pre is None:
                return q, k, v
            if not use_cfg:
                return hooks.pre(q, k, v, layer)
            qp, qn = q[:batch], q[batch:]
            kp, kn = k[:batch], k[batch:]
            vp, vn = v[:batch], v[batch:]
            qp, kp, vp = hooks.pre(qp, kp, vp, layer)
            # negative rows keep their own contexts; pad k/v lengths if the hook
            # changed them (broadcast-KV injection changes Lk for positives)
            if kp.shape[1] != kn.shape[1]:
                reps = -(-kp.shape[1] // kn.shape[1])
                kn = jnp.tile(kn, (1, reps, 1))[:, : kp.shape[1]]
                vn = jnp.tile(vn, (1, reps, 1))[:, : vp.shape[1]]
            return (
                jnp.concatenate([qp, qn], 0),
                jnp.concatenate([kp, kn], 0),
                jnp.concatenate([vp, vn], 0),
            )

        def post(vals, layer):
            if hooks.post is None:
                return vals
            if not use_cfg:
                return hooks.post(vals, layer)
            pos = hooks.post(vals[:batch], layer)
            return jnp.concatenate([pos, vals[batch:]], 0)

        attn = None
        if hooks.attn is not None:
            from stable_renderer_tpu.models.layers import attention as _default_attn

            def attn(q, k, v, heads, layer):
                if not use_cfg:
                    return hooks.attn(q, k, v, heads, layer)
                # positives get the replaced (cross-frame) attention; negatives
                # keep plain per-frame attention
                pos = hooks.attn(q[:batch], k[:batch], v[:batch], heads, layer)
                neg = _default_attn(q[batch:], k[batch:], v[batch:], heads)
                return jnp.concatenate([pos, neg], 0)

        mid = None
        if hooks.mid is not None:

            def mid(x, layer):
                if not use_cfg:
                    return hooks.mid(x, layer)
                pos = hooks.mid(x[:batch], layer)
                return jnp.concatenate([pos, x[batch:]], 0)

        return AttnHooks(pre=pre, post=post, attn=attn, mid=mid)

    # run UNet activations in the params' dtype (bf16 on TPU, fp32 stats inside)
    compute_dtype = params["time_embed"]["0"]["weight"].dtype

    def denoise(x: jax.Array, sigma: jax.Array) -> jax.Array:
        b = x.shape[0]
        t = timestep_from_sigma(log_sigmas, sigma)
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)  # eps-model input scaling
        x_in = (x * c_in).astype(compute_dtype)
        if use_cfg:
            x_b = jnp.concatenate([x_in, x_in], axis=0)
            ctx = jnp.concatenate([cond_context, uncond_context], axis=0)
        else:
            x_b, ctx = x_in, cond_context
        ctx = ctx.astype(compute_dtype)
        tb = jnp.broadcast_to(t, (x_b.shape[0],))
        y = None
        if y_cond is not None:
            # SDXL ADM rides the same cond/uncond batching (model_base.py SDXL)
            yu = y_uncond if y_uncond is not None else y_cond
            y = jnp.concatenate([y_cond, yu], axis=0) if use_cfg else y_cond
        control = control_fn(x_b, tb, ctx) if control_fn is not None else None
        out = unet.apply(
            params, x_b, tb, ctx, control=control, hooks=wrap_hooks(b), y=y
        ).astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        if use_cfg:
            cond_out, uncond_out = out[:b], out[b:]
            den_c = calculate_denoised(prediction, x32, cond_out, sigma, t)
            den_u = calculate_denoised(prediction, x32, uncond_out, sigma, t)
            denoised = den_u + (den_c - den_u) * cfg_scale
        else:
            denoised = calculate_denoised(prediction, x32, out, sigma, t)
        if mask is not None and masked_latent is not None:
            denoised = denoised * mask + masked_latent * (1.0 - mask)
        return denoised

    return denoise
