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
    """Jittable ModelSamplingDiscrete.timestep.

    NEAREST log-sigma table index (model_sampling.py:125-128
    ``dists.abs().argmin(dim=0)``) — the reference feeds INTEGER timesteps to
    the UNet; fractional interpolation here measurably shifts the timestep
    embedding vs the reference (caught by tests/test_torch_parity.py).
    """
    log_sigma = jnp.log(jnp.maximum(sigma, 1e-10))
    dists = jnp.abs(log_sigma[..., None] - log_sigmas)
    idx = jnp.argmin(dists, axis=-1).astype(jnp.float32)
    return idx.reshape(jnp.shape(sigma))


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
    if prediction == "x0":
        # the model directly outputs the denoised image
        # (comfy_extras/nodes_model_advanced.py X0.calculate_denoised)
        return model_out
    raise ValueError(f"unknown prediction type {prediction}")


def _params_dtype(params: dict):
    """Compute dtype of a model's param tree (UNet time_embed for the SD
    family; first floating leaf otherwise — cascade trees have no time_embed)."""
    te = params.get("time_embed") if isinstance(params, dict) else None
    if te is not None:
        return te["0"]["weight"].dtype
    for leaf in jax.tree_util.tree_leaves(params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.float32


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
    concat_latent: Optional[jax.Array] = None,  # (B, h, w, E) inpaint-model
    # c_concat channels (mask + masked-image latent) appended to the UNet input —
    # 9-channel inpaint checkpoints (comfy model_base.py:93-126 extra_conds)
    nocond_context: Optional[jax.Array] = None,  # PerpNeg empty conditioning: a
    # third batch group; CFG becomes the perpendicular-negative combine
    # (comfy_extras/nodes_perpneg.py cfg_function)
    perp_neg_scale: float = 1.0,
    sag: Optional[tuple] = None,  # (scale, blur_sigma, mid_layer_idx):
    # Self-Attention Guidance (comfy_extras/nodes_sag.py): capture the uncond
    # middle self-attention map, blur the attended regions of the uncond
    # prediction, and steer away from the degraded prediction (extra UNet eval)
    denoise_mask_fn: Optional[Callable] = None,  # (sigma, mask) -> mask:
    # per-step mask shaping (comfy_extras/nodes_differential_diffusion.py)
    t_fn: Optional[Callable] = None,  # sigma -> UNet timestep; None = discrete
    # log-sigma index interpolation. EDM models (SVD) pass 0.25*log(sigma)
    # (comfy model_sampling.py ModelSamplingContinuousEDM.timestep)
    rescale_cfg_multiplier: Optional[float] = None,  # RescaleCFG
    # (comfy_extras/nodes_model_advanced.py RescaleCFG): CFG combined in
    # v-prediction space, rescaled to the positive prediction's std
    model_extra_cond: Optional[dict] = None,   # extra named model inputs for
    # the positive rows (e.g. Stable Cascade Stage B's effnet prior,
    # model_base.py StableCascade_B.extra_conds); uncond rows take
    # model_extra_uncond or zeros
    model_extra_uncond: Optional[dict] = None,
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
        passthru = dict(pre_all=hooks.pre_all, pre_cross=hooks.pre_cross,
                        attn_all=hooks.attn_all, out_block=hooks.out_block,
                        in_block=hooks.in_block,
                        in_block_after=hooks.in_block_after)
        if (hooks.pre is None and hooks.post is None and hooks.attn is None
                and hooks.mid is None):
            return AttnHooks(**passthru)

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

        return AttnHooks(pre=pre, post=post, attn=attn, mid=mid, **passthru)

    # run UNet activations in the params' dtype (bf16 on TPU, fp32 stats inside)
    compute_dtype = _params_dtype(params)
    use_perp_neg = nocond_context is not None and use_cfg
    use_sag = sag is not None and use_cfg

    def denoise(x: jax.Array, sigma: jax.Array) -> jax.Array:
        b = x.shape[0]
        if getattr(sigma, "ndim", 0) == 1:
            # per-sample sigmas: the stream-pipelined frame batch holds frames
            # at DIFFERENT denoise stages (StreamDiffusion batching, SURVEY §7)
            t = (t_fn(sigma) if t_fn is not None
                 else jax.vmap(lambda s: timestep_from_sigma(log_sigmas, s))(sigma))
            sigma = sigma.reshape(b, 1, 1, 1)
            per_sample_t = t
            t = t.reshape(b, 1, 1, 1)  # for calculate_denoised broadcasting
        else:
            t = t_fn(sigma) if t_fn is not None else timestep_from_sigma(log_sigmas, sigma)
            per_sample_t = None
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)  # eps-model input scaling
        x_in = (x * c_in).astype(compute_dtype)
        groups = 1 + (1 if use_cfg else 0) + (1 if use_perp_neg else 0)
        if use_cfg:
            ctxs = [cond_context, uncond_context]
            if use_perp_neg:
                ctxs.append(jnp.broadcast_to(
                    nocond_context[:1] if nocond_context.shape[0] != b
                    else nocond_context, (b, *nocond_context.shape[1:])))
            x_b = jnp.concatenate([x_in] * groups, axis=0)
            ctx = jnp.concatenate(ctxs, axis=0)
        else:
            x_b, ctx = x_in, cond_context
        ctx = ctx.astype(compute_dtype)
        if per_sample_t is not None:
            tb = jnp.concatenate([per_sample_t] * groups)
        else:
            tb = jnp.broadcast_to(t, (x_b.shape[0],))
        y = yu = None
        if y_cond is not None:
            # SDXL ADM rides the same cond/uncond batching (model_base.py SDXL)
            yu = y_uncond if y_uncond is not None else y_cond
            y = (jnp.concatenate([y_cond] + [yu] * (groups - 1), axis=0)
                 if use_cfg else y_cond)
        # controls see the plain latent channels; the inpaint c_concat extras go
        # only into the UNet input (comfy computes control on input_x pre-concat,
        # samplers.py:277 vs model_base.py apply_model torch.cat)
        control = control_fn(x_b, tb, ctx) if control_fn is not None else None

        def with_concat(xb, reps):
            if concat_latent is None:
                return xb
            if isinstance(concat_latent, tuple):
                # per-cond c_concat: (cond, uncond) — SVD's negative uses a
                # zeroed image latent (nodes_video_model.py SVD_img2vid_
                # Conditioning negative)
                cc, cu = concat_latent
                cu = cc if cu is None else cu
                parts = [cc] + [cu] * (reps - 1)
                extra_b = jnp.concatenate(
                    [p.astype(compute_dtype) for p in parts], axis=0)
            else:
                extra = concat_latent.astype(compute_dtype)
                extra_b = jnp.concatenate([extra] * reps, axis=0)
            return jnp.concatenate([xb, extra_b], axis=-1)

        run_hooks = wrap_hooks(b)
        sag_sim: list = []
        if use_sag:
            # capture the uncond rows' self-attention probabilities at the
            # middle transformer layer (nodes_sag.py attn_and_record)
            from stable_renderer_tpu.models.layers import attention as _attn_dflt

            sag_layer = sag[2]
            orig_attn_all = run_hooks.attn_all

            def sag_attn_all(q, k, v, heads, layer):
                out_a = (orig_attn_all(q, k, v, heads, layer)
                         if orig_attn_all is not None
                         else _attn_dflt(q, k, v, heads))
                if layer == sag_layer:
                    d = q.shape[-1] // heads
                    qu = q[b:2 * b].reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
                    ku = k[b:2 * b].reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
                    logits = jnp.einsum(
                        "bhqd,bhkd->bhqk", qu.astype(jnp.float32),
                        ku.astype(jnp.float32)) / jnp.sqrt(float(d))
                    sag_sim.append(jax.nn.softmax(logits, axis=-1))
                return out_a

            if run_hooks.attn is None:  # attn (corresponder) takes precedence
                run_hooks = run_hooks._replace(attn_all=sag_attn_all)
        extra_kwargs = {}
        if model_extra_cond:
            for k_name, val in model_extra_cond.items():
                vu = None if model_extra_uncond is None else model_extra_uncond.get(k_name)
                if vu is None:
                    vu = jnp.zeros_like(val)
                rows = [val] + [vu] * (groups - 1)
                extra_kwargs[k_name] = (jnp.concatenate(rows, axis=0)
                                        if use_cfg else val)
        out = unet.apply(
            params, with_concat(x_b, groups), tb, ctx, control=control,
            hooks=run_hooks, y=y, **extra_kwargs,
        ).astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        if use_cfg:
            cond_out, uncond_out = out[:b], out[b:2 * b]
            den_c = calculate_denoised(prediction, x32, cond_out, sigma, t)
            den_u = calculate_denoised(prediction, x32, uncond_out, sigma, t)
            if use_perp_neg:
                # perpendicular negative guidance in noise-pred space
                # (nodes_perpneg.py cfg_function)
                den_n = calculate_denoised(prediction, x32, out[2 * b:], sigma, t)
                np_pos = x32 - den_c
                np_neg = x32 - den_u
                np_noc = x32 - den_n
                pos = np_pos - np_noc
                neg = np_neg - np_noc
                perp = neg - (jnp.sum(neg * pos) /
                              jnp.maximum(jnp.sum(pos * pos), 1e-12)) * pos
                noise_pred = np_noc + cfg_scale * (pos - perp * perp_neg_scale)
                denoised = x32 - noise_pred
            elif rescale_cfg_multiplier is not None:
                # RescaleCFG (nodes_model_advanced.py:184-206): combine in
                # v-pred space, rescale the cfg result to the positive
                # prediction's per-sample std, lerp by the multiplier
                mult = rescale_cfg_multiplier
                sig = sigma
                x_v = x32 / (sig**2 + 1.0)
                s_root = jnp.sqrt(sig**2 + 1.0)
                cond_v = (x_v - den_c) * s_root / sig
                uncond_v = (x_v - den_u) * s_root / sig
                x_cfg = uncond_v + cfg_scale * (cond_v - uncond_v)
                ro_pos = jnp.std(cond_v, axis=(1, 2, 3), keepdims=True)
                ro_cfg = jnp.std(x_cfg, axis=(1, 2, 3), keepdims=True)
                x_rescaled = x_cfg * (ro_pos / jnp.maximum(ro_cfg, 1e-12))
                x_final = mult * x_rescaled + (1.0 - mult) * x_cfg
                # v-pred reconstruction: denoised = c_skip*x + c_out*v with
                # c_skip = 1/(sig^2+1), c_out = -sig/sqrt(sig^2+1) — i.e. the
                # reference's x_orig - fn(args) collapses to exactly this
                # (samplers.py:349 with nodes_model_advanced.py:206's return)
                denoised = x_v - x_final * sig / s_root
            else:
                denoised = den_u + (den_c - den_u) * cfg_scale
        else:
            denoised = calculate_denoised(prediction, x32, out, sigma, t)

        if use_sag and sag_sim:
            # degrade (blur) the uncond prediction where the model attends,
            # re-noise, re-evaluate, and steer away (nodes_sag.py
            # post_cfg_function: cfg + (degraded - sag_pred) * scale)
            sag_scale, blur_sigma, _ = sag
            lh, lw = x.shape[1], x.shape[2]
            if min(lh, lw) > 4:  # reference skips when too small to pad
                degraded = _sag_blur_map(den_u, sag_sim[0], blur_sigma)
                deg_noised = degraded + x32 - den_u
                x_sag = (deg_noised * c_in).astype(compute_dtype)
                ctx_u = uncond_context.astype(compute_dtype)
                tb1 = jnp.broadcast_to(t, (b,))
                ctrl_sag = (control_fn(x_sag, tb1, ctx_u)
                            if control_fn is not None else None)
                out_sag = unet.apply(
                    params, with_concat(x_sag, 1), tb1, ctx_u,
                    control=ctrl_sag, y=yu,
                ).astype(jnp.float32)
                den_sag = calculate_denoised(prediction, x32, out_sag, sigma, t)
                denoised = denoised + (degraded - den_sag) * sag_scale

        eff_mask = mask
        if denoise_mask_fn is not None and mask is not None:
            eff_mask = denoise_mask_fn(sigma, mask)
        if eff_mask is not None and masked_latent is not None:
            denoised = denoised * eff_mask + masked_latent * (1.0 - eff_mask)
        return denoised

    return denoise


def _sag_gaussian_blur(img: jax.Array, kernel_size: int, sigma) -> jax.Array:
    """Depthwise 2D gaussian blur on NHWC with reflect padding
    (nodes_sag.py gaussian_blur_2d)."""
    half = (kernel_size - 1) * 0.5
    xs = jnp.linspace(-half, half, kernel_size)
    pdf = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k1 = (pdf / pdf.sum()).astype(img.dtype)
    c = img.shape[-1]
    r = kernel_size // 2
    pad = jnp.pad(img, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
    wr = jnp.broadcast_to(k1[:, None, None, None], (kernel_size, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        pad, wr, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    wc = jnp.broadcast_to(k1[None, :, None, None], (1, kernel_size, 1, c))
    return jax.lax.conv_general_dilated(
        out, wc, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def _sag_blur_map(x0: jax.Array, sim: jax.Array, blur_sigma,
                  threshold: float = 1.0) -> jax.Array:
    """Blur x0 where the captured attention mass exceeds the threshold
    (nodes_sag.py create_blur_map), NHWC."""
    import math

    from stable_renderer_tpu.ops.math import resize_nearest

    b, lh, lw, _ = x0.shape
    hw1 = sim.shape[2]
    attn_mask = (jnp.sum(jnp.mean(sim, axis=1), axis=1) > threshold)  # (b, hw2)
    ratio = 2 ** ((math.ceil(math.sqrt(lh * lw / hw1)) - 1).bit_length())
    mh, mw = math.ceil(lh / ratio), math.ceil(lw / ratio)
    m = attn_mask.reshape(b, mh, mw)[..., None].astype(x0.dtype)
    m = resize_nearest(m, lh, lw)
    blurred = _sag_gaussian_blur(x0, 9, blur_sigma)
    return blurred * m + x0 * (1.0 - m)
