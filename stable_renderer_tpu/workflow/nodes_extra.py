"""Tier-2 comfy_extras node packs, TPU-native.

Capability match for the reference's extra node packs
(reference: source/comfyUI/comfy_extras/):

  * nodes_custom_sampler.py — SamplerCustom + KSamplerSelect + the scheduler /
    sigma-manipulation nodes (SIGMAS and SAMPLER as first-class values).
  * nodes_model_merging.py  — Model/CLIP merge arithmetic + checkpoint save.
  * nodes_sag.py            — SelfAttentionGuidance (model patch).
  * nodes_perpneg.py        — Perp-Neg CFG (model patch).
  * nodes_freelunch.py      — FreeU / FreeU_V2 output-block patches.
  * nodes_hypertile.py      — HyperTile tiled self-attention patch.
  * nodes_hypernetwork.py   — HypernetworkLoader attn k/v MLP patch.
  * nodes_differential_diffusion.py — per-step denoise-mask thresholding.
  * nodes_morphology.py     — erode/dilate/open/close/gradient/top/bottom-hat.
  * nodes_compositing.py    — Porter-Duff composite + alpha split/join.
  * nodes_rebatch.py        — latent/image rebatching.
  * nodes_sdupscale.py      — SD 4x-upscale conditioning.

Model patches ride the MODEL dict as ``model["patches"]`` — an ordered tuple of
{"kind", "sig", ...} entries consumed by the KSampler assembly (executor.py
``ksampler`` + models/sampling/assemble.py). ``sig`` is hashable and feeds the
compiled-program cache key, so patch changes retrace while unchanged graphs
reuse their program (the reference mutates a cloned ModelPatcher instead).

Patches are pure: every hook built here is a traced function of static config
+ small closure arrays (MLP weights, empty conditioning), so the whole patched
denoise still compiles into the single-program sampler scan.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from stable_renderer_tpu.utils.log import get_logger
from stable_renderer_tpu.workflow.executor import (
    InferenceContext,
    WorkflowNode,
    _find_model_file,
    register_node,
)

logger = get_logger("sr_tpu.nodes_extra")


def _add_patch(model: dict, entry: dict) -> dict:
    return {**model, "patches": tuple(model.get("patches", ())) + (entry,)}


# ---------------------------------------------------------------------------
# custom sampler pack (nodes_custom_sampler.py)


@register_node("KSamplerSelect")
def ksampler_select(ctx: InferenceContext, node: WorkflowNode):
    from stable_renderer_tpu.models.sampling import SAMPLER_NAMES

    name = str(node.widgets[0]) if node.widgets else "euler"
    if name.endswith("_gpu"):  # gpu-noise variants are a torch device detail
        name = name[: -len("_gpu")]
    if name not in SAMPLER_NAMES:
        raise ValueError(f"unknown sampler {name}")
    return ({"name": name, "extra": {}},)


@register_node("SamplerDPMPP_2M_SDE")
def sampler_dpmpp_2m_sde(ctx: InferenceContext, node: WorkflowNode):
    w = node.widgets
    eta = float(w[1]) if len(w) > 1 else 1.0
    return ({"name": "dpmpp_2m_sde", "extra": {"eta": eta}},)


@register_node("SamplerDPMPP_SDE")
def sampler_dpmpp_sde(ctx: InferenceContext, node: WorkflowNode):
    w = node.widgets
    eta = float(w[0]) if w else 1.0
    return ({"name": "dpmpp_sde", "extra": {"eta": eta}},)


@register_node("BasicScheduler")
def basic_scheduler(ctx: InferenceContext, node: WorkflowNode, model=None):
    from stable_renderer_tpu.models.sampling import calculate_sigmas

    w = node.widgets
    scheduler = str(w[0]) if w else "normal"
    steps = int(w[1]) if len(w) > 1 else 20
    denoise = float(w[2]) if len(w) > 2 else 1.0
    return (np.asarray(calculate_sigmas(model["sampling"], scheduler, steps,
                                        denoise)),)


@register_node("KarrasScheduler")
def karras_scheduler(ctx: InferenceContext, node: WorkflowNode):
    from stable_renderer_tpu.models.sampling.schedules import sigmas_karras

    w = node.widgets
    steps = int(w[0]) if w else 20
    sigma_max = float(w[1]) if len(w) > 1 else 14.614642
    sigma_min = float(w[2]) if len(w) > 2 else 0.0291675
    rho = float(w[3]) if len(w) > 3 else 7.0
    return (sigmas_karras(steps, sigma_min, sigma_max, rho),)


@register_node("ExponentialScheduler")
def exponential_scheduler(ctx: InferenceContext, node: WorkflowNode):
    from stable_renderer_tpu.models.sampling.schedules import sigmas_exponential

    w = node.widgets
    steps = int(w[0]) if w else 20
    sigma_max = float(w[1]) if len(w) > 1 else 14.614642
    sigma_min = float(w[2]) if len(w) > 2 else 0.0291675
    return (sigmas_exponential(steps, sigma_min, sigma_max),)


@register_node("PolyexponentialScheduler")
def polyexponential_scheduler(ctx: InferenceContext, node: WorkflowNode):
    from stable_renderer_tpu.models.sampling.schedules import sigmas_polyexponential

    w = node.widgets
    steps = int(w[0]) if w else 20
    sigma_max = float(w[1]) if len(w) > 1 else 14.614642
    sigma_min = float(w[2]) if len(w) > 2 else 0.0291675
    rho = float(w[3]) if len(w) > 3 else 1.0
    return (sigmas_polyexponential(steps, sigma_min, sigma_max, rho),)


@register_node("VPScheduler")
def vp_scheduler(ctx: InferenceContext, node: WorkflowNode):
    from stable_renderer_tpu.models.sampling.schedules import sigmas_vp

    w = node.widgets
    steps = int(w[0]) if w else 20
    beta_d = float(w[1]) if len(w) > 1 else 19.9
    beta_min = float(w[2]) if len(w) > 2 else 0.1
    eps_s = float(w[3]) if len(w) > 3 else 0.001
    return (sigmas_vp(steps, beta_d, beta_min, eps_s),)


@register_node("SDTurboScheduler")
def sd_turbo_scheduler(ctx: InferenceContext, node: WorkflowNode, model=None):
    from stable_renderer_tpu.models.sampling.schedules import sigmas_sd_turbo

    w = node.widgets
    steps = int(w[0]) if w else 1
    denoise = float(w[1]) if len(w) > 1 else 1.0
    return (sigmas_sd_turbo(model["sampling"], steps, denoise),)


@register_node("SplitSigmas")
def split_sigmas(ctx: InferenceContext, node: WorkflowNode, sigmas=None):
    step = int(node.widgets[0]) if node.widgets else 0
    s = np.asarray(sigmas)
    return (s[: step + 1], s[step:])


@register_node("FlipSigmas")
def flip_sigmas(ctx: InferenceContext, node: WorkflowNode, sigmas=None):
    s = np.asarray(sigmas)[::-1].copy()
    if s.shape[0] and s[0] == 0:
        s[0] = 0.0001
    return (s,)


@register_node("SamplerCustom")
def sampler_custom(ctx: InferenceContext, node: WorkflowNode, model=None,
                   positive=None, negative=None, sampler=None, sigmas=None,
                   latent_image=None):
    """SamplerCustom: explicit SAMPLER + SIGMAS sampling
    (nodes_custom_sampler.py SamplerCustom.sample). Returns (output,
    denoised_output); without an x0 preview callback the reference returns the
    same latent for both — matched here."""
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.models.sampling import build_denoiser, sample

    w = node.widgets
    add_noise = (str(w[0]).lower() not in ("false", "disable", "0")) if w else True
    noise_seed = int(w[1]) % (2**31) if len(w) > 1 else 0
    cfg_scale = float(w[-1]) if len(w) > 2 else 8.0

    latent = latent_image["samples"] if isinstance(latent_image, dict) else latent_image
    b = latent.shape[0]
    ctx_pos = positive["context"]
    ctx_neg = negative["context"] if negative else None
    if ctx_pos.shape[0] != b:
        ctx_pos = jnp.broadcast_to(ctx_pos[:1], (b, *ctx_pos.shape[1:]))
    if ctx_neg is not None and ctx_neg.shape[0] != b:
        ctx_neg = jnp.broadcast_to(ctx_neg[:1], (b, *ctx_neg.shape[1:]))
    sig = jnp.asarray(np.asarray(sigmas, np.float32))
    noise_mask = latent_image.get("noise_mask") if isinstance(latent_image, dict) else None
    if noise_mask is not None:
        from stable_renderer_tpu.ops.math import resize_nearest

        nm = jnp.asarray(noise_mask)
        if nm.ndim == 2:
            nm = nm[None]
        if nm.shape[1:3] != latent.shape[1:3]:
            nm = resize_nearest(nm[..., None], latent.shape[1], latent.shape[2])[..., 0]
        noise_mask = nm[..., None]

    unet = model["unet"]
    ms = model["sampling"]
    log_sigmas = jnp.asarray(ms.log_sigmas)
    hooks, patch_opts = model_patch_options(model, unet, sig, ms)
    eta = float(sampler.get("extra", {}).get("eta", 1.0))

    cache_key = ("SamplerCustom", node.id, latent.shape, ctx_pos.shape,
                 sampler["name"], tuple(np.asarray(sigmas).tolist()),
                 cfg_scale, add_noise, noise_mask is not None,
                 tuple(p["sig"] for p in model.get("patches", ())))
    fn = ctx.jit_cache.get(cache_key)
    if fn is None:
        def run(unet_params, ctx_p, ctx_n, latent_, noise_, sig_, nm_, key_):
            den = build_denoiser(
                unet, unet_params, cond_context=ctx_p,
                uncond_context=None if cfg_scale == 1.0 else ctx_n,
                log_sigmas=log_sigmas, cfg_scale=cfg_scale,
                prediction=ms.prediction, hooks=hooks,
                inpaint_mask=nm_, inpaint_latent=None if nm_ is None else latent_,
                **patch_opts,
            )
            return sample(den, noise_, sig_, latent_image=latent_,
                          sampler=sampler["name"], key=key_, eta=eta)

        fn = jax.jit(run, static_argnames=())
        ctx.jit_cache[cache_key] = fn
    noise = (jax.random.normal(jax.random.PRNGKey(noise_seed), latent.shape)
             if add_noise else jnp.zeros_like(latent))
    out = fn(model["params"], ctx_pos, ctx_neg, latent, noise, sig,
             noise_mask, jax.random.PRNGKey(noise_seed))
    out_latent = {"samples": out}
    return (out_latent, out_latent)


# ---------------------------------------------------------------------------
# model merging (nodes_model_merging.py)


def _tree_combine(a: dict, b: dict, sa: float, sb: float,
                  per_key=None) -> dict:
    """new = a * sa + b * sb per leaf (ModelPatcher.add_patches diff math).
    ``per_key(flat_key) -> (sa, sb)`` overrides per parameter."""
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.models.weights import flatten, nest

    fa, fb = flatten(a), flatten(b)
    out = {}
    for k, va in fa.items():
        vb = fb.get(k)
        wa, wb = (sa, sb) if per_key is None else per_key(k)
        if vb is None or wb == 0.0:
            out[k] = va if wa == 1.0 else jnp.asarray(va) * wa
        else:
            out[k] = (jnp.asarray(va).astype(jnp.float32) * wa
                      + jnp.asarray(vb).astype(jnp.float32) * wb
                      ).astype(jnp.asarray(va).dtype)
    return nest(out, "")


@register_node("ModelMergeSimple")
def model_merge_simple(ctx: InferenceContext, node: WorkflowNode,
                       model1=None, model2=None):
    ratio = float(node.widgets[0]) if node.widgets else 1.0
    params = _tree_combine(model1["params"], model2["params"], 1.0 - ratio, ratio)
    return ({**model1, "params": params},)


@register_node("ModelMergeAdd")
def model_merge_add(ctx: InferenceContext, node: WorkflowNode,
                    model1=None, model2=None):
    params = _tree_combine(model1["params"], model2["params"], 1.0, 1.0)
    return ({**model1, "params": params},)


@register_node("ModelMergeSubtract")
def model_merge_subtract(ctx: InferenceContext, node: WorkflowNode,
                         model1=None, model2=None):
    mult = float(node.widgets[0]) if node.widgets else 1.0
    params = _tree_combine(model1["params"], model2["params"], -mult, mult)
    return ({**model1, "params": params},)


@register_node("ModelMergeBlocks")
def model_merge_blocks(ctx: InferenceContext, node: WorkflowNode,
                       model1=None, model2=None):
    """Per-section merge ratios (input/middle/out prefixes, longest match;
    nodes_model_merging.py ModelMergeBlocks.merge)."""
    w = node.widgets
    ratios = {"input": float(w[0]) if w else 1.0,
              "middle": float(w[1]) if len(w) > 1 else 1.0,
              "out": float(w[2]) if len(w) > 2 else 1.0}
    default = ratios["input"]

    def per_key(k: str):
        r, best = default, 0
        for prefix, val in ratios.items():
            if k.startswith(prefix) and len(prefix) > best:
                r, best = val, len(prefix)
        return (1.0 - r, r)

    params = _tree_combine(model1["params"], model2["params"], 0.0, 0.0,
                           per_key=per_key)
    return ({**model1, "params": params},)


@register_node("CLIPMergeSimple")
def clip_merge_simple(ctx: InferenceContext, node: WorkflowNode,
                      clip1=None, clip2=None):
    ratio = float(node.widgets[0]) if node.widgets else 1.0

    def per_key(k: str):
        # position_ids / logit_scale keep clip1 (nodes_model_merging.py:88)
        if k.endswith("position_ids") or k.endswith("logit_scale"):
            return (1.0, 0.0)
        return (1.0 - ratio, ratio)

    params = _tree_combine(clip1["params"], clip2["params"], 0.0, 0.0,
                           per_key=per_key)
    return ({**clip1, "params": params},)


def _save_safetensors(flat: dict, path: str) -> None:
    from safetensors.numpy import save_file

    arrays = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if a.dtype == np.dtype("bfloat16") if hasattr(np, "bfloat16") else False:
            a = a.astype(np.float32)
        arrays[k] = np.ascontiguousarray(a)
    save_file(arrays, path)


def _save_dir(ctx: InferenceContext, sub: str) -> str:
    import os

    from stable_renderer_tpu.utils.paths import OUTPUT_DIR

    d = os.path.join(str(OUTPUT_DIR), sub)
    os.makedirs(d, exist_ok=True)
    return d


@register_node("CheckpointSave")
def checkpoint_save(ctx: InferenceContext, node: WorkflowNode, model=None,
                    clip=None, vae=None):
    """Write a merged checkpoint as reference-layout safetensors
    (nodes_model_merging.py CheckpointSave -> comfy sd.py save_checkpoint):
    model.diffusion_model.* + first_stage_model.* + cond_stage_model.transformer.*"""
    import os

    import jax.numpy as jnp

    from stable_renderer_tpu.models.weights import flatten

    prefix = str(node.widgets[0]) if node.widgets else "checkpoints/sr_tpu"
    name = os.path.basename(prefix) or "sr_tpu"
    d = _save_dir(ctx, os.path.dirname(prefix) or "checkpoints")
    flat = {}
    for k, v in flatten(model["params"]).items():
        flat[f"model.diffusion_model.{k}"] = np.asarray(
            jnp.asarray(v).astype(jnp.float32))
    if vae is not None:
        for k, v in flatten(vae["params"]).items():
            flat[f"first_stage_model.{k}"] = np.asarray(
                jnp.asarray(v).astype(jnp.float32))
    if clip is not None:
        for k, v in flatten(clip["params"]).items():
            flat[f"cond_stage_model.transformer.{k}"] = np.asarray(
                jnp.asarray(v).astype(jnp.float32))
    path = os.path.join(d, f"{name}.safetensors")
    _save_safetensors(flat, path)
    logger.info(f"saved checkpoint {path} ({len(flat)} tensors)")
    return (path,)


@register_node("CLIPSave")
def clip_save(ctx: InferenceContext, node: WorkflowNode, clip=None):
    import os

    from stable_renderer_tpu.models.weights import flatten

    prefix = str(node.widgets[0]) if node.widgets else "clip/sr_tpu"
    name = os.path.basename(prefix) or "sr_tpu"
    d = _save_dir(ctx, os.path.dirname(prefix) or "clip")
    path = os.path.join(d, f"{name}.safetensors")
    _save_safetensors(flatten(clip["params"]), path)
    return (path,)


@register_node("VAESave")
def vae_save(ctx: InferenceContext, node: WorkflowNode, vae=None):
    import os

    from stable_renderer_tpu.models.weights import flatten

    prefix = str(node.widgets[0]) if node.widgets else "vae/sr_tpu_vae"
    name = os.path.basename(prefix) or "sr_tpu_vae"
    d = _save_dir(ctx, os.path.dirname(prefix) or "vae")
    path = os.path.join(d, f"{name}.safetensors")
    _save_safetensors(flatten(vae["params"]), path)
    return (path,)


# ---------------------------------------------------------------------------
# model patches: FreeU, HyperTile, Hypernetwork, SAG, PerpNeg, DiffDiffusion


@register_node("FreeU")
def freeu(ctx: InferenceContext, node: WorkflowNode, model=None):
    w = node.widgets
    b1 = float(w[0]) if w else 1.1
    b2 = float(w[1]) if len(w) > 1 else 1.2
    s1 = float(w[2]) if len(w) > 2 else 0.9
    s2 = float(w[3]) if len(w) > 3 else 0.2
    return (_add_patch(model, {"kind": "freeu", "version": 1,
                               "sig": ("freeu", b1, b2, s1, s2),
                               "b1": b1, "b2": b2, "s1": s1, "s2": s2}),)


@register_node("FreeU_V2")
def freeu_v2(ctx: InferenceContext, node: WorkflowNode, model=None):
    w = node.widgets
    b1 = float(w[0]) if w else 1.3
    b2 = float(w[1]) if len(w) > 1 else 1.4
    s1 = float(w[2]) if len(w) > 2 else 0.9
    s2 = float(w[3]) if len(w) > 3 else 0.2
    return (_add_patch(model, {"kind": "freeu", "version": 2,
                               "sig": ("freeu2", b1, b2, s1, s2),
                               "b1": b1, "b2": b2, "s1": s1, "s2": s2}),)


@register_node("HyperTile")
def hypertile(ctx: InferenceContext, node: WorkflowNode, model=None):
    w = node.widgets
    tile_size = int(w[0]) if w else 256
    swap_size = int(w[1]) if len(w) > 1 else 2
    max_depth = int(w[2]) if len(w) > 2 else 0
    scale_depth = (str(w[3]).lower() in ("true", "1", "enable")) if len(w) > 3 else False
    return (_add_patch(model, {
        "kind": "hypertile",
        "sig": ("hypertile", tile_size, swap_size, max_depth, scale_depth),
        "tile_size": tile_size, "swap_size": swap_size,
        "max_depth": max_depth, "scale_depth": scale_depth}),)


@register_node("HypernetworkLoader")
def hypernetwork_loader(ctx: InferenceContext, node: WorkflowNode, model=None):
    """Load an A1111-style hypernetwork .pt and patch attn1/attn2 k/v contexts
    with its per-dim MLPs (nodes_hypernetwork.py load_hypernetwork_patch)."""
    name = str(node.widgets[0]) if node.widgets else ""
    strength = float(node.widgets[1]) if len(node.widgets) > 1 else 1.0
    path = _find_model_file(ctx, name)
    if path is None:
        logger.warning(f"hypernetwork '{name}' not found; passing model through")
        return (model,)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    activation = sd.get("activation_func", "linear")
    is_layer_norm = bool(sd.get("is_layer_norm", False))
    activate_output = bool(sd.get("activate_output", False))
    nets = {}
    for d_key in sd:
        try:
            dim = int(d_key)
        except (TypeError, ValueError):
            continue
        per_slot = []
        for index in (0, 1):  # k-net, v-net
            attn_weights = sd[dim][index]
            names = sorted(
                {k[: -len(".weight")] for k in attn_weights if k.endswith(".weight")},
                key=lambda s: [int(p) if p.isdigit() else p for p in s.split(".")],
            )
            layers = []
            for n in names:
                w_ = attn_weights[f"{n}.weight"].float().numpy()
                b_ = attn_weights[f"{n}.bias"].float().numpy()
                layers.append({"weight": w_, "bias": b_,
                               "is_norm": is_layer_norm and w_.ndim == 1})
            per_slot.append(layers)
        nets[dim] = per_slot
    return (_add_patch(model, {
        "kind": "hypernetwork",
        "sig": ("hypernetwork", name, strength, activation),
        "nets": nets, "strength": strength, "activation": activation,
        "activate_output": activate_output}),)


@register_node("SelfAttentionGuidance")
def self_attention_guidance(ctx: InferenceContext, node: WorkflowNode, model=None):
    w = node.widgets
    scale = float(w[0]) if w else 0.5
    blur_sigma = float(w[1]) if len(w) > 1 else 2.0
    return (_add_patch(model, {"kind": "sag", "sig": ("sag", scale, blur_sigma),
                               "scale": scale, "blur_sigma": blur_sigma}),)


@register_node("PerpNeg")
def perp_neg(ctx: InferenceContext, node: WorkflowNode, model=None,
             empty_conditioning=None):
    neg_scale = float(node.widgets[0]) if node.widgets else 1.0
    return (_add_patch(model, {
        "kind": "perp_neg", "sig": ("perp_neg", neg_scale),
        "empty_context": empty_conditioning["context"],
        "neg_scale": neg_scale}),)


@register_node("DifferentialDiffusion")
def differential_diffusion(ctx: InferenceContext, node: WorkflowNode, model=None):
    return (_add_patch(model, {"kind": "diff_diffusion",
                               "sig": ("diff_diffusion",)}),)


# --- patch -> denoiser-assembly translation (consumed by ksampler) ----------


def _freeu_fourier_filter(x, threshold: int, scale: float):
    """FFT low/high split scaling on NHWC (nodes_freelunch.py Fourier_filter)."""
    import jax.numpy as jnp

    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    h, w_ = xf.shape[1], xf.shape[2]
    crow, ccol = h // 2, w_ // 2
    mask = jnp.ones((1, h, w_, 1), jnp.float32)
    mask = mask.at[:, crow - threshold:crow + threshold,
                   ccol - threshold:ccol + threshold, :].set(scale)
    xf = xf * mask
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    return jnp.real(jnp.fft.ifftn(xf, axes=(1, 2))).astype(x.dtype)


def _make_freeu_out_block(p: dict, model_channels: int):
    import jax.numpy as jnp

    scale_map = {model_channels * 4: (p["b1"], p["s1"]),
                 model_channels * 2: (p["b2"], p["s2"])}
    v2 = p.get("version") == 2

    def out_block(h, hsp, block_idx):
        c = h.shape[-1]
        if c not in scale_map:
            return h, hsp
        b_scale, s_scale = scale_map[c]
        if v2:
            # V2 normalizes the per-pixel channel mean into [0,1] and ramps the
            # boost by it (nodes_freelunch.py FreeU_V2.output_block_patch)
            hidden_mean = jnp.mean(h.astype(jnp.float32), axis=-1, keepdims=True)
            bsz = hidden_mean.shape[0]
            flat = hidden_mean.reshape(bsz, -1)
            hmax = jnp.max(flat, axis=-1)[:, None, None, None]
            hmin = jnp.min(flat, axis=-1)[:, None, None, None]
            norm = (hidden_mean - hmin) / jnp.maximum(hmax - hmin, 1e-8)
            factor = ((b_scale - 1.0) * norm + 1.0).astype(h.dtype)
        else:
            factor = jnp.asarray(b_scale, h.dtype)
        scaled = jnp.concatenate([h[..., : c // 2] * factor, h[..., c // 2:]],
                                 axis=-1)
        return scaled, _freeu_fourier_filter(hsp, 1, s_scale)

    return out_block


def _make_hypertile_attn(p: dict):
    """Tiled self-attention (nodes_hypertile.py): split tokens into nh x nw
    spatial tiles and attend within each. Tile split is chosen statically at
    trace time (the reference re-randomizes per call — a documented deviation;
    shapes must be static under jit)."""
    import random as pyrandom

    import jax.numpy as jnp

    from stable_renderer_tpu.models.layers import attention

    latent_tile = max(32, p["tile_size"]) // 8
    rng = pyrandom.Random(hash(p["sig"]) & 0xFFFFFFFF)

    def pick_divisor(value: int, min_value: int) -> int:
        min_value = min(min_value, value)
        divisors = [i for i in range(min_value, value + 1) if value % i == 0]
        ns = [value // i for i in divisors[: p["swap_size"]]]
        return ns[rng.randrange(len(ns))] if len(ns) > 1 else ns[0]

    def attn_all(q, k, v, heads, layer):
        l_tok = q.shape[1]
        h = int(math.isqrt(l_tok))
        if h * h != l_tok:  # non-square latent: skip (aspect unknown here)
            return attention(q, k, v, heads)
        # apply to the top (max_depth+1) attention resolutions
        factor = 1
        nh = pick_divisor(h, latent_tile * factor)
        nw = pick_divisor(h, latent_tile * factor)
        if nh * nw <= 1 or h % nh or h % nw:
            return attention(q, k, v, heads)
        bsz, c = q.shape[0], q.shape[2]
        th, tw = h // nh, h // nw

        def tile(x):
            x = x.reshape(bsz, nh, th, nw, tw, c)
            return x.transpose(0, 1, 3, 2, 4, 5).reshape(bsz * nh * nw, th * tw, c)

        def untile(x):
            x = x.reshape(bsz, nh, nw, th, tw, c).transpose(0, 1, 3, 2, 4, 5)
            return x.reshape(bsz, l_tok, c)

        return untile(attention(tile(q), tile(k), tile(v), heads))

    return attn_all


def _make_hypernet_hooks(p: dict):
    import jax
    import jax.numpy as jnp

    acts = {
        "linear": lambda x: x,
        "relu": jax.nn.relu,
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "elu": jax.nn.elu,
        "swish": jax.nn.hard_swish,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "softsign": jax.nn.soft_sign,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    }
    act = acts.get(p["activation"], lambda x: x)
    strength = p["strength"]
    nets = p["nets"]

    def apply_net(layers, x):
        out = x.astype(jnp.float32)
        n_lin = sum(1 for l in layers if not l["is_norm"])
        seen = 0
        for l in layers:
            w_, b_ = jnp.asarray(l["weight"]), jnp.asarray(l["bias"])
            if l["is_norm"]:
                mean = out.mean(-1, keepdims=True)
                var = out.var(-1, keepdims=True)
                out = (out - mean) * jax.lax.rsqrt(var + 1e-5) * w_ + b_
            else:
                out = out @ w_.T + b_
                seen += 1
                if seen < n_lin or p.get("activate_output"):
                    out = act(out)
        return out.astype(x.dtype)

    def transform(k_ctx, v_ctx):
        dim = k_ctx.shape[-1]
        if dim not in nets:
            return k_ctx, v_ctx
        k_net, v_net = nets[dim]
        return (k_ctx + apply_net(k_net, k_ctx) * strength,
                v_ctx + apply_net(v_net, v_ctx) * strength)

    def pre_all(q_ctx, k_ctx, v_ctx, layer):
        k2, v2 = transform(k_ctx, v_ctx)
        return q_ctx, k2, v2

    def pre_cross(n, ctx_k, ctx_v, layer):
        k2, v2 = transform(ctx_k, ctx_v)
        return n, k2, v2

    return pre_all, pre_cross


def model_patch_options(model: dict, unet, sigmas, ms):
    """Translate ``model["patches"]`` into (AttnHooks fields, build_denoiser
    kwargs) for the shared denoiser assembly. Returns (hooks, options)."""
    import jax.numpy as jnp

    from stable_renderer_tpu.models.sampling.cfg import timestep_from_sigma
    from stable_renderer_tpu.models.unet import AttnHooks

    patches = model.get("patches", ())
    out_blocks = []
    pre_alls = []
    pre_crosses = []
    attn_all = None
    in_block = None
    in_block_after = None
    opts: dict = {}
    for p in patches:
        kind = p["kind"]
        if kind == "freeu":
            out_blocks.append(
                _make_freeu_out_block(p, unet.config.model_channels))
        elif kind == "hypertile":
            attn_all = _make_hypertile_attn(p)
        elif kind == "tomesd":
            attn_all = _make_tome_attn(p)
        elif kind == "hypernetwork":
            pa, pc = _make_hypernet_hooks(p)
            pre_alls.append(pa)
            pre_crosses.append(pc)
        elif kind == "sag":
            # middle-block transformer index = number of down-path transformers
            mid_layer = sum(
                1 for k in unet.block_plan()[0] if k[0] == "res_attn")
            opts["sag"] = (p["scale"], p["blur_sigma"], mid_layer)
        elif kind == "perp_neg":
            opts["nocond_context"] = jnp.asarray(p["empty_context"])
            opts["perp_neg_scale"] = p["neg_scale"]
        elif kind == "rescale_cfg":
            opts["rescale_cfg_multiplier"] = p["multiplier"]
        elif kind == "downscale":
            # PatchModelAddDownscale / Kohya Deep Shrink
            # (comfy_extras/nodes_model_downscale.py). Static-shape TPU
            # divergence: instead of shrinking h mid-network (a dynamic shape
            # under jit), the input-block patch applies a low-pass (downscale
            # then upscale back) gated per-step by the sigma window, and the
            # output-block upscale patch becomes a no-op because shapes never
            # diverge. NOTE: the low-pass removes the same high frequencies
            # but the UNet still computes at full resolution, so receptive
            # fields stay unchanged — a documented approximation of the
            # reference's mid-network shrink, not an exact reproduction.
            sigma_start = min(ms.percent_to_sigma(p["start_percent"]),
                              float(ms.sigma_max))
            sigma_end = max(ms.percent_to_sigma(p["end_percent"]),
                            float(ms.sigma_min))
            # thresholds must live in the SAME space as the UNet's timestep
            # input: index-interpolated t for discrete models, 0.25*log(sigma)
            # for EDM models (assemble.py t_fn) — both increase with sigma
            if getattr(ms, "timestep_mode", "") == "edm":
                t_hi = float(0.25 * np.log(sigma_start))
                t_lo = float(0.25 * np.log(sigma_end))
            else:
                t_hi = float(ms.timestep(np.asarray(sigma_start)))
                t_lo = float(ms.timestep(np.asarray(sigma_end)))
            hook = _make_downscale_in_block(p, t_lo, t_hi)
            if p.get("after_skip", True):
                in_block_after = (hook if in_block_after is None
                                  else _chain_in_blocks(in_block_after, hook))
            else:
                in_block = (hook if in_block is None
                            else _chain_in_blocks(in_block, hook))
        elif kind == "linear_cfg":
            # VideoLinearCFGGuidance: per-frame cfg ramp (consumed by the
            # KSampler assembly, executor.py)
            opts["linear_cfg_min"] = p["min_cfg"]
        elif kind == "diff_diffusion":
            log_sigmas = jnp.asarray(ms.log_sigmas)
            sig_arr = jnp.asarray(np.asarray(sigmas, np.float32))
            t_from = timestep_from_sigma(log_sigmas, sig_arr[0])
            sigma_to = jnp.maximum(sig_arr[-1], ms.sigma_min)
            t_to = timestep_from_sigma(log_sigmas, sigma_to)

            def denoise_mask_fn(sigma, mask, _tf=t_from, _tt=t_to,
                                _ls=log_sigmas):
                t_cur = timestep_from_sigma(_ls, sigma)
                threshold = (t_cur - _tt) / jnp.maximum(_tf - _tt, 1e-8)
                return (mask >= threshold).astype(mask.dtype)

            opts["denoise_mask_fn"] = denoise_mask_fn

    def chain(fns, n_args):
        if not fns:
            return None
        if len(fns) == 1:
            return fns[0]

        def chained(*args):
            vals = args[:n_args]
            layer = args[n_args]
            for f in fns:
                vals = f(*vals, layer)
            return vals

        return chained

    hooks = AttnHooks(
        pre_all=chain(pre_alls, 3),
        pre_cross=chain(pre_crosses, 3),
        attn_all=attn_all,
        out_block=(out_blocks[0] if len(out_blocks) == 1 else (
            None if not out_blocks else _chain_out_blocks(out_blocks))),
        in_block=in_block,
        in_block_after=in_block_after,
    )
    return hooks, opts


_RESIZE_METHODS = {
    # comfy.utils.common_upscale method -> jax.image.resize method.
    # 'area' and 'bislerp' have no jax.image equivalent; linear is the
    # closest separable approximation (documented divergence).
    "nearest-exact": "nearest", "nearest": "nearest",
    "bilinear": "linear", "area": "linear", "bislerp": "linear",
    "bicubic": "cubic", "lanczos": "cubic",
}


def _resize_image(x, h: int, w: int, method: str):
    """NHWC spatial resize (comfy.utils.common_upscale equivalent)."""
    import jax

    m = _RESIZE_METHODS.get(method, "linear")
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method=m
                            ).astype(x.dtype)


def _make_downscale_in_block(p: dict, t_lo: float, t_hi: float):
    """Sigma-window-gated low-pass input-block hook for Deep Shrink."""
    import jax.numpy as jnp

    block_number = int(p["block_number"])
    factor = float(p["downscale_factor"])

    def hook(h, idx, t):
        if idx != block_number:
            return h
        hh = _resize_image(
            h, max(1, round(h.shape[1] / factor)),
            max(1, round(h.shape[2] / factor)), p.get("downscale_method", "bicubic"))
        hh = _resize_image(hh, h.shape[1], h.shape[2],
                           p.get("upscale_method", "bicubic"))
        gate = (t >= t_lo) & (t <= t_hi)
        return jnp.where(gate[:, None, None, None], hh, h)

    return hook


def _chain_in_blocks(first, second):
    """Compose two input-block hooks (stacked PatchModelAddDownscale)."""
    def chained(h, idx, t):
        return second(first(h, idx, t), idx, t)

    return chained


def _chain_out_blocks(fns):
    def chained(h, hsp, i):
        for f in fns:
            h, hsp = f(h, hsp, i)
        return h, hsp

    return chained


# ---------------------------------------------------------------------------
# morphology (nodes_morphology.py, kornia semantics via reduce_window)


def _morph_pool(img, ksize: int, op: str):
    import jax
    import jax.numpy as jnp

    r = ksize // 2
    pad = jnp.pad(img, ((0, 0), (r, ksize - 1 - r), (r, ksize - 1 - r), (0, 0)),
                  mode="edge")
    if op == "dilate":
        return jax.lax.reduce_window(
            pad, -jnp.inf, jax.lax.max, (1, ksize, ksize, 1), (1, 1, 1, 1), "VALID")
    return jax.lax.reduce_window(
        pad, jnp.inf, jax.lax.min, (1, ksize, ksize, 1), (1, 1, 1, 1), "VALID")


@register_node("Morphology")
def morphology(ctx: InferenceContext, node: WorkflowNode, image=None):
    import jax.numpy as jnp

    w = node.widgets
    op = str(w[0]) if w else "erode"
    ksize = int(w[1]) if len(w) > 1 else 3
    img = jnp.asarray(image)
    if op == "erode":
        out = _morph_pool(img, ksize, "erode")
    elif op == "dilate":
        out = _morph_pool(img, ksize, "dilate")
    elif op == "open":
        out = _morph_pool(_morph_pool(img, ksize, "erode"), ksize, "dilate")
    elif op == "close":
        out = _morph_pool(_morph_pool(img, ksize, "dilate"), ksize, "erode")
    elif op == "gradient":
        out = (_morph_pool(img, ksize, "dilate")
               - _morph_pool(img, ksize, "erode"))
    elif op == "top_hat":
        opened = _morph_pool(_morph_pool(img, ksize, "erode"), ksize, "dilate")
        out = img - opened
    elif op == "bottom_hat":
        closed = _morph_pool(_morph_pool(img, ksize, "dilate"), ksize, "erode")
        out = closed - img
    else:
        raise ValueError(f"invalid morphology operation {op}")
    return (out,)


# ---------------------------------------------------------------------------
# compositing (nodes_compositing.py)

_PORTER_DUFF_MODES = (
    "ADD", "CLEAR", "DARKEN", "DST", "DST_ATOP", "DST_IN", "DST_OUT",
    "DST_OVER", "LIGHTEN", "MULTIPLY", "OVERLAY", "SCREEN", "SRC", "SRC_ATOP",
    "SRC_IN", "SRC_OUT", "SRC_OVER", "XOR",
)


def _porter_duff(src, sa, dst, da, mode: str):
    import jax.numpy as jnp

    if mode == "ADD":
        return jnp.clip(src + dst, 0, 1), jnp.clip(sa + da, 0, 1)
    if mode == "CLEAR":
        return jnp.zeros_like(dst), jnp.zeros_like(da)
    if mode == "DARKEN":
        return ((1 - da) * src + (1 - sa) * dst + jnp.minimum(src, dst),
                sa + da - sa * da)
    if mode == "DST":
        return dst, da
    if mode == "DST_ATOP":
        return sa * dst + (1 - da) * src, sa
    if mode == "DST_IN":
        return dst * sa, sa * da
    if mode == "DST_OUT":
        return (1 - sa) * dst, (1 - sa) * da
    if mode == "DST_OVER":
        return dst + (1 - da) * src, da + (1 - da) * sa
    if mode == "LIGHTEN":
        return ((1 - da) * src + (1 - sa) * dst + jnp.maximum(src, dst),
                sa + da - sa * da)
    if mode == "MULTIPLY":
        return src * dst, sa * da
    if mode == "OVERLAY":
        return (jnp.where(2 * dst < da, 2 * src * dst,
                          sa * da - 2 * (da - src) * (sa - dst)),
                sa + da - sa * da)
    if mode == "SCREEN":
        return src + dst - src * dst, sa + da - sa * da
    if mode == "SRC":
        return src, sa
    if mode == "SRC_ATOP":
        return da * src + (1 - sa) * dst, da
    if mode == "SRC_IN":
        return src * da, sa * da
    if mode == "SRC_OUT":
        return (1 - da) * src, (1 - da) * sa
    if mode == "SRC_OVER":
        return src + (1 - sa) * dst, sa + (1 - sa) * da
    if mode == "XOR":
        return ((1 - da) * src + (1 - sa) * dst,
                (1 - da) * sa + (1 - sa) * da)
    raise ValueError(f"unknown PorterDuff mode {mode}")


@register_node("PorterDuffImageComposite")
def porter_duff_image_composite(ctx: InferenceContext, node: WorkflowNode,
                                source=None, source_alpha=None,
                                destination=None, destination_alpha=None):
    import jax.numpy as jnp

    mode = str(node.widgets[0]) if node.widgets else "DST"
    src = jnp.asarray(source)[..., :3]
    dst = jnp.asarray(destination)[..., :3]
    sa = jnp.asarray(source_alpha)
    da = jnp.asarray(destination_alpha)
    if sa.ndim == 3:
        sa = sa[..., None]
    if da.ndim == 3:
        da = da[..., None]
    out_img, out_a = _porter_duff(src, sa, dst, da, mode)
    return (out_img, out_a[..., 0])


@register_node("SplitImageWithAlpha")
def split_image_with_alpha(ctx: InferenceContext, node: WorkflowNode, image=None):
    import jax.numpy as jnp

    img = jnp.asarray(image)
    rgb = img[..., :3]
    alpha = img[..., 3] if img.shape[-1] > 3 else jnp.ones_like(img[..., 0])
    return (rgb, 1.0 - alpha)


@register_node("JoinImageWithAlpha")
def join_image_with_alpha(ctx: InferenceContext, node: WorkflowNode,
                          image=None, alpha=None):
    import jax.numpy as jnp

    from stable_renderer_tpu.ops.math import resize_nearest

    img = jnp.asarray(image)[..., :3]
    a = jnp.asarray(alpha)
    if a.ndim == 2:
        a = a[None]
    if a.shape[1:3] != img.shape[1:3]:
        a = resize_nearest(a[..., None], img.shape[1], img.shape[2])[..., 0]
    return (jnp.concatenate([img, (1.0 - a)[..., None]], axis=-1),)


# ---------------------------------------------------------------------------
# rebatch (nodes_rebatch.py)


@register_node("RebatchLatents")
def rebatch_latents(ctx: InferenceContext, node: WorkflowNode, latents=None):
    import jax.numpy as jnp

    batch_size = int(node.widgets[0]) if node.widgets else 1
    items = latents if isinstance(latents, list) else [latents]
    samples = jnp.concatenate(
        [l["samples"] if isinstance(l, dict) else l for l in items], axis=0)
    out = []
    for i in range(0, samples.shape[0], batch_size):
        out.append({"samples": samples[i:i + batch_size]})
    return (out,)


@register_node("RebatchImages")
def rebatch_images(ctx: InferenceContext, node: WorkflowNode, images=None):
    import jax.numpy as jnp

    batch_size = int(node.widgets[0]) if node.widgets else 1
    items = images if isinstance(images, list) else [images]
    stacked = jnp.concatenate([jnp.asarray(i) for i in items], axis=0)
    return ([stacked[i:i + batch_size]
             for i in range(0, stacked.shape[0], batch_size)],)


# ---------------------------------------------------------------------------
# SD 4x upscale conditioning (nodes_sdupscale.py)


@register_node("SD_4XUpscale_Conditioning")
def sd_4x_upscale_conditioning(ctx: InferenceContext, node: WorkflowNode,
                               images=None, positive=None, negative=None):
    import jax
    import jax.numpy as jnp

    w = node.widgets
    scale_ratio = float(w[0]) if w else 4.0
    noise_aug = float(w[1]) if len(w) > 1 else 0.0
    img = jnp.asarray(images)
    width = max(1, round(img.shape[2] * scale_ratio))
    height = max(1, round(img.shape[1] * scale_ratio))
    pixels = jax.image.resize(
        img * 2.0 - 1.0, (img.shape[0], height // 4, width // 4, img.shape[3]),
        method="bilinear")
    pos = {**(positive or {}), "concat_image": pixels,
           "noise_augmentation": noise_aug}
    neg = {**(negative or {}), "concat_image": pixels,
           "noise_augmentation": noise_aug}
    latent = {"samples": jnp.zeros((img.shape[0], height // 4, width // 4, 4))}
    return (pos, neg, latent)


# ---------------------------------------------------------------------------
# video models (nodes_video_model.py — SVD img2vid)


@register_node("ImageOnlyCheckpointLoader")
def image_only_checkpoint_loader(ctx: InferenceContext, node: WorkflowNode):
    """SVD checkpoint loader -> (MODEL, CLIP_VISION, VAE)
    (nodes_video_model.py ImageOnlyCheckpointLoader; comfy sd.py
    load_checkpoint_guess_config with output_clipvision). Falls back to tiny
    random models offline (same policy as CheckpointLoaderSimple)."""
    import jax

    from stable_renderer_tpu.models.sampling.schedules import ModelSamplingEDM
    from stable_renderer_tpu.models.video_unet import (
        SVD_UNET_CONFIG,
        TINY_VIDEO_UNET_CONFIG,
        VideoUNetModel,
    )

    name = str(node.widgets[0]) if node.widgets else ""
    path = _find_model_file(ctx, name)
    if path:
        import jax.numpy as jnp

        from stable_renderer_tpu.models import VAE, SD15_VAE_CONFIG
        from stable_renderer_tpu.models.clip_vision import CLIPVisionModel, VITH_CONFIG
        from stable_renderer_tpu.models.weights import (
            load_state_dict, nest, to_device)

        from stable_renderer_tpu.models import UNetModel
        from stable_renderer_tpu.models.sampling import ModelSampling
        from stable_renderer_tpu.models.weights import detect_unet_config
        from stable_renderer_tpu.models.video_unet import VideoUNetConfig

        flat = load_state_dict(path)
        unet_p = nest(flat, "model.diffusion_model.")
        vae_p = nest(flat, "first_stage_model.")
        cv_p = nest(flat, "conditioner.embedders.0.open_clip.model.visual.")
        if not cv_p:  # Zero123 layout (cond_stage_model = clip vision)
            cv_p = nest(flat, "cond_stage_model.model.visual.")
        ucfg = detect_unet_config(flat)
        if isinstance(ucfg, VideoUNetConfig):
            unet = VideoUNetModel(ucfg)
            ms = ModelSamplingEDM(prediction="v")
        else:  # image-conditioned stills model (Stable Zero123 etc.)
            unet = UNetModel(ucfg)
            ms = ModelSampling()
        model = {"unet": unet, "params": to_device(unet_p, jnp.bfloat16),
                 "sampling": ms}
        if "cc_projection.weight" in flat:
            model["cc_projection"] = {
                "weight": flat["cc_projection.weight"],
                "bias": flat.get("cc_projection.bias"),
            }
        vae = {"vae": VAE(SD15_VAE_CONFIG), "params": to_device(vae_p, jnp.bfloat16)}
        cv = CLIPVisionModel(VITH_CONFIG)
        clip_vision = {"model": cv, "params": to_device({"vision_model": cv_p},
                                                        jnp.float32)}
        return model, clip_vision, vae
    logger.warning(f"video checkpoint '{name}' not found; tiny random models")
    import jax.numpy as jnp  # noqa: F401

    from stable_renderer_tpu.models import VAE, TINY_VAE_CONFIG
    from stable_renderer_tpu.models.clip_vision import (
        CLIPVisionModel,
        TINY_VISION_CONFIG,
    )

    key = jax.random.PRNGKey(0)
    cfg = TINY_VIDEO_UNET_CONFIG
    unet = VideoUNetModel(cfg)
    vae = VAE(TINY_VAE_CONFIG)
    cv = CLIPVisionModel(TINY_VISION_CONFIG)
    model = {"unet": unet, "params": unet.init(key),
             "sampling": ModelSamplingEDM(prediction="v")}
    return (
        model,
        {"model": cv, "params": cv.init(jax.random.fold_in(key, 2))},
        {"vae": vae, "params": vae.init(jax.random.fold_in(key, 1))},
    )


@register_node("SVD_img2vid_Conditioning")
def svd_img2vid_conditioning(ctx: InferenceContext, node: WorkflowNode,
                             clip_vision=None, init_image=None, vae=None):
    """SVD conditioning (nodes_video_model.py SVD_img2vid_Conditioning):
    CLIP-vision image embed as the cross-attn context, encoded init image as
    c_concat (zeroed for the negative), fps/motion/augmentation ADM vector,
    and a T-frame empty latent."""
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.models.video_unet import svd_adm_vector

    w = node.widgets
    width = int(w[0]) if w else 1024
    height = int(w[1]) if len(w) > 1 else 576
    video_frames = int(w[2]) if len(w) > 2 else 14
    motion_bucket_id = int(w[3]) if len(w) > 3 else 127
    fps = int(w[4]) if len(w) > 4 else 6
    aug = float(w[5]) if len(w) > 5 else 0.0

    out = clip_vision["model"].encode_image(clip_vision["params"], init_image)
    pooled = out.image_embeds[:1][:, None, :]  # (1, 1, D) cross-attn context
    img = jnp.asarray(init_image)[..., :3]
    if img.shape[1:3] != (height, width):
        img = jax.image.resize(
            img, (img.shape[0], height, width, 3), method="bilinear")
    if aug > 0:
        img = img + jax.random.normal(jax.random.PRNGKey(7), img.shape) * aug
    dtype = vae["params"]["quant_conv"]["weight"].dtype
    t = vae["vae"].encode(vae["params"], (img * 2.0 - 1.0).astype(dtype)
                          ).astype(jnp.float32)
    y = svd_adm_vector(fps - 1, motion_bucket_id, aug)
    pos = {"context": pooled, "concat_latent_image": t, "y": y,
           "fps": fps, "motion_bucket_id": motion_bucket_id,
           "augmentation_level": aug}
    neg = {"context": jnp.zeros_like(pooled),
           "concat_latent_image": jnp.zeros_like(t), "y": y}
    latent = {"samples": jnp.zeros(
        (video_frames, t.shape[1], t.shape[2], 4), jnp.float32)}
    return (pos, neg, latent)


@register_node("VideoLinearCFGGuidance")
def video_linear_cfg_guidance(ctx: InferenceContext, node: WorkflowNode,
                              model=None):
    min_cfg = float(node.widgets[0]) if node.widgets else 1.0
    return (_add_patch(model, {"kind": "linear_cfg",
                               "sig": ("linear_cfg", min_cfg),
                               "min_cfg": min_cfg}),)


@register_node("ImageOnlyCheckpointSave")
def image_only_checkpoint_save(ctx: InferenceContext, node: WorkflowNode,
                               model=None, clip_vision=None, vae=None):
    """SVD-style checkpoint save: diffusion model + VAE + clip-vision under
    the SVD prefixes (nodes_video_model.py ImageOnlyCheckpointSave)."""
    import os

    import jax.numpy as jnp

    from stable_renderer_tpu.models.weights import flatten

    prefix = str(node.widgets[0]) if node.widgets else "checkpoints/sr_tpu_svd"
    name = os.path.basename(prefix) or "sr_tpu_svd"
    d = _save_dir(ctx, os.path.dirname(prefix) or "checkpoints")
    flat = {}
    for k, v in flatten(model["params"]).items():
        flat[f"model.diffusion_model.{k}"] = np.asarray(
            jnp.asarray(v).astype(jnp.float32))
    if vae is not None:
        for k, v in flatten(vae["params"]).items():
            flat[f"first_stage_model.{k}"] = np.asarray(
                jnp.asarray(v).astype(jnp.float32))
    if clip_vision is not None:
        inner = clip_vision["params"]
        inner = inner.get("vision_model", inner)
        for k, v in flatten(inner).items():
            flat["conditioner.embedders.0.open_clip.model.visual." + k] = (
                np.asarray(jnp.asarray(v).astype(jnp.float32)))
    path = os.path.join(d, f"{name}.safetensors")
    _save_safetensors(flat, path)
    return (path,)


# ---------------------------------------------------------------------------
# token merging (nodes_tomesd.py — ToMe for SD)


@register_node("TomePatchModel")
def tome_patch_model(ctx: InferenceContext, node: WorkflowNode, model=None):
    ratio = float(node.widgets[0]) if node.widgets else 0.3
    return (_add_patch(model, {"kind": "tomesd", "sig": ("tomesd", ratio),
                               "ratio": ratio}),)


def _make_tome_attn(p: dict):
    """Static-shape ToMe self-attention (nodes_tomesd.py
    bipartite_soft_matching_random2d): partition tokens into src/dst (one dst
    per 2x2 region, picked at trace time — the reference re-randomizes per
    call, a documented static-shape deviation), merge the r most-similar src
    tokens into their dst by mean, attend over the reduced set, then unmerge.
    r = ratio * N is static, so every gather/scatter has a fixed shape."""
    import random as pyrandom

    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.models.layers import attention

    ratio = p["ratio"]
    sx = sy = 2
    rng = pyrandom.Random(hash(p["sig"]) & 0xFFFFFFFF)

    def attn_all(q, k, v, heads, layer):
        bsz, n_tok, c = q.shape
        h = int(math.isqrt(n_tok))
        if h * h != n_tok or h % sy or (h // sy) < 2:
            return attention(q, k, v, heads)
        w = h
        hsy, wsx = h // sy, w // sx
        num_dst = hsy * wsx
        r = min(int(n_tok * ratio), n_tok - num_dst)
        if r <= 0:
            return attention(q, k, v, heads)

        # static dst pick: one token per (sy, sx) region
        import numpy as _np

        pick = _np.asarray([[rng.randrange(sy * sx) for _ in range(wsx)]
                            for _ in range(hsy)])
        flags = _np.zeros((hsy, wsx, sy * sx), _np.int64)
        _np.put_along_axis(flags, pick[..., None], -1, axis=2)
        flags = flags.reshape(hsy, wsx, sy, sx).transpose(0, 2, 1, 3)
        flags = flags.reshape(h, w).reshape(-1)
        order = _np.argsort(flags, kind="stable")  # dst (-1) first, then src
        b_idx = jnp.asarray(order[:num_dst])       # dst token indices (static)
        a_idx = jnp.asarray(order[num_dst:])       # src token indices (static)
        n_src = n_tok - num_dst

        metric = k / jnp.maximum(
            jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-6)
        a = metric[:, a_idx]                       # (B, Ns, C)
        b = metric[:, b_idx]                       # (B, Nd, C)
        scores = jnp.einsum("bsc,bdc->bsd", a, b)
        node_max = jnp.max(scores, axis=-1)        # (B, Ns)
        node_idx = jnp.argmax(scores, axis=-1)     # (B, Ns) best dst per src
        edge_idx = jnp.argsort(-node_max, axis=-1)  # most similar first
        src_idx = edge_idx[:, :r]                  # merged src rows
        unm_idx = edge_idx[:, r:]                  # kept src rows
        dst_of_src = jnp.take_along_axis(node_idx, src_idx, axis=1)  # (B, r)

        def merge(x):
            src = x[:, a_idx]
            dst = x[:, b_idx].astype(jnp.float32)
            unm = jnp.take_along_axis(src, unm_idx[..., None], axis=1)
            mrg = jnp.take_along_axis(src, src_idx[..., None], axis=1
                                      ).astype(jnp.float32)

            def one(dst_b, mrg_b, didx_b):
                sums = jax.ops.segment_sum(mrg_b, didx_b, num_segments=num_dst)
                cnts = jax.ops.segment_sum(jnp.ones((r,)), didx_b,
                                           num_segments=num_dst)
                return (dst_b + sums) / (1.0 + cnts)[:, None]

            dst = jax.vmap(one)(dst, mrg, dst_of_src).astype(x.dtype)
            return jnp.concatenate([unm, dst], axis=1)  # (B, Ns-r+Nd, C)

        def unmerge(x):
            unm = x[:, : n_src - r]
            dst = x[:, n_src - r:]
            mrg = jnp.take_along_axis(dst, dst_of_src[..., None], axis=1)
            # rebuild src order, then invert the dst|src permutation
            src = jnp.zeros((bsz, n_src, x.shape[-1]), x.dtype)
            src = jax.vmap(lambda s, i, u: s.at[i].set(u))(src, unm_idx, unm)
            src = jax.vmap(lambda s, i, m: s.at[i].set(m))(src, src_idx, mrg)
            out = jnp.zeros((bsz, n_tok, x.shape[-1]), x.dtype)
            out = out.at[:, b_idx].set(dst)
            out = out.at[:, a_idx].set(src)
            return out

        qm, km, vm = merge(q), merge(k), merge(v)
        return unmerge(attention(qm, km, vm, heads))

    return attn_all


# ---------------------------------------------------------------------------
# Stable Zero123 (nodes_stable3d.py — novel-view synthesis conditioning)


@register_node("StableZero123_Conditioning")
def stable_zero123_conditioning(ctx: InferenceContext, node: WorkflowNode,
                                clip_vision=None, init_image=None, vae=None):
    """Zero123 novel-view conditioning (nodes_stable3d.py
    StableZero123_Conditioning): CLIP-vision image embed concatenated with the
    4-dim camera embedding (polar offset, sin/cos azimuth, fixed 90deg) as the
    cross-attn context, init-image latent as c_concat. The Zero123 model's
    cc_projection (772 -> 768) is applied by the KSampler when the loaded
    model carries it (comfy model_base.py Zero123.extra_conds)."""
    import jax
    import jax.numpy as jnp

    w = node.widgets
    width = int(w[0]) if w else 256
    height = int(w[1]) if len(w) > 1 else 256
    batch_size = int(w[2]) if len(w) > 2 else 1
    elevation = float(w[3]) if len(w) > 3 else 0.0
    azimuth = float(w[4]) if len(w) > 4 else 0.0

    out = clip_vision["model"].encode_image(clip_vision["params"], init_image)
    pooled = out.image_embeds[:1][:, None, :]  # (1, 1, D)
    img = jnp.asarray(init_image)[..., :3]
    if img.shape[1:3] != (height, width):
        img = jax.image.resize(
            img, (img.shape[0], height, width, 3), method="bilinear")
    dtype = vae["params"]["quant_conv"]["weight"].dtype
    t = vae["vae"].encode(vae["params"], (img * 2.0 - 1.0).astype(dtype)
                          ).astype(jnp.float32)
    # Zero123 polar is 90 - elevation; embedding rows per nodes_stable3d.py
    cam = jnp.asarray([[
        jnp.deg2rad(jnp.asarray((90.0 - elevation) - 90.0)),
        jnp.sin(jnp.deg2rad(jnp.asarray(azimuth))),
        jnp.cos(jnp.deg2rad(jnp.asarray(azimuth))),
        jnp.deg2rad(jnp.asarray(90.0)),
    ]], jnp.float32)[None]  # (1, 1, 4)
    cond = jnp.concatenate([pooled, cam], axis=-1)
    pos = {"context": cond, "concat_latent_image": t}
    neg = {"context": jnp.zeros_like(pooled),
           "concat_latent_image": jnp.zeros_like(t)}
    latent = {"samples": jnp.zeros(
        (batch_size, t.shape[1], t.shape[2], 4), jnp.float32)}
    return (pos, neg, latent)


# ---------------------------------------------------------------------------
# Stable Cascade (nodes_stable_cascade.py + ldm/cascade)


@register_node("StableCascade_EmptyLatentImage")
def stable_cascade_empty_latent(ctx: InferenceContext, node: WorkflowNode):
    import jax.numpy as jnp

    w = node.widgets
    width = int(w[0]) if w else 1024
    height = int(w[1]) if len(w) > 1 else 1024
    compression = int(w[2]) if len(w) > 2 else 42
    batch = int(w[3]) if len(w) > 3 else 1
    c_latent = jnp.zeros((batch, height // compression, width // compression, 16))
    b_latent = jnp.zeros((batch, height // 4, width // 4, 4))
    return ({"samples": c_latent}, {"samples": b_latent})


@register_node("StableCascade_StageB_Conditioning")
def stable_cascade_stage_b_conditioning(ctx: InferenceContext,
                                        node: WorkflowNode,
                                        conditioning=None, stage_c=None):
    prior = stage_c["samples"] if isinstance(stage_c, dict) else stage_c
    return ({**(conditioning or {}), "stable_cascade_prior": prior},)


@register_node("CascadeStageLoader", "UNETLoader")
def cascade_stage_loader(ctx: InferenceContext, node: WorkflowNode):
    """UNet-only checkpoint loader (comfy UNETLoader) with Stable Cascade
    stage detection (clip_txt_mapper -> Stage C, effnet_mapper -> Stage B).
    Falls back to tiny random cascade stages offline, picked by the name
    containing 'stage_b' (else Stage C) — same fallback policy as the other
    loaders."""
    import jax

    from stable_renderer_tpu.models.cascade import (
        CascadeStageB,
        CascadeStageC,
        STAGE_B_CONFIG,
        STAGE_C_CONFIG,
        TINY_CASCADE_B_CONFIG,
        TINY_CASCADE_C_CONFIG,
    )
    from stable_renderer_tpu.models.sampling.schedules import ModelSamplingCascade

    name = str(node.widgets[0]) if node.widgets else ""
    path = _find_model_file(ctx, name)
    if path:
        import jax.numpy as jnp

        from stable_renderer_tpu.models.weights import (
            load_state_dict, nest, to_device)

        flat = load_state_dict(path)
        if any(k.startswith("model.diffusion_model.") for k in flat):
            flat = {k[len("model.diffusion_model."):]: v for k, v in flat.items()
                    if k.startswith("model.diffusion_model.")}
        if "clip_txt_mapper.weight" in flat:
            model = CascadeStageC(STAGE_C_CONFIG)
            ms = ModelSamplingCascade(shift=2.0)
        elif "effnet_mapper.0.weight" in flat:
            model = CascadeStageB(STAGE_B_CONFIG)
            ms = ModelSamplingCascade(shift=1.0)
        else:
            # plain SD UNet file (comfy UNETLoader's main use)
            from stable_renderer_tpu.models import UNetModel
            from stable_renderer_tpu.models.sampling import ModelSampling
            from stable_renderer_tpu.models.weights import detect_unet_config

            ucfg = detect_unet_config(
                {f"model.diffusion_model.{k}": v for k, v in flat.items()})
            return ({"unet": UNetModel(ucfg),
                     "params": to_device(nest(flat, ""), jnp.bfloat16),
                     "sampling": ModelSampling()},)
        return ({"unet": model, "params": to_device(nest(flat, ""), jnp.bfloat16),
                 "sampling": ms},)
    logger.warning(f"unet '{name}' not found; tiny random cascade stage")
    key = jax.random.PRNGKey(0)
    if "stage_b" in name.lower():
        model = CascadeStageB(TINY_CASCADE_B_CONFIG)
        ms = ModelSamplingCascade(shift=1.0)
    else:
        model = CascadeStageC(TINY_CASCADE_C_CONFIG)
        ms = ModelSamplingCascade(shift=2.0)
    return ({"unet": model, "params": model.init(key), "sampling": ms},)


# ---------------------------------------------------------------------------
# PhotoMaker (nodes_photomaker.py — identity-conditioned SDXL encoding)


def _pm_mlp(p: dict, x, residual: bool):
    from stable_renderer_tpu.models.layers import layer_norm, linear

    import jax

    h = layer_norm(p["layernorm"], x)
    h = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h)))
    return h + x if residual else h


def photomaker_fuse(p: dict, prompt_embeds, id_embeds, token_index: int):
    """FuseModule.fuse_fn + masked scatter at the trigger-token position
    (nodes_photomaker.py FuseModule): the class token's embedding is replaced
    by LN(mlp2(mlp1([token; id]) + token))."""
    import jax.numpy as jnp

    from stable_renderer_tpu.models.layers import layer_norm

    tok = prompt_embeds[:, token_index]              # (B, D)
    stacked = jnp.concatenate([tok, id_embeds], axis=-1)
    fused = _pm_mlp(p["mlp1"], stacked, residual=False) + tok
    fused = _pm_mlp(p["mlp2"], fused, residual=True)
    fused = layer_norm(p["layer_norm"], fused)
    return prompt_embeds.at[:, token_index].set(fused)


@register_node("PhotoMakerLoader")
def photomaker_loader(ctx: InferenceContext, node: WorkflowNode):
    """PhotoMaker ID encoder: ViT-L CLIP vision tower + dual projections
    (1024->768 and 1024->1280, concatenated to the SDXL 2048 embed width) +
    the FuseModule (nodes_photomaker.py PhotoMakerIDEncoder)."""
    import jax

    from stable_renderer_tpu.models.clip_vision import (
        CLIPVisionModel,
        TINY_VISION_CONFIG,
        VITL_CONFIG,
    )

    name = str(node.widgets[0]) if node.widgets else ""
    path = _find_model_file(ctx, name)
    if path:
        import jax.numpy as jnp

        from stable_renderer_tpu.models.weights import (
            load_state_dict, nest, to_device)

        flat = load_state_dict(path)
        flat = {k[len("id_encoder."):] if k.startswith("id_encoder.") else k: v
                for k, v in flat.items()}
        tree = to_device(nest(flat, ""), jnp.float32)
        return ({"vision": CLIPVisionModel(VITL_CONFIG), "params": tree},)
    logger.warning(f"photomaker '{name}' not found; tiny random encoder")
    import dataclasses

    import jax.numpy as jnp

    cfg = TINY_VISION_CONFIG
    vis = CLIPVisionModel(cfg)
    key = jax.random.PRNGKey(0)
    vp = vis.init(key)
    d1, d2 = cfg.projection_dim, cfg.projection_dim
    embed = d1 + d2

    def lin(i, o, k):
        return {"weight": jax.random.normal(jax.random.PRNGKey(k), (o, i)) * 0.02,
                "bias": jnp.zeros((o,))}

    def mlp(i, o, hdim, k):
        return {"layernorm": {"weight": jnp.ones((i,)), "bias": jnp.zeros((i,))},
                "fc1": lin(i, hdim, k), "fc2": lin(hdim, o, k + 1)}

    params = {
        **vp,
        "visual_projection_2": {"weight": jax.random.normal(
            jax.random.PRNGKey(9), (d2, cfg.hidden_size)) * 0.02},
        "fuse_module": {
            "mlp1": mlp(embed * 2, embed, embed, 20),
            "mlp2": mlp(embed, embed, embed, 22),
            "layer_norm": {"weight": jnp.ones((embed,)),
                           "bias": jnp.zeros((embed,))},
        },
    }
    return ({"vision": vis, "params": params},)


@register_node("PhotoMakerEncode")
def photomaker_encode(ctx: InferenceContext, node: WorkflowNode,
                      photomaker=None, image=None, clip=None):
    """Encode a prompt whose 'photomaker' trigger word's embedding is replaced
    by the fused identity embedding of the reference image
    (nodes_photomaker.py PhotoMakerEncode)."""
    import jax.numpy as jnp

    from stable_renderer_tpu.models.layers import linear
    from stable_renderer_tpu.workflow.executor import _encode_weighted

    text = str(node.widgets[0]) if node.widgets else "photograph of photomaker"
    special = "photomaker"
    words = text.split(" ")
    try:
        index = words.index(special) + 1
    except ValueError:
        index = -1
    clean = " ".join(w for w in words if w != special)
    cond = _encode_weighted(clip, [clean or text])
    if index <= 0 or photomaker is None or image is None:
        return ({"context": cond},)

    vis = photomaker["vision"]
    p = photomaker["params"]
    out = vis.encode_image(p, image)
    # dual projections concatenated (1024 -> 768 + 1280 = SDXL 2048 width);
    # encode_image already applied visual_projection -> image_embeds
    id2 = out.last_hidden_state[:, 0] @ p["visual_projection_2"]["weight"].T
    id_embeds = jnp.concatenate([out.image_embeds, id2], axis=-1)[:1]
    token_index = min(index - 1, cond.shape[1] - 1)
    if id_embeds.shape[-1] != cond.shape[-1]:
        # non-SDXL text towers: project the id embed onto the text width
        reps = -(-cond.shape[-1] // id_embeds.shape[-1])
        id_embeds = jnp.tile(id_embeds, (1, reps))[:, : cond.shape[-1]]
        fused = cond.at[:, token_index].set(
            0.5 * cond[:, token_index] + 0.5 * id_embeds)
        return ({"context": fused},)
    fused = photomaker_fuse(p["fuse_module"], cond, id_embeds, token_index)
    return ({"context": fused},)
