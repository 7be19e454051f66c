"""Stable Cascade (Würstchen v3) Stage C prior + Stage B decoder, TPU-native.

Capability match for the reference's cascade model family
(reference: comfy/ldm/cascade/common.py blocks, stage_c.py StageC,
stage_b.py StageB, comfy/supported_models.py StableCascade_C/_B,
comfy/model_sampling.py StableCascadeSampling,
comfy_extras/nodes_stable_cascade.py).

Architecture re-expressed as functional JAX over NHWC activations with the
checkpoint's torch parameter names verbatim (depthwise/channelwise ConvNeXt
ResBlocks with GlobalResponseNorm, cross/self AttnBlocks with kv_mapper,
adaptive scale-shift TimestepBlocks per t_cond, pixel-(un)shuffle patching):

  * Stage C — the text-conditional prior over 16-channel, 42x-compressed
    latents: 2 equal-width levels of [C,T,A] blocks, CLIP text sequence +
    pooled + image embeds mapped into one conditioning sequence.
  * Stage B — the decoder prior: 4 levels, conditioned on the Stage-C output
    through the effnet mapper (bilinear align-corners upsampling) + optional
    pixel guidance.

Both wrap into the shared denoiser assembly via ``apply(params, x, timesteps,
context, y, ...)`` — timesteps carry the cascade's continuous r in [0, 1]
(schedules.ModelSamplingCascade.timestep), prediction is eps.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import layer_norm, linear, silu
from stable_renderer_tpu.models.unet import AttnHooks


# ---------------------------------------------------------------------------
# primitives


def conv1x1(p: dict, x: jax.Array) -> jax.Array:
    """1x1 conv as a matmul on NHWC (weight (O, I, 1, 1))."""
    w = p["weight"].astype(x.dtype)
    out = x @ w[:, :, 0, 0].T
    if p.get("bias") is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def conv2d_generic(p: dict, x: jax.Array, stride: int = 1, padding: int = 0,
                   groups: int = 1) -> jax.Array:
    w = p["weight"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=groups)
    if p.get("bias") is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def conv_transpose2x(p: dict, x: jax.Array) -> jax.Array:
    """torch ConvTranspose2d(k=2, s=2) on NHWC; weight (I, O, 2, 2)."""
    w = p["weight"].astype(x.dtype)  # torch transpose-conv layout: (in, out, kh, kw)
    out = jax.lax.conv_transpose(
        x, jnp.transpose(w, (2, 3, 0, 1)), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if p.get("bias") is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def resize_bilinear_ac(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear resize with align_corners=True (torch F.interpolate semantics
    used throughout the cascade; jax.image.resize is half-pixel, so this is a
    manual gather-lerp)."""
    b, ih, iw, c = x.shape
    if (ih, iw) == (h, w):
        return x

    def axis_idx(out_n, in_n):
        if out_n == 1 or in_n == 1:
            return jnp.zeros((out_n,)), jnp.zeros((out_n,), jnp.int32), jnp.zeros((out_n,), jnp.int32)
        pos = jnp.arange(out_n) * ((in_n - 1) / (out_n - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_n - 1)
        hi = jnp.clip(lo + 1, 0, in_n - 1)
        return pos - lo, lo, hi

    fy, y0, y1 = axis_idx(h, ih)
    fx, x0, x1 = axis_idx(w, iw)
    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y0][:, :, x1] * fx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + \
        x[:, y1][:, :, x1] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


def pixel_unshuffle(x: jax.Array, p: int) -> jax.Array:
    """torch PixelUnshuffle on NHWC with torch's (C, py, px) channel order."""
    if p == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/p, W/p, C, py, px)
    return x.reshape(b, h // p, w // p, c * p * p)


def pixel_shuffle(x: jax.Array, p: int) -> jax.Array:
    if p == 1:
        return x
    b, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, h, w, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, py, W, px, C)
    return x.reshape(b, h * p, w * p, c)


def _ln2d(x: jax.Array) -> jax.Array:
    """LayerNorm2d, elementwise_affine=False (common.py LayerNorm2d_op)."""
    return layer_norm(None, x, eps=1e-6)


def global_response_norm(p: dict, x: jax.Array) -> jax.Array:
    """ConvNeXt-V2 GRN over NHWC tokens (common.py GlobalResponseNorm)."""
    x32 = x.astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(x32 * x32, axis=(1, 2), keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    gamma = p["gamma"].astype(jnp.float32).reshape(1, 1, 1, -1)
    beta = p["beta"].astype(jnp.float32).reshape(1, 1, 1, -1)
    return (gamma * (x32 * nx) + beta + x32).astype(x.dtype)


def _channelwise(p: dict, x: jax.Array) -> jax.Array:
    """Linear -> GELU -> GRN -> Linear (Sequential indices 0/2/4)."""
    h = linear(p["0"], x)
    h = jax.nn.gelu(h)
    h = global_response_norm(p["2"], h)
    return linear(p["4"], h)


def cascade_res_block(p: dict, x: jax.Array,
                      x_skip: Optional[jax.Array] = None) -> jax.Array:
    """common.py ResBlock: depthwise conv -> LN2d -> channelwise MLP + res."""
    c = x.shape[-1]
    k = p["depthwise"]["weight"].shape[-1]
    h = conv2d_generic(p["depthwise"], x, padding=k // 2, groups=c)
    h = _ln2d(h)
    if x_skip is not None:
        h = jnp.concatenate([h, x_skip], axis=-1)
    return x + _channelwise(p["channelwise"], h)


def cascade_attn_block(p: dict, x: jax.Array, clip: jax.Array, heads: int,
                       self_attn: bool) -> jax.Array:
    """common.py AttnBlock: kv_mapper(SiLU+Linear) conditioning; optionally
    prepend the image tokens to the K/V sequence (self_attn=True)."""
    from stable_renderer_tpu.models.layers import attention

    kv = linear(p["kv_mapper"]["1"], silu(clip))
    b, h, w, c = x.shape
    n = _ln2d(x).reshape(b, h * w, c)
    if self_attn:
        kv = jnp.concatenate([n, kv], axis=1)
    a = p["attention"]["attn"]
    q = linear(a["to_q"], n)
    k = linear(a["to_k"], kv)
    v = linear(a["to_v"], kv)
    out = linear(a["out_proj"], attention(q, k, v, heads))
    return x + out.reshape(b, h, w, c)


def cascade_ffn_block(p: dict, x: jax.Array) -> jax.Array:
    return x + _channelwise(p["channelwise"], _ln2d(x))


def cascade_timestep_block(p: dict, x: jax.Array, r_embed: jax.Array,
                           t_conds: Sequence[str]) -> jax.Array:
    """common.py TimestepBlock: adaptive scale-shift summed over t_conds."""
    parts = jnp.split(r_embed, 1 + len(t_conds), axis=1)
    ab = linear(p["mapper"], parts[0])
    for i, cname in enumerate(t_conds):
        ab = ab + linear(p[f"mapper_{cname}"], parts[i + 1])
    a, b_ = jnp.split(ab, 2, axis=-1)
    return x * (1.0 + a[:, None, None, :]) + b_[:, None, None, :]


def r_embedding(r: jax.Array, c_r: int, max_positions: float = 10000.0) -> jax.Array:
    """stage_c/b gen_r_embedding: sinusoidal over r*10000."""
    r = r.astype(jnp.float32) * max_positions
    half = c_r // 2
    freqs = jnp.exp(-math.log(max_positions) * jnp.arange(half) / (half - 1))
    args = r[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if c_r % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ---------------------------------------------------------------------------
# configs


@dataclass(frozen=True)
class CascadeConfig:
    c_in: int = 16
    c_out: int = 16
    c_r: int = 64
    patch_size: int = 1
    c_cond: int = 2048
    c_hidden: Tuple[int, ...] = (2048, 2048)
    nhead: Tuple[int, ...] = (32, 32)
    blocks_down: Tuple[int, ...] = (8, 24)
    blocks_up: Tuple[int, ...] = (24, 8)
    block_repeat_down: Tuple[int, ...] = (1, 1)
    block_repeat_up: Tuple[int, ...] = (1, 1)
    level_config: Tuple[str, ...] = ("CTA", "CTA")
    kernel_size: int = 3
    self_attn: bool = True
    t_conds: Tuple[str, ...] = ("sca", "crp")
    switch_level: Tuple[bool, ...] = (False,)
    # stage C conditioning widths
    c_clip_text: int = 1280
    c_clip_text_pooled: int = 1280
    c_clip_img: int = 768
    c_clip_seq: int = 4
    # stage B extras
    c_clip: int = 1280
    c_effnet: int = 16
    c_pixels: int = 3


STAGE_C_CONFIG = CascadeConfig()
"""The full 3.6B Stage C prior (stage_c.py defaults)."""

STAGE_C_LITE_CONFIG = CascadeConfig(
    c_cond=1536, c_hidden=(1536, 1536), nhead=(24, 24),
    blocks_down=(4, 12), blocks_up=(12, 4))
"""The 1B 'lite' Stage C (supported_models stable_cascade_stage_c lite)."""

STAGE_B_CONFIG = CascadeConfig(
    c_in=4, c_out=4, patch_size=2, c_cond=1280,
    c_hidden=(320, 640, 1280, 1280), nhead=(1, 1, 20, 20),
    blocks_down=(2, 6, 28, 6), blocks_up=(6, 28, 6, 2),
    block_repeat_down=(1, 1, 1, 1), block_repeat_up=(3, 3, 2, 2),
    level_config=("CT", "CT", "CTA", "CTA"), t_conds=("sca",),
    switch_level=(False, False, False))
"""The full Stage B decoder (stage_b.py defaults)."""

TINY_CASCADE_C_CONFIG = CascadeConfig(
    c_in=16, c_out=16, c_r=32, c_cond=64, c_hidden=(64, 64), nhead=(2, 2),
    blocks_down=(1, 1), blocks_up=(1, 1), level_config=("CTA", "CTA"),
    c_clip_text=48, c_clip_text_pooled=48, c_clip_img=32, c_clip_seq=2)

TINY_CASCADE_B_CONFIG = CascadeConfig(
    c_in=4, c_out=4, c_r=32, patch_size=2, c_cond=48,
    c_hidden=(32, 64), nhead=(1, 2), blocks_down=(1, 1), blocks_up=(1, 1),
    block_repeat_down=(1, 1), block_repeat_up=(1, 1),
    level_config=("CT", "CTA"), t_conds=("sca",), switch_level=(False,),
    c_clip=48, c_effnet=16, c_pixels=3)


# ---------------------------------------------------------------------------
# shared level walkers


def _run_blocks(p_level: dict, level_cfg: str, n_blocks: int, x, clip, r_embed,
                cfg: CascadeConfig, nhead: int, skip=None):
    idx = 0
    for blk_i in range(n_blocks):
        for kind in level_cfg:
            bp = p_level[str(idx)]
            if kind == "C":
                use_skip = skip if (blk_i == 0 and idx == 0 and skip is not None) else None
                x = cascade_res_block(bp, x, use_skip)
            elif kind == "T":
                x = cascade_timestep_block(bp, x, r_embed, cfg.t_conds)
            elif kind == "A":
                x = cascade_attn_block(bp, x, clip, nhead, cfg.self_attn)
            elif kind == "F":
                x = cascade_ffn_block(bp, x)
            idx += 1
    return x


class _CascadeBase:
    """Shared down/up walker (stage_c/b _down_encode/_up_decode)."""

    def __init__(self, config: CascadeConfig):
        self.config = config

    def _down(self, params, x, clip, r_embed):
        cfg = self.config
        outs = []
        for i in range(len(cfg.c_hidden)):
            if i > 0:
                ds = params["down_downscalers"][str(i)]
                x = _ln2d(x)
                if "blocks" in ds["1"]:  # stage C UpDownBlock2d (conv mapping)
                    x = conv1x1(ds["1"]["blocks"]["0"], x)
                    if cfg.switch_level[i - 1]:
                        x = resize_bilinear_ac(x, x.shape[1] // 2, x.shape[2] // 2)
                else:  # stage B strided conv
                    x = conv2d_generic(ds["1"], x, stride=2)
            reps = params["down_repeat_mappers"].get(str(i), {})
            for rep in range(len(reps) + 1):
                x = _run_blocks(params["down_blocks"][str(i)],
                                cfg.level_config[i], cfg.blocks_down[i],
                                x, clip, r_embed, cfg, cfg.nhead[i])
                if rep < len(reps):
                    x = conv1x1(reps[str(rep)], x)
            outs.insert(0, x)
        return outs

    def _up(self, params, outs, clip, r_embed):
        cfg = self.config
        n = len(cfg.c_hidden)
        x = outs[0]
        for oi, i in enumerate(reversed(range(n))):
            reps = params["up_repeat_mappers"].get(str(oi), {})
            skip = outs[oi] if oi > 0 else None
            for rep in range(len(reps) + 1):
                # the reference re-concats the level skip at EVERY repeat
                # iteration (stage_b.py _up_decode: k==0 per flattened list)
                if skip is not None and x.shape[1:3] != skip.shape[1:3]:
                    x = resize_bilinear_ac(x, skip.shape[1], skip.shape[2])
                x = _run_blocks(params["up_blocks"][str(oi)],
                                cfg.level_config[i], cfg.blocks_up[::-1][i],
                                x, clip, r_embed, cfg, cfg.nhead[i], skip=skip)
                if rep < len(reps):
                    x = conv1x1(reps[str(rep)], x)
            if i > 0:
                us = params["up_upscalers"][str(oi)]
                x = _ln2d(x)
                if "blocks" in us["1"]:  # stage C UpDownBlock2d
                    if cfg.switch_level[i - 1]:
                        x = resize_bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)
                    x = conv1x1(us["1"]["blocks"]["1"], x)
                else:  # stage B ConvTranspose2d
                    x = conv_transpose2x(us["1"], x)
        return x


class CascadeStageC(_CascadeBase):
    """Stage C prior with the shared denoiser contract: ``apply(params, x,
    timesteps, context, y)`` — context = CLIP-G text sequence
    (B, L, c_clip_text), y = pooled text embed (B, c_clip_text_pooled);
    timesteps = the cascade r in [0, 1]."""

    def apply(self, params, x, timesteps, context, y=None, control=None,
              hooks: AttnHooks = AttnHooks(), clip_img=None, **_):
        cfg = self.config
        b = x.shape[0]
        r_embed = r_embedding(timesteps, cfg.c_r).astype(x.dtype)
        for cname in cfg.t_conds:
            r_embed = jnp.concatenate(
                [r_embed, r_embedding(jnp.zeros_like(timesteps), cfg.c_r
                                      ).astype(x.dtype)], axis=1)
        txt = linear(params["clip_txt_mapper"], context.astype(x.dtype))
        pooled = (y if y is not None else
                  jnp.zeros((b, cfg.c_clip_text_pooled), x.dtype))
        if pooled.ndim == 2:
            pooled = pooled[:, None, :]
        pool_m = linear(params["clip_txt_pooled_mapper"], pooled.astype(x.dtype))
        pool_m = pool_m.reshape(b, pooled.shape[1] * cfg.c_clip_seq, -1)
        img = (clip_img if clip_img is not None else
               jnp.zeros((b, 1, cfg.c_clip_img), x.dtype))
        img_m = linear(params["clip_img_mapper"], img.astype(x.dtype))
        img_m = img_m.reshape(b, img.shape[1] * cfg.c_clip_seq, -1)
        clip = jnp.concatenate([txt, pool_m, img_m], axis=1)
        clip = layer_norm(None, clip, eps=1e-6)

        h = pixel_unshuffle(x, cfg.patch_size)
        h = conv1x1(params["embedding"]["1"], h)
        h = _ln2d(h)
        outs = self._down(params, h, clip, r_embed)
        h = self._up(params, outs, clip, r_embed)
        h = _ln2d(h)
        h = conv1x1(params["clf"]["1"], h)
        return pixel_shuffle(h, cfg.patch_size)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        return _init_cascade(self.config, key, dtype, stage="c")


class CascadeStageB(_CascadeBase):
    """Stage B decoder: ``apply(params, x, timesteps, context, effnet=...)`` —
    context = pooled CLIP embed (B, 1|L, c_clip); effnet = the Stage-C latent
    (B, hc, wc, 16) delivered through the denoiser's extra model inputs."""

    def apply(self, params, x, timesteps, context, y=None, control=None,
              hooks: AttnHooks = AttnHooks(), effnet=None, pixels=None, **_):
        cfg = self.config
        b = x.shape[0]
        if pixels is None:
            pixels = jnp.zeros((b, 8, 8, cfg.c_pixels), x.dtype)
        r_embed = r_embedding(timesteps, cfg.c_r).astype(x.dtype)
        for cname in cfg.t_conds:
            r_embed = jnp.concatenate(
                [r_embed, r_embedding(jnp.zeros_like(timesteps), cfg.c_r
                                      ).astype(x.dtype)], axis=1)
        clip = context
        if clip.ndim == 2:
            clip = clip[:, None, :]
        clip = linear(params["clip_mapper"], clip.astype(x.dtype))
        clip = clip.reshape(b, -1, cfg.c_cond)
        clip = layer_norm(None, clip, eps=1e-6)

        h = pixel_unshuffle(x, cfg.patch_size)
        h = conv1x1(params["embedding"]["1"], h)
        h = _ln2d(h)
        if effnet is None:
            effnet = jnp.zeros((b, h.shape[1], h.shape[2], cfg.c_effnet), x.dtype)
        eff = resize_bilinear_ac(effnet.astype(x.dtype), h.shape[1], h.shape[2])
        eff = conv1x1(params["effnet_mapper"]["0"], eff)
        eff = jax.nn.gelu(eff)
        eff = conv1x1(params["effnet_mapper"]["2"], eff)
        h = h + _ln2d(eff)
        px = conv1x1(params["pixels_mapper"]["0"], pixels.astype(x.dtype))
        px = jax.nn.gelu(px)
        px = conv1x1(params["pixels_mapper"]["2"], px)
        h = h + resize_bilinear_ac(_ln2d(px), h.shape[1], h.shape[2])
        outs = self._down(params, h, clip, r_embed)
        h = self._up(params, outs, clip, r_embed)
        h = _ln2d(h)
        h = conv1x1(params["clf"]["1"], h)
        return pixel_shuffle(h, cfg.patch_size)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        return _init_cascade(self.config, key, dtype, stage="b")


# ---------------------------------------------------------------------------
# init (checkpoint-layout param trees)


def _init_cascade(cfg: CascadeConfig, key: jax.Array, dtype, stage: str) -> dict:
    kg = [key]

    def nk():
        kg[0], sub = jax.random.split(kg[0])
        return sub

    def lin(i, o):
        return {"weight": jax.random.normal(nk(), (o, i), dtype) / math.sqrt(i),
                "bias": jnp.zeros((o,), dtype)}

    def conv(i, o, k=1, groups=1):
        return {"weight": jax.random.normal(nk(), (o, i // groups, k, k), dtype)
                * (1.0 / math.sqrt(i * k * k / groups)),
                "bias": jnp.zeros((o,), dtype)}

    def grn(c):
        return {"gamma": jnp.zeros((1, 1, 1, c), dtype),
                "beta": jnp.zeros((1, 1, 1, c), dtype)}

    def channelwise(c, c_skip=0):
        return {"0": lin(c + c_skip, c * 4), "2": grn(c * 4), "4": lin(c * 4, c)}

    def res(c, c_skip=0):
        return {"depthwise": conv(c, c, k=cfg.kernel_size, groups=c),
                "channelwise": channelwise(c, c_skip)}

    def attn(c):
        return {"kv_mapper": {"1": lin(cfg.c_cond, c)},
                "attention": {"attn": {"to_q": lin(c, c), "to_k": lin(c, c),
                                       "to_v": lin(c, c),
                                       "out_proj": lin(c, c)}}}

    def tsb(c):
        p = {"mapper": lin(cfg.c_r, c * 2)}
        for cname in cfg.t_conds:
            p[f"mapper_{cname}"] = lin(cfg.c_r, c * 2)
        return p

    def level_blocks(i, n_blocks, skip_first: bool):
        out = {}
        idx = 0
        c = cfg.c_hidden[i]
        for blk_i in range(n_blocks):
            for kind in cfg.level_config[i]:
                if kind == "C":
                    c_skip = c if (skip_first and blk_i == 0 and idx == 0) else 0
                    out[str(idx)] = res(c, c_skip)
                elif kind == "T":
                    out[str(idx)] = tsb(c)
                elif kind == "A":
                    out[str(idx)] = attn(c)
                elif kind == "F":
                    out[str(idx)] = {"channelwise": channelwise(c)}
                idx += 1
        return out

    n = len(cfg.c_hidden)
    params: dict = {
        "embedding": {"1": conv(cfg.c_in * cfg.patch_size ** 2, cfg.c_hidden[0])},
        "clf": {"1": conv(cfg.c_hidden[0], cfg.c_out * cfg.patch_size ** 2)},
        "down_blocks": {}, "down_downscalers": {}, "down_repeat_mappers": {},
        "up_blocks": {}, "up_upscalers": {}, "up_repeat_mappers": {},
    }
    if stage == "c":
        params["clip_txt_mapper"] = lin(cfg.c_clip_text, cfg.c_cond)
        params["clip_txt_pooled_mapper"] = lin(cfg.c_clip_text_pooled,
                                               cfg.c_cond * cfg.c_clip_seq)
        params["clip_img_mapper"] = lin(cfg.c_clip_img,
                                        cfg.c_cond * cfg.c_clip_seq)
    else:
        params["clip_mapper"] = lin(cfg.c_clip, cfg.c_cond * cfg.c_clip_seq)
        params["effnet_mapper"] = {"0": conv(cfg.c_effnet, cfg.c_hidden[0] * 4),
                                   "2": conv(cfg.c_hidden[0] * 4, cfg.c_hidden[0])}
        params["pixels_mapper"] = {"0": conv(cfg.c_pixels, cfg.c_hidden[0] * 4),
                                   "2": conv(cfg.c_hidden[0] * 4, cfg.c_hidden[0])}
    for i in range(n):
        params["down_blocks"][str(i)] = level_blocks(i, cfg.blocks_down[i], False)
        if i > 0:
            if stage == "c":
                params["down_downscalers"][str(i)] = {
                    "1": {"blocks": {"0": conv(cfg.c_hidden[i - 1], cfg.c_hidden[i])}}}
            else:
                params["down_downscalers"][str(i)] = {
                    "1": conv(cfg.c_hidden[i - 1], cfg.c_hidden[i], k=2)}
        reps = {}
        for r_i in range(cfg.block_repeat_down[i] - 1):
            reps[str(r_i)] = conv(cfg.c_hidden[i], cfg.c_hidden[i])
        params["down_repeat_mappers"][str(i)] = reps
    for oi, i in enumerate(reversed(range(n))):
        params["up_blocks"][str(oi)] = level_blocks(
            i, cfg.blocks_up[::-1][i], skip_first=(i < n - 1))
        if i > 0:
            if stage == "c":
                params["up_upscalers"][str(oi)] = {
                    "1": {"blocks": {"1": conv(cfg.c_hidden[i], cfg.c_hidden[i - 1])}}}
            else:
                # torch ConvTranspose2d weight layout (in, out, kh, kw)
                w = jax.random.normal(
                    nk(), (cfg.c_hidden[i], cfg.c_hidden[i - 1], 2, 2), dtype
                ) * (1.0 / math.sqrt(cfg.c_hidden[i] * 4))
                params["up_upscalers"][str(oi)] = {
                    "1": {"weight": w, "bias": jnp.zeros((cfg.c_hidden[i - 1],), dtype)}}
        reps = {}
        for r_i in range(cfg.block_repeat_up[::-1][i] - 1):
            reps[str(r_i)] = conv(cfg.c_hidden[i], cfg.c_hidden[i])
        params["up_repeat_mappers"][str(oi)] = reps
    return params
