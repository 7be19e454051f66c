"""GFPGAN (clean) — blind face restoration: UNet prior + StyleGAN2-CSFT decoder.

Capability match for the reference's face-restore workhorse
(reference: comfyUI/comfy_extras/chainner_models/architecture/face/
gfpganv1_clean_arch.py — ResBlock :141-174, GFPGANv1Clean :177-370 — and
stylegan2_clean_arch.py — ModulatedConv2d :53-140, StyleConv :146-195,
ToRGB :198-231, StyleGAN2GeneratorClean :249-453 with the CSFT SFT-half
modulation). The "clean" architecture is what GFPGAN v1.2/1.3/1.4
checkpoints use (no custom CUDA ops; bilinear resampling).

TPU notes: the per-sample modulated conv (torch's grouped-conv trick) is a
vmap over the batch of per-sample conv kernels — faces run at batch 1-8 so
the weight modulation stays tiny; noise injection uses the checkpoint's
stored per-layer noise buffers (deterministic, reference
randomize_noise=False path) or a traced key."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, linear


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _resize_bilinear(x: jax.Array, scale: float) -> jax.Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, int(h * scale), int(w * scale), c), "bilinear")


def _channels(base: int, channel_multiplier: float, narrow: float) -> Dict[str, int]:
    """StyleGAN2 channel table (stylegan2_clean_arch.py:284-295), with
    ``base`` = 512 for real checkpoints (smaller in tests)."""
    return {
        "4": int(base * narrow),
        "8": int(base * narrow),
        "16": int(base * narrow),
        "32": int(base * narrow),
        "64": int(base / 2 * channel_multiplier * narrow),
        "128": int(base / 4 * channel_multiplier * narrow),
        "256": int(base / 8 * channel_multiplier * narrow),
        "512": int(base / 16 * channel_multiplier * narrow),
        "1024": int(base / 32 * channel_multiplier * narrow),
    }


@dataclass(frozen=True)
class GFPGANConfig:
    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: float = 2
    narrow: float = 1.0
    sft_half: bool = True
    different_w: bool = True
    base_channels: int = 512  # 512 for real checkpoints; small for tests

    @property
    def log_size(self) -> int:
        return int(math.log2(self.out_size))

    @property
    def num_latent(self) -> int:
        return self.log_size * 2 - 2


TINY_GFPGAN_CONFIG = GFPGANConfig(out_size=32, num_style_feat=16,
                                  channel_multiplier=2, base_channels=32)


def _modulated_conv(p: dict, x: jax.Array, style: jax.Array,
                    demodulate: bool = True, sample_mode: Optional[str] = None,
                    eps: float = 1e-8) -> jax.Array:
    """ModulatedConv2d (stylegan2_clean_arch.py:102-140). x: (B,H,W,Cin),
    style: (B, num_style_feat)."""
    w = p["weight"].astype(jnp.float32)  # (1, out, in, k, k)
    s = linear(p["modulation"], style).astype(jnp.float32)  # (B, Cin)
    weight = w * s[:, None, :, None, None]  # (B, out, in, k, k)
    if demodulate:
        demod = jax.lax.rsqrt(jnp.sum(weight ** 2, axis=(2, 3, 4)) + eps)
        weight = weight * demod[:, :, None, None, None]
    if sample_mode == "upsample":
        x = _resize_bilinear(x, 2.0)
    elif sample_mode == "downsample":
        x = _resize_bilinear(x, 0.5)
    k = w.shape[-1]
    pad = k // 2

    def one(xb, wb):
        return jax.lax.conv_general_dilated(
            xb[None].astype(jnp.float32), wb, window_strides=(1, 1),
            padding=[(pad, pad)] * 2,
            dimension_numbers=("NHWC", "OIHW", "NHWC"))[0]

    return jax.vmap(one)(x, weight).astype(x.dtype)


def _style_conv(p: dict, x: jax.Array, style: jax.Array, noise: jax.Array,
                sample_mode: Optional[str]) -> jax.Array:
    """StyleConv (stylegan2_clean_arch.py:146-195)."""
    out = _modulated_conv(p["modulated_conv"], x, style, demodulate=True,
                          sample_mode=sample_mode) * (2 ** 0.5)
    out = out + p["weight"].astype(out.dtype) * noise
    # bias stored (1, C, 1, 1) torch -> broadcast over NHWC channels
    out = out + p["bias"].reshape(1, 1, 1, -1).astype(out.dtype)
    return _lrelu(out)


def _to_rgb(p: dict, x: jax.Array, style: jax.Array,
            skip: Optional[jax.Array], upsample: bool) -> jax.Array:
    """ToRGB (stylegan2_clean_arch.py:198-231)."""
    out = _modulated_conv(p["modulated_conv"], x, style, demodulate=False)
    out = out + p["bias"].reshape(1, 1, 1, -1).astype(out.dtype)
    if skip is not None:
        if upsample:
            skip = _resize_bilinear(skip, 2.0)
        out = out + skip
    return out


def _res_block(p: dict, x: jax.Array, mode: str) -> jax.Array:
    """ResBlock with bilinear resample (gfpganv1_clean_arch.py:141-174)."""
    scale = 0.5 if mode == "down" else 2.0
    out = _lrelu(conv2d(p["conv1"], x, padding=1))
    out = _resize_bilinear(out, scale)
    out = _lrelu(conv2d(p["conv2"], out, padding=1))
    skip = conv2d(p["skip"], _resize_bilinear(x, scale))
    return out + skip


class GFPGAN:
    """GFPGANv1Clean (gfpganv1_clean_arch.py:177-370). apply() maps
    (B, S, S, 3) in [-1, 1] (the reference's normalized face crops) to the
    restored (B, S, S, 3)."""

    def __init__(self, config: GFPGANConfig = GFPGANConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return 1  # restores at the input face size

    def apply(self, params: dict, x: jax.Array,
              key: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.config
        ls = cfg.log_size
        b = x.shape[0]

        # --- UNet encoder ---
        feat = _lrelu(conv2d(params["conv_body_first"], x))
        skips: List[jax.Array] = []
        for i in range(ls - 2):
            feat = _res_block(params["conv_body_down"][str(i)], feat, "down")
            skips.insert(0, feat)
        feat = _lrelu(conv2d(params["final_conv"], feat, padding=1))

        # --- style code (different_w: one latent per decoder layer) ---
        # torch flattens NCHW: channel-major — transpose before reshape
        flat = feat.transpose(0, 3, 1, 2).reshape(b, -1)
        style_code = linear(params["final_linear"], flat)
        if cfg.different_w:
            latent = style_code.reshape(b, cfg.num_latent, cfg.num_style_feat)
        else:
            latent = jnp.repeat(style_code[:, None], cfg.num_latent, axis=1)

        # --- UNet decoder -> SFT conditions ---
        conditions: List[jax.Array] = []
        for i in range(ls - 2):
            feat = feat + skips[i]
            feat = _res_block(params["conv_body_up"][str(i)], feat, "up")
            sp = params["condition_scale"][str(i)]
            scale = conv2d(sp["2"], _lrelu(conv2d(sp["0"], feat, padding=1)),
                           padding=1)
            hp = params["condition_shift"][str(i)]
            shift = conv2d(hp["2"], _lrelu(conv2d(hp["0"], feat, padding=1)),
                           padding=1)
            conditions.extend([scale, shift])

        # --- StyleGAN2-CSFT decoder ---
        dec = params["stylegan_decoder"]

        def noise_for(layer_idx: int, shape) -> jax.Array:
            stored = dec.get("noises", {}).get(f"noise{layer_idx}")
            if stored is not None:
                return jnp.broadcast_to(
                    stored.reshape(1, *stored.shape[-2:], 1), shape)
            if key is not None:
                return jax.random.normal(jax.random.fold_in(key, layer_idx), shape)
            return jnp.zeros(shape)

        const = dec["constant_input"]["weight"]  # (1, C, 4, 4) torch
        out = jnp.broadcast_to(const.transpose(0, 2, 3, 1),
                               (b, 4, 4, const.shape[1]))
        out = _style_conv(dec["style_conv1"], out, latent[:, 0],
                          noise_for(0, (b, 4, 4, 1)), None)
        skip = _to_rgb(dec["to_rgb1"], out, latent[:, 1], None, upsample=False)

        li = 1
        n_pairs = ls - 2
        for gi in range(n_pairs):
            c1 = dec["style_convs"][str(2 * gi)]
            c2 = dec["style_convs"][str(2 * gi + 1)]
            res = 2 ** (gi + 3)
            out = _style_conv(c1, out, latent[:, li],
                              noise_for(2 * gi + 1, (b, res, res, 1)), "upsample")
            # SFT (conditions may cover fewer levels; ref :118-128)
            if li < len(conditions):
                cond_scale, cond_shift = conditions[li - 1], conditions[li]
                if cfg.sft_half:
                    half = out.shape[-1] // 2
                    same, sft = out[..., :half], out[..., half:]
                    sft = sft * cond_scale + cond_shift
                    out = jnp.concatenate([same, sft], -1)
                else:
                    out = out * cond_scale + cond_shift
            out = _style_conv(c2, out, latent[:, li + 1],
                              noise_for(2 * gi + 2, (b, res, res, 1)), None)
            skip = _to_rgb(dec["to_rgbs"][str(gi)], out, latent[:, li + 2],
                           skip, upsample=True)
            li += 2
        return skip

    # --- random init (torch layout) for tests ---

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 8192))
        ch = _channels(cfg.base_channels, cfg.channel_multiplier, cfg.narrow)
        uch = _channels(cfg.base_channels, cfg.channel_multiplier,
                        cfg.narrow * 0.5)
        ls = cfg.log_size
        nsf = cfg.num_style_feat

        def conv(i, o, k=3, bias=True):
            p = {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def lin(i, o):
            return {"weight": jax.random.normal(next(keys), (o, i), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        def mod_conv(i, o, k):
            return {"modulation": {"weight": jax.random.normal(next(keys), (i, nsf), dtype) * 0.05,
                                   "bias": jnp.ones((i,), dtype)},
                    "weight": jax.random.normal(next(keys), (1, o, i, k, k), dtype)
                    / math.sqrt(i * k * k)}

        def style_conv(i, o):
            return {"modulated_conv": mod_conv(i, o, 3),
                    "weight": jnp.zeros((), dtype),
                    "bias": jnp.zeros((1, o, 1, 1), dtype)}

        def to_rgb(i):
            return {"modulated_conv": mod_conv(i, 3, 1),
                    "bias": jnp.zeros((1, 3, 1, 1), dtype)}

        def res_block(i, o):
            return {"conv1": conv(i, i), "conv2": conv(i, o),
                    "skip": conv(i, o, 1, bias=False)}

        params: dict = {
            "conv_body_first": conv(3, uch[str(cfg.out_size)], 1),
        }
        in_c = uch[str(cfg.out_size)]
        down = {}
        for idx, i in enumerate(range(ls, 2, -1)):
            out_c = uch[str(2 ** (i - 1))]
            down[str(idx)] = res_block(in_c, out_c)
            in_c = out_c
        params["conv_body_down"] = down
        params["final_conv"] = conv(in_c, uch["4"])
        up = {}
        cs, csh, trgb = {}, {}, {}
        in_c = uch["4"]
        for idx, i in enumerate(range(3, ls + 1)):
            out_c = uch[str(2 ** i)]
            up[str(idx)] = res_block(in_c, out_c)
            # sft width = the UNet half-width channels (ref :300-305: uses the
            # unet channel table, which is exactly half the decoder's)
            sft_out = out_c if cfg.sft_half else out_c * 2
            cs[str(idx)] = {"0": conv(out_c, out_c), "2": conv(out_c, sft_out)}
            csh[str(idx)] = {"0": conv(out_c, out_c), "2": conv(out_c, sft_out)}
            trgb[str(idx)] = conv(out_c, 3, 1)
            in_c = out_c
        params["conv_body_up"] = up
        params["condition_scale"] = cs
        params["condition_shift"] = csh
        params["toRGB"] = trgb
        n_lat = cfg.num_latent if cfg.different_w else 1
        params["final_linear"] = lin(uch["4"] * 16, n_lat * nsf)

        dec: dict = {
            "constant_input": {"weight": jax.random.normal(
                next(keys), (1, ch["4"], 4, 4), dtype)},
            "style_conv1": style_conv(ch["4"], ch["4"]),
            "to_rgb1": to_rgb(ch["4"]),
            "style_convs": {}, "to_rgbs": {}, "noises": {},
        }
        n_layers = (ls - 2) * 2 + 1
        for layer_idx in range(n_layers):
            res = 2 ** ((layer_idx + 5) // 2)
            dec["noises"][f"noise{layer_idx}"] = jax.random.normal(
                next(keys), (1, 1, res, res), dtype)
        in_c = ch["4"]
        for gi, i in enumerate(range(3, ls + 1)):
            out_c = ch[str(2 ** i)]
            dec["style_convs"][str(2 * gi)] = style_conv(in_c, out_c)
            dec["style_convs"][str(2 * gi + 1)] = style_conv(out_c, out_c)
            dec["to_rgbs"][str(gi)] = to_rgb(out_c)
            in_c = out_c
        params["stylegan_decoder"] = dec
        return params


def detect_gfpgan_config(flat: Dict[str, np.ndarray]) -> Optional[GFPGANConfig]:
    if "stylegan_decoder.style_conv1.modulated_conv.weight" not in flat:
        return None
    n_down = len({k.split(".")[1] for k in flat
                  if k.startswith("conv_body_down.")})
    out_size = 2 ** (n_down + 2)
    nsf = flat["stylegan_decoder.style_conv1.modulated_conv.modulation.weight"].shape[1]
    base = flat["stylegan_decoder.constant_input.weight"].shape[1]
    return GFPGANConfig(out_size=out_size, num_style_feat=nsf,
                        base_channels=base)


def load_gfpgan(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    if any(k.startswith("params_ema.") for k in flat):
        flat = {k.split(".", 1)[1]: v for k, v in flat.items()
                if k.startswith("params_ema.")}
    cfg = detect_gfpgan_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not a GFPGAN (clean) checkpoint")
    # torch stores decoder noises as stylegan_decoder.noises.noiseN
    return GFPGAN(cfg), nest(flat)
