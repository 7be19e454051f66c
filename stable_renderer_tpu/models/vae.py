"""AutoencoderKL (the SD1.5 VAE) as functional JAX.

Capability match for the reference's VAE wrapper
(reference: comfy/sd.py:192-352 VAE.encode/decode + tiled fallback,
comfy/ldm/models/autoencoder.py, comfy/ldm/modules/diffusionmodules/model.py
Encoder/Decoder). Param tree mirrors the checkpoint layout under
``first_stage_model.`` — encoder.*, decoder.*, quant_conv, post_quant_conv.

Latent scaling follows SD1.5: latent = 0.18215 * mean(encode(x)) and
decode(latent / 0.18215) (comfy/latent_formats.py SD15).
NHWC activations; attention blocks are single-head over H*W tokens.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import (
    attention,
    avg_pool_2x,
    conv2d,
    group_norm,
    norm_act_conv,
    silu,
    upsample_nearest_2x,
)


@dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    scale_factor: float = 0.18215


SD15_VAE_CONFIG = VAEConfig()
# same topology, SDXL latent scale (comfy latent_formats.py SDXL.scale_factor)
SDXL_VAE_CONFIG = VAEConfig(scale_factor=0.13025)
TINY_VAE_CONFIG = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)


def _resnet(p: dict, x: jax.Array) -> jax.Array:
    h = norm_act_conv(p["norm1"], p["conv1"], x)
    h = norm_act_conv(p["norm2"], p["conv2"], h)
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def _attn_block(p: dict, x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    n = group_norm(p["norm"], x)
    # q/k/v are 1x1 convs in the checkpoint
    q = conv2d(p["q"], n).reshape(b, h * w, c)
    k = conv2d(p["k"], n).reshape(b, h * w, c)
    v = conv2d(p["v"], n).reshape(b, h * w, c)
    out = attention(q, k, v, heads=1).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], out)


class VAE:
    def __init__(self, config: VAEConfig = SD15_VAE_CONFIG):
        self.config = config

    # --- encoder -----------------------------------------------------------

    def encode_moments(self, params: dict, x: jax.Array) -> jax.Array:
        """pixels (B, H, W, 3) in [-1, 1] -> moments (B, H/8, W/8, 2*z)."""
        cfg = self.config
        e = params["encoder"]
        h = conv2d(e["conv_in"], x, padding=1)
        for level in range(len(cfg.ch_mult)):
            lvl = e["down"][str(level)]
            for i in range(cfg.num_res_blocks):
                h = _resnet(lvl["block"][str(i)], h)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1) then stride-2 conv (model.py Downsample);
                # routed through layers.conv2d so the int8 path applies too
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = conv2d(lvl["downsample"]["conv"], hp, stride=2, padding=0)
        h = _resnet(e["mid"]["block_1"], h)
        h = _attn_block(e["mid"]["attn_1"], h)
        h = _resnet(e["mid"]["block_2"], h)
        h = conv2d(e["conv_out"], silu(group_norm(e["norm_out"], h)), padding=1)
        return conv2d(params["quant_conv"], h)

    def encode(self, params: dict, x: jax.Array, key: jax.Array | None = None) -> jax.Array:
        """pixels -> scaled latent (mean of the posterior; sampled if key given)."""
        moments = self.encode_moments(params, x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return mean * self.config.scale_factor

    # --- decoder -----------------------------------------------------------

    def decode(self, params: dict, z: jax.Array) -> jax.Array:
        """scaled latent (B, h, w, z) -> pixels (B, 8h, 8w, 3) in [-1, 1]."""
        cfg = self.config
        z = z / self.config.scale_factor
        d = params["decoder"]
        h = conv2d(params["post_quant_conv"], z)
        h = conv2d(d["conv_in"], h, padding=1)
        h = _resnet(d["mid"]["block_1"], h)
        h = _attn_block(d["mid"]["attn_1"], h)
        h = _resnet(d["mid"]["block_2"], h)
        for level in reversed(range(len(cfg.ch_mult))):
            lvl = d["up"][str(level)]
            for i in range(cfg.num_res_blocks + 1):
                h = _resnet(lvl["block"][str(i)], h)
            if level != 0:
                h = conv2d(lvl["upsample"]["conv"], upsample_nearest_2x(h), padding=1)
        h = conv2d(d["conv_out"], silu(group_norm(d["norm_out"], h)), padding=1)
        return h

    # --- tiled variants (reference comfy/sd.py VAE tiled fallback) ----------

    def decode_tiled(
        self,
        params: dict,
        z: jax.Array,
        tile: int = 64,
        overlap: int = 16,
    ) -> jax.Array:
        """Decode in overlapping latent tiles with linear blend — the reference's
        out-of-memory fallback (comfy/sd.py:245-280 decode_tiled). Host-side loop
        over tiles; each tile decode is the compiled decoder."""
        import numpy as np

        b, h, w, c = z.shape
        f = 2 ** (len(self.config.ch_mult) - 1)
        overlap = min(overlap, tile // 2)  # keep the stride positive
        step = max(tile - overlap, 1)
        out = np.zeros((b, h * f, w * f, 3), np.float32)
        weight = np.zeros((b, h * f, w * f, 1), np.float32)
        ramp = np.minimum(np.arange(1, tile * f + 1) / max(overlap * f, 1), 1.0)
        tile_w = np.minimum(ramp, ramp[::-1])[None, :, None]

        y = 0
        while y < h:
            x = 0
            y0 = min(y, max(h - tile, 0))
            while x < w:
                x0 = min(x, max(w - tile, 0))
                zt = z[:, y0 : y0 + tile, x0 : x0 + tile]
                dec = np.asarray(self.decode(params, zt).astype(jnp.float32))
                th, tw = dec.shape[1], dec.shape[2]
                wgt = (tile_w[:, :th] * tile_w[:, :tw].transpose(0, 2, 1))[..., None]
                out[:, y0 * f : y0 * f + th, x0 * f : x0 * f + tw] += dec * wgt
                weight[:, y0 * f : y0 * f + th, x0 * f : x0 * f + tw] += wgt
                x += step
            y += step
        return jnp.asarray(out / np.maximum(weight, 1e-6))

    def encode_tiled(
        self,
        params: dict,
        x: jax.Array,
        tile: int = 512,
        overlap: int = 64,
    ) -> jax.Array:
        """Encode in overlapping pixel tiles (comfy/sd.py encode_tiled)."""
        import numpy as np

        b, h, w, _ = x.shape
        f = 2 ** (len(self.config.ch_mult) - 1)
        overlap = min(overlap, tile // 2)  # keep the stride positive
        step = max(tile - overlap, 1)
        zc = self.config.embed_dim
        out = np.zeros((b, h // f, w // f, zc), np.float32)
        weight = np.zeros((b, h // f, w // f, 1), np.float32)
        ramp = np.minimum(np.arange(1, tile // f + 1) / max(overlap // f, 1), 1.0)
        tile_w = np.minimum(ramp, ramp[::-1])[None, :, None]

        y = 0
        while y < h:
            x0c = 0
            y0 = min(y, max(h - tile, 0))
            while x0c < w:
                x0 = min(x0c, max(w - tile, 0))
                xt = x[:, y0 : y0 + tile, x0 : x0 + tile]
                enc = np.asarray(self.encode(params, xt).astype(jnp.float32))
                th, tw = enc.shape[1], enc.shape[2]
                wgt = (tile_w[:, :th] * tile_w[:, :tw].transpose(0, 2, 1))[..., None]
                out[:, y0 // f : y0 // f + th, x0 // f : x0 // f + tw] += enc * wgt
                weight[:, y0 // f : y0 // f + th, x0 // f : x0 // f + tw] += wgt
                x0c += step
            y += step
        return jnp.asarray(out / np.maximum(weight, 1e-6))

    # --- init --------------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        from stable_renderer_tpu.models.unet import _KeyGen

        keys = _KeyGen(key)

        def conv(i, o, k=3):
            w = jax.random.normal(keys(), (o, i, k, k), dtype) * (1.0 / jnp.sqrt(i * k * k))
            return {"weight": w, "bias": jnp.zeros((o,), dtype)}

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        def resnet(i, o):
            p = {"norm1": norm(i), "conv1": conv(i, o), "norm2": norm(o), "conv2": conv(o, o)}
            if i != o:
                p["nin_shortcut"] = conv(i, o, 1)
            return p

        def attn(c):
            return {
                "norm": norm(c),
                "q": conv(c, c, 1),
                "k": conv(c, c, 1),
                "v": conv(c, c, 1),
                "proj_out": conv(c, c, 1),
            }

        z = cfg.z_channels
        # encoder
        enc: dict = {"conv_in": conv(3, cfg.ch), "down": {}}
        ch = cfg.ch
        for level, mult in enumerate(cfg.ch_mult):
            out_ch = cfg.ch * mult
            lvl: dict = {"block": {}}
            for i in range(cfg.num_res_blocks):
                lvl["block"][str(i)] = resnet(ch, out_ch)
                ch = out_ch
            if level != len(cfg.ch_mult) - 1:
                lvl["downsample"] = {"conv": conv(ch, ch)}
            enc["down"][str(level)] = lvl
        enc["mid"] = {"block_1": resnet(ch, ch), "attn_1": attn(ch), "block_2": resnet(ch, ch)}
        enc["norm_out"] = norm(ch)
        enc["conv_out"] = conv(ch, 2 * z)
        # decoder
        dec: dict = {"conv_in": conv(z, ch)}
        dec["mid"] = {"block_1": resnet(ch, ch), "attn_1": attn(ch), "block_2": resnet(ch, ch)}
        dec["up"] = {}
        for level in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.ch * cfg.ch_mult[level]
            lvl = {"block": {}}
            for i in range(cfg.num_res_blocks + 1):
                lvl["block"][str(i)] = resnet(ch, out_ch)
                ch = out_ch
            if level != 0:
                lvl["upsample"] = {"conv": conv(ch, ch)}
            dec["up"][str(level)] = lvl
        dec["norm_out"] = norm(ch)
        dec["conv_out"] = conv(ch, 3)
        return {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": conv(2 * z, 2 * z, 1),
            "post_quant_conv": conv(z, z, 1),
        }
