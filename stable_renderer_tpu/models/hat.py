"""HAT — Hybrid Attention Transformer super-resolution.

Capability match for the reference's chainner HAT
(reference: comfyUI/comfy_extras/chainner_models/architecture/HAT.py —
ChannelAttention/CAB :44-79, WindowAttention :141-232, HAB :234-364,
OCAB overlapping cross-attention :405-537, RHAG :643-745, HAT assembly +
state-dict detection :847-1140, rpi tables :1142-1188). Functional JAX,
NHWC, torch param layout.

HAT = SwinIR-style shifted-window attention blocks, each augmented with an
RCAN channel-attention conv branch (scaled by conv_scale), plus one
Overlapping Cross-Attention Block per residual group where queries use
non-overlapping windows but keys/values come from larger overlapping
windows (torch Unfold -> a strided gather here).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, layer_norm, linear
from stable_renderer_tpu.models.swinir import (
    RGB_MEAN,
    _rel_pos_index,
    _shift_attn_mask,
    _window_attention,
    _window_partition,
    _window_reverse,
    pixel_shuffle,
)


@dataclass(frozen=True)
class HATConfig:
    embed_dim: int = 180
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    overlap_ratio: float = 0.5
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    upscale: int = 4
    num_feat: int = 64
    img_range: float = 1.0
    in_chans: int = 3
    out_chans: int = 3
    resi_connection: str = "1conv"


TINY_HAT_CONFIG = HATConfig(embed_dim=16, depths=(2,), num_heads=(2,),
                            window_size=4, overlap_ratio=0.5, compress_ratio=2,
                            squeeze_factor=4, mlp_ratio=2.0, upscale=2,
                            num_feat=8)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _channel_attention(p: dict, x: jax.Array) -> jax.Array:
    """RCAN channel attention (HAT.py:44-64): squeeze-excite with sigmoid."""
    y = jnp.mean(x, axis=(1, 2), keepdims=True)
    y = jax.nn.relu(conv2d(p["1"], y))
    y = jax.nn.sigmoid(conv2d(p["3"], y))
    return x * y


def _cab(p: dict, x: jax.Array) -> jax.Array:
    """CAB (HAT.py:66-79): conv -> GELU -> conv -> channel attention."""
    h = _gelu(conv2d(p["cab"]["0"], x, padding=1))
    h = conv2d(p["cab"]["2"], h, padding=1)
    return _channel_attention(p["cab"]["3"]["attention"], h)


def _mlp(p: dict, x: jax.Array) -> jax.Array:
    return linear(p["fc2"], _gelu(linear(p["fc1"], x)))


def _hab(p: dict, x: jax.Array, hw: Tuple[int, int], heads: int, ws: int,
         shift: int, conv_scale: float) -> jax.Array:
    """Hybrid Attention Block (HAT.py:312-364). x: (B, H*W, C)."""
    h, w = hw
    b, l, c = x.shape
    shortcut = x
    n1 = layer_norm(p["norm1"], x).reshape(b, h, w, c)
    conv_x = _cab(p["conv_block"], n1).reshape(b, l, c)
    if shift > 0:
        xs = jnp.roll(n1, (-shift, -shift), axis=(1, 2))
        mask = _shift_attn_mask(h, w, ws, shift)
    else:
        xs, mask = n1, None
    win = _window_partition(xs, ws)
    win = _window_attention(p["attn"], win, heads, ws, mask)
    xs = _window_reverse(win, ws, h, w)
    if shift > 0:
        xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
    x = shortcut + xs.reshape(b, l, c) + conv_x * conv_scale
    return x + _mlp(p["mlp"], layer_norm(p["norm2"], x))


def _rpi_oca(ws: int, ow: int) -> np.ndarray:
    """OCA relative position index (HAT.py:1160-1188)."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(ow), np.arange(ow), indexing="ij")).reshape(2, -1)
    rel = (ce[:, None, :] - co[:, :, None]).transpose(1, 2, 0)
    rel[:, :, 0] += ws - ow + 1
    rel[:, :, 1] += ws - ow + 1
    rel[:, :, 0] *= ws + ow - 1
    # the reference indexes the bias table with NEGATIVE indices, relying on
    # torch's python-style wrap-around — reproduce via modulo (jnp clamps
    # negative gather indices instead of wrapping)
    return rel.sum(-1) % ((ws + ow - 1) ** 2)


def _extract_overlap_windows(x: jax.Array, ws: int, ow: int) -> jax.Array:
    """torch Unfold(kernel=ow, stride=ws, padding=(ow-ws)//2) as a strided
    gather: (B,H,W,C) -> (B, nW, ow*ow, C)."""
    pad = (ow - ws) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    b, _, _, c = xp.shape
    nh, nw = x.shape[1] // ws, x.shape[2] // ws
    rows = (jnp.arange(nh) * ws)[:, None] + jnp.arange(ow)[None, :]  # (nh, ow)
    cols = (jnp.arange(nw) * ws)[:, None] + jnp.arange(ow)[None, :]  # (nw, ow)
    out = xp[:, rows[:, None, :, None], cols[None, :, None, :], :]
    return out.reshape(b, nh * nw, ow * ow, c)


def _ocab(p: dict, x: jax.Array, hw: Tuple[int, int], heads: int, ws: int,
          overlap_ratio: float) -> jax.Array:
    """Overlapping Cross-Attention Block (HAT.py:457-537)."""
    h, w = hw
    b, l, c = x.shape
    ow = int(ws * overlap_ratio) + ws
    shortcut = x
    n1 = layer_norm(p["norm1"], x).reshape(b, h, w, c)
    qkv = linear(p["qkv"], n1)
    q, k, v = qkv[..., :c], qkv[..., c: 2 * c], qkv[..., 2 * c:]

    qw = _window_partition(q, ws)  # (B*nW, ws*ws, C)
    kw = _extract_overlap_windows(k, ws, ow).reshape(-1, ow * ow, c)
    vw = _extract_overlap_windows(v, ws, ow).reshape(-1, ow * ow, c)

    d = c // heads
    qh = qw.reshape(-1, ws * ws, heads, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    kh = kw.reshape(-1, ow * ow, heads, d).transpose(0, 2, 1, 3)
    vh = vw.reshape(-1, ow * ow, heads, d).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh)
    idx = _rpi_oca(ws, ow).reshape(-1)
    bias = p["relative_position_bias_table"][idx].reshape(ws * ws, ow * ow, heads)
    attn = attn + bias.transpose(2, 0, 1)[None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
    out = _window_reverse(out, ws, h, w).reshape(b, l, c)
    x = linear(p["proj"], out) + shortcut
    return x + _mlp(p["mlp"], layer_norm(p["norm2"], x))


class HAT:
    def __init__(self, config: HATConfig = HATConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return self.config.upscale

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        cfg = self.config
        ws = cfg.window_size
        b, h_in, w_in, _ = x.shape
        mean = (jnp.asarray(RGB_MEAN, x.dtype) if cfg.in_chans == 3
                else jnp.zeros((x.shape[-1],), x.dtype))
        x = (x - mean) * cfg.img_range
        ph, pw = (ws - h_in % ws) % ws, (ws - w_in % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = x.shape[1], x.shape[2]

        feat = conv2d(params["conv_first"], x, padding=1)
        t = feat.reshape(b, h * w, cfg.embed_dim)
        for rg, depth in enumerate(cfg.depths):
            lp = params["layers"][str(rg)]
            res = t
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else ws // 2
                if min(h, w) <= ws:
                    shift = 0
                t = _hab(lp["residual_group"]["blocks"][str(bi)], t, (h, w),
                         cfg.num_heads[rg], ws, shift, cfg.conv_scale)
            t = _ocab(lp["residual_group"]["overlap_attn"], t, (h, w),
                      cfg.num_heads[rg], ws, cfg.overlap_ratio)
            timg = t.reshape(b, h, w, cfg.embed_dim)
            if cfg.resi_connection == "1conv":
                timg = conv2d(lp["conv"], timg, padding=1)
            t = res + timg.reshape(b, h * w, cfg.embed_dim)
        t = layer_norm(params["norm"], t)
        deep = t.reshape(b, h, w, cfg.embed_dim)

        feat = conv2d(params["conv_after_body"], deep, padding=1) + feat
        up = jax.nn.leaky_relu(
            conv2d(params["conv_before_upsample"]["0"], feat, padding=1), 0.01)
        for s in range(int(math.log2(cfg.upscale))):
            up = pixel_shuffle(conv2d(params["upsample"][str(s * 2)], up, padding=1), 2)
        out = conv2d(params["conv_last"], up, padding=1)
        out = out / cfg.img_range + mean[: out.shape[-1]]
        return out[:, : h_in * cfg.upscale, : w_in * cfg.upscale]

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 16384))

        def conv(i, o, k=3):
            return {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        def lin(i, o):
            return {"weight": jax.random.normal(next(keys), (o, i), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        e, ws = cfg.embed_dim, cfg.window_size
        ow = int(ws * cfg.overlap_ratio) + ws
        hidden = int(e * cfg.mlp_ratio)
        sq = max(e // cfg.squeeze_factor, 1)
        cr = max(e // cfg.compress_ratio, 1)

        def hab(heads):
            return {
                "norm1": norm(e), "norm2": norm(e),
                "attn": {
                    "qkv": lin(e, 3 * e), "proj": lin(e, e),
                    "relative_position_bias_table": jax.random.normal(
                        next(keys), ((2 * ws - 1) ** 2, heads), dtype) * 0.02,
                },
                "conv_block": {"cab": {
                    "0": conv(e, cr), "2": conv(cr, e),
                    "3": {"attention": {"1": conv(e, sq, 1), "3": conv(sq, e, 1)}},
                }},
                "mlp": {"fc1": lin(e, hidden), "fc2": lin(hidden, e)},
            }

        def ocab(heads):
            return {
                "norm1": norm(e), "norm2": norm(e),
                "qkv": lin(e, 3 * e), "proj": lin(e, e),
                "relative_position_bias_table": jax.random.normal(
                    next(keys), ((ws + ow - 1) ** 2, heads), dtype) * 0.02,
                "mlp": {"fc1": lin(e, int(e * 2)), "fc2": lin(int(e * 2), e)},
            }

        layers = {
            str(rg): {
                "residual_group": {
                    "blocks": {str(bi): hab(cfg.num_heads[rg])
                               for bi in range(depth)},
                    "overlap_attn": ocab(cfg.num_heads[rg]),
                },
                "conv": conv(e, e),
            }
            for rg, depth in enumerate(cfg.depths)
        }
        return {
            "conv_first": conv(cfg.in_chans, e),
            "layers": layers,
            "norm": norm(e),
            "conv_after_body": conv(e, e),
            "conv_before_upsample": {"0": conv(e, cfg.num_feat)},
            "upsample": {str(s * 2): conv(cfg.num_feat, 4 * cfg.num_feat)
                         for s in range(int(math.log2(cfg.upscale)))},
            "conv_last": conv(cfg.num_feat, cfg.out_chans),
        }


def detect_hat_config(flat: Dict[str, np.ndarray]) -> Optional[HATConfig]:
    """Auto-detect a HAT checkpoint (HAT.py:905-1000): the OCAB per-group
    overlap_attn keys distinguish HAT from SwinIR."""
    if "layers.0.residual_group.overlap_attn.norm1.weight" not in flat:
        return None
    keys = flat.keys()
    embed_dim = flat["conv_first.weight"].shape[0]
    in_chans = flat["conv_first.weight"].shape[1]
    out_chans = flat["conv_last.weight"].shape[0]
    num_feat = (flat["conv_before_upsample.0.weight"].shape[0]
                if "conv_before_upsample.0.weight" in keys else 64)
    upscale = 1
    for k in keys:
        if "upsample" in k and "conv" not in k and "bias" not in k:
            upscale *= int(math.sqrt(flat[k].shape[0] // num_feat))
    max_layer = max_block = 0
    for k in keys:
        mt = re.match(r"layers.(\d+).residual_group.blocks.(\d+).norm1.weight", k)
        if mt:
            max_layer = max(max_layer, int(mt.group(1)))
            max_block = max(max_block, int(mt.group(2)))
    depths = tuple(max_block + 1 for _ in range(max_layer + 1))
    sa_tab = flat["layers.0.residual_group.blocks.0.attn.relative_position_bias_table"]
    heads = tuple(sa_tab.shape[-1] for _ in range(max_layer + 1))
    window_size = (math.isqrt(int(sa_tab.shape[0])) + 1) // 2
    # (ws + ow - 1)^2 rows -> ow; overlap_ratio = (ow - ws) / ws
    oca_tab = flat["layers.0.residual_group.overlap_attn.relative_position_bias_table"]
    ow = math.isqrt(int(oca_tab.shape[0])) + 1 - window_size
    overlap_ratio = (ow - window_size) / window_size
    mlp_ratio = float(
        flat["layers.0.residual_group.blocks.0.mlp.fc1.bias"].shape[0] / embed_dim)
    cab0 = flat["layers.0.residual_group.blocks.0.conv_block.cab.0.weight"]
    compress_ratio = max(embed_dim // cab0.shape[0], 1)
    sq_w = flat["layers.0.residual_group.blocks.0.conv_block.cab.3.attention.1.weight"]
    squeeze_factor = max(embed_dim // sq_w.shape[0], 1)
    return HATConfig(
        embed_dim=embed_dim, depths=depths, num_heads=heads,
        window_size=window_size, overlap_ratio=overlap_ratio,
        compress_ratio=compress_ratio, squeeze_factor=squeeze_factor,
        mlp_ratio=mlp_ratio, upscale=max(upscale, 1), num_feat=num_feat,
        in_chans=in_chans, out_chans=out_chans)


def load_hat(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    if any(k.startswith(("params_ema.", "params.")) for k in flat):
        flat = {k.split(".", 1)[1]: v for k, v in flat.items()
                if k.startswith(("params_ema.", "params."))}
    cfg = detect_hat_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not a HAT checkpoint")
    flat = {k: v for k, v in flat.items()
            if not (k.endswith("relative_position_index_SA")
                    or k.endswith("relative_position_index_OCA")
                    or k.endswith("attn_mask"))}
    return HAT(cfg), nest(flat)
