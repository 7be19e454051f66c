"""OmniSR — omni-axis (spatial + channel, block + grid) attention SR.

Capability match for the reference's chainner OmniSR
(reference: comfyUI/comfy_extras/chainner_models/architecture/OmniSR/ —
OSA.py MBConv :129-196, window/grid Attention :199-290, Channel_Attention(+
grid) :377-496, OSA_Block :497-577; OSAG.py :20-61 with ESA (esa.py:27-57);
OmniSR.py assembly + detection :23-135). Functional JAX, NHWC, torch param
layout (the OSA_Block Sequential indices preserved).

One OSA block = MBConv -> block-window attention -> gated dwconv FFN ->
windowed channel attention -> FFN -> grid attention (dilated windows) ->
FFN -> grid channel attention -> FFN, each residual with pre-norm."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, layer_norm, linear
from stable_renderer_tpu.models.swinir import pixel_shuffle


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _dwconv(p: dict, x: jax.Array, padding: int = 1) -> jax.Array:
    c = x.shape[-1]
    w = p["weight"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "OIHW", "NHWC"), feature_group_count=c)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


@dataclass(frozen=True)
class OmniSRConfig:
    num_feat: int = 64
    res_num: int = 5
    block_num: int = 1
    window_size: int = 8
    up_scale: int = 4
    in_ch: int = 3
    with_pe: bool = True


TINY_OMNISR_CONFIG = OmniSRConfig(num_feat=16, res_num=1, window_size=4,
                                  up_scale=2)


def _mbconv(p: dict, x: jax.Array) -> jax.Array:
    """MBConv expansion_rate=1 + squeeze-excite, residual (OSA.py:129-196)."""
    net = p["net"]
    h = _gelu(conv2d(net["0"], x))
    h = _gelu(_dwconv(net["2"], h))
    # squeeze-excite
    g = jnp.mean(h, axis=(1, 2))
    g = jax.nn.silu(g @ net["4"]["gate"]["1"]["weight"].astype(g.dtype).T)
    g = jax.nn.sigmoid(g @ net["4"]["gate"]["3"]["weight"].astype(g.dtype).T)
    h = h * g[:, None, None, :]
    h = conv2d(net["5"], h)
    return h + x


def _rel_pos_indices(ws: int) -> np.ndarray:
    pos = np.arange(ws)
    grid = np.stack(np.meshgrid(pos, pos, indexing="ij")).reshape(2, -1).T
    rel = grid[:, None, :] - grid[None, :, :] + ws - 1
    return (rel * np.array([2 * ws - 1, 1])).sum(-1)


def _window_attention(p: dict, x: jax.Array, heads: int, ws: int,
                      with_pe: bool) -> jax.Array:
    """Windowed token attention over (nW*B, N, C) (OSA.py:199-290)."""
    b, n, c = x.shape
    d = c // heads
    qkv = x @ p["to_qkv"]["weight"].astype(x.dtype).T
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def h_of(t):
        return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    q, k, v = h_of(q) * (d ** -0.5), h_of(k), h_of(v)
    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    if with_pe:
        bias = p["rel_pos_bias"]["weight"][_rel_pos_indices(ws)]
        sim = sim + bias.transpose(2, 0, 1)[None]
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return out @ p["to_out"]["0"]["weight"].astype(out.dtype).T


def _block_partition(x: jax.Array, ws: int, grid: bool):
    """block windows: (x w1)(y w2); grid windows: (w1 x)(w2 y)."""
    b, h, w, c = x.shape
    if grid:
        t = x.reshape(b, ws, h // ws, ws, w // ws, c).transpose(0, 2, 4, 1, 3, 5)
    else:
        t = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(-1, ws * ws, c)


def _block_reverse(t: jax.Array, ws: int, h: int, w: int, grid: bool):
    c = t.shape[-1]
    t = t.reshape(-1, h // ws, w // ws, ws, ws, c)
    if grid:
        t = t.transpose(0, 3, 1, 4, 2, 5)
    else:
        t = t.transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(-1, h, w, c)


def _channel_attention(p: dict, x: jax.Array, heads: int, ws: int,
                       grid: bool) -> jax.Array:
    """Per-window channel attention (OSA.py:377-496)."""
    b, h, w, c = x.shape
    d = c // heads
    qkv = _dwconv(p["qkv_dwconv"], conv2d(p["qkv"], x))
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def part(t):
        win = _block_partition(t, ws, grid)  # (B*nW, N, C)
        nw = win.shape[0] // b
        # (b, nW, heads, d, N): channels attend, window tokens contract
        return win.reshape(b, nw, ws * ws, heads, d).transpose(0, 1, 3, 4, 2)

    qh, kh, vh = part(q), part(k), part(v)
    qh = qh / jnp.maximum(jnp.linalg.norm(qh, axis=-1, keepdims=True), 1e-12)
    kh = kh / jnp.maximum(jnp.linalg.norm(kh, axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum("bwhdn,bwhen->bwhde", qh, kh) * p["temperature"]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bwhde,bwhen->bwhdn", attn, vh)
    out = out.transpose(0, 1, 4, 2, 3).reshape(-1, ws * ws, c)
    out = _block_reverse(out, ws, h, w, grid)
    return conv2d(p["project_out"], out)


def _gated_ffn(p: dict, x: jax.Array) -> jax.Array:
    """Gated dwconv feed-forward (OSA.py:91-114)."""
    h = conv2d(p["project_in"], x)
    h = _dwconv(p["dwconv"], h)
    x1, x2 = jnp.split(h, 2, axis=-1)
    return conv2d(p["project_out"], _gelu(x1) * x2)


def _osa_block(p: dict, x: jax.Array, heads: int, ws: int,
               with_pe: bool) -> jax.Array:
    """OSA_Block.layer Sequential (OSA.py:497-577). x: (B, H, W, C)."""
    b, h, w, c = x.shape
    lp = p["layer"]
    x = _mbconv(lp["0"], x)
    # block attention (PreNormResidual over window tokens)
    win = _block_partition(x, ws, grid=False)
    win = win + _window_attention(lp["2"]["fn"], layer_norm(lp["2"]["norm"], win),
                                  4, ws, with_pe)  # dim_head = dim/4 -> 4 heads
    x = _block_reverse(win, ws, h, w, grid=False)
    x = x + _gated_ffn(lp["4"]["fn"], layer_norm(lp["4"]["norm"], x))
    x = x + _channel_attention(lp["5"]["fn"], layer_norm(lp["5"]["norm"], x),
                               4, ws, grid=False)
    x = x + _gated_ffn(lp["6"]["fn"], layer_norm(lp["6"]["norm"], x))
    # grid attention
    win = _block_partition(x, ws, grid=True)
    win = win + _window_attention(lp["8"]["fn"], layer_norm(lp["8"]["norm"], win),
                                  4, ws, with_pe)
    x = _block_reverse(win, ws, h, w, grid=True)
    x = x + _gated_ffn(lp["10"]["fn"], layer_norm(lp["10"]["norm"], x))
    x = x + _channel_attention(lp["11"]["fn"], layer_norm(lp["11"]["norm"], x),
                               4, ws, grid=True)
    x = x + _gated_ffn(lp["12"]["fn"], layer_norm(lp["12"]["norm"], x))
    return x


def _esa(p: dict, x: jax.Array) -> jax.Array:
    """Enhanced Spatial Attention (esa.py:27-57)."""
    b, h, w, c = x.shape
    c1_ = conv2d(p["conv1"], x)
    c1 = conv2d(p["conv2"], c1_, stride=2, padding=0)
    # max_pool2d kernel 7 stride 3
    vmax = jax.lax.reduce_window(
        c1, -jnp.inf, jax.lax.max, (1, 7, 7, 1), (1, 3, 3, 1), "VALID")
    c3 = conv2d(p["conv3"], vmax, padding=1)
    c3 = jax.image.resize(c3, (b, h, w, c3.shape[-1]), "bilinear")
    cf = conv2d(p["conv_f"], c1_)
    m = jax.nn.sigmoid(conv2d(p["conv4"], c3 + cf))
    return x * m


class OmniSR:
    def __init__(self, config: OmniSRConfig = OmniSRConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return self.config.up_scale

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        cfg = self.config
        ws = cfg.window_size
        b, h_in, w_in, _ = x.shape
        ph, pw = (ws - h_in % ws) % ws, (ws - w_in % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        residual = conv2d(params["input"], x, padding=1)
        out = residual
        for i in range(cfg.res_num):
            gp = params["residual_layer"][str(i)]
            g = out
            for j in range(cfg.block_num):
                g = _osa_block(gp["residual_layer"][str(j)], g, 4, ws, cfg.with_pe)
            g = conv2d(gp["residual_layer"][str(cfg.block_num)], g)
            g = g + out
            out = _esa(gp["esa"], g)
        out = conv2d(params["output"], out, padding=1) + residual
        out = pixel_shuffle(conv2d(params["up"]["0"], out, padding=1),
                            cfg.up_scale)
        s = cfg.up_scale
        return out[:, : h_in * s, : w_in * s]

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 16384))

        def conv(i, o, k=3, bias=True):
            p = {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def dconv(c, bias=False):
            p = {"weight": jax.random.normal(next(keys), (c, 1, 3, 3), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((c,), dtype)
            return p

        def lin(i, o, bias=False):
            p = {"weight": jax.random.normal(next(keys), (o, i), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        c = cfg.num_feat
        ws = cfg.window_size

        def mbconv():
            hid = c  # expansion_rate=1
            sq = max(int(hid * 0.25), 1)
            return {"net": {"0": conv(c, hid, 1), "2": dconv(hid, bias=True),
                            "4": {"gate": {"1": lin(hid, sq), "3": lin(sq, hid)}},
                            "5": conv(hid, c, 1)}}

        def attn():
            heads = 4
            return {"to_qkv": lin(c, 3 * c), "to_out": {"0": lin(c, c)},
                    "rel_pos_bias": {"weight": jax.random.normal(
                        next(keys), ((2 * ws - 1) ** 2, heads), dtype) * 0.02}}

        def chan_attn():
            return {"temperature": jnp.ones((4, 1, 1), dtype),
                    "qkv": conv(c, 3 * c, 1, bias=False),
                    "qkv_dwconv": dconv(3 * c),
                    "project_out": conv(c, c, 1, bias=False)}

        def gffn():
            return {"project_in": conv(c, 2 * c, 1, bias=False),
                    "dwconv": dconv(2 * c),
                    "project_out": conv(c, c, 1, bias=False)}

        def osa():
            return {"layer": {
                "0": mbconv(),
                "2": {"norm": norm(c), "fn": attn()},
                "4": {"norm": norm(c), "fn": gffn()},
                "5": {"norm": norm(c), "fn": chan_attn()},
                "6": {"norm": norm(c), "fn": gffn()},
                "8": {"norm": norm(c), "fn": attn()},
                "10": {"norm": norm(c), "fn": gffn()},
                "11": {"norm": norm(c), "fn": chan_attn()},
                "12": {"norm": norm(c), "fn": gffn()},
            }}

        esa_c = max(c // 4, 16)

        def esa():
            return {"conv1": conv(c, esa_c, 1), "conv_f": conv(esa_c, esa_c, 1),
                    "conv2": conv(esa_c, esa_c), "conv3": conv(esa_c, esa_c),
                    "conv4": conv(esa_c, c, 1)}

        def osag():
            rl = {str(j): osa() for j in range(cfg.block_num)}
            rl[str(cfg.block_num)] = conv(c, c, 1)
            return {"residual_layer": rl, "esa": esa()}

        return {
            "input": conv(cfg.in_ch, c),
            "residual_layer": {str(i): osag() for i in range(cfg.res_num)},
            "output": conv(c, c),
            "up": {"0": conv(c, cfg.in_ch * cfg.up_scale ** 2, bias=False)},
        }


def detect_omnisr_config(flat: Dict[str, np.ndarray]) -> Optional[OmniSRConfig]:
    if "input.weight" not in flat or "up.0.weight" not in flat:
        return None
    if not any(k.startswith("residual_layer.0.residual_layer.0.layer.")
               for k in flat):
        return None
    num_feat = flat["input.weight"].shape[0]
    in_ch = flat["input.weight"].shape[1]
    up_scale = int(math.sqrt(flat["up.0.weight"].shape[0] / in_ch))
    res_num = 1 + max(int(k.split(".")[1]) for k in flat
                      if k.startswith("residual_layer."))
    pe_key = "residual_layer.0.residual_layer.0.layer.2.fn.rel_pos_bias.weight"
    if pe_key in flat:
        window_size = int((math.sqrt(flat[pe_key].shape[0]) + 1) / 2)
        with_pe = True
    else:
        window_size, with_pe = 8, False
    # inner indices are 0..block_num-1 (OSA blocks) + block_num (1x1 conv)
    idxs = {int(k.split(".")[3]) for k in flat
            if k.startswith("residual_layer.0.residual_layer.")}
    block_num = max(idxs)
    return OmniSRConfig(num_feat=num_feat, res_num=res_num,
                        block_num=max(block_num, 1), window_size=window_size,
                        up_scale=up_scale, in_ch=in_ch, with_pe=with_pe)


def load_omnisr(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    if any(k.startswith(("params_ema.", "params.")) for k in flat):
        flat = {k.split(".", 1)[1]: v for k, v in flat.items()
                if k.startswith(("params_ema.", "params."))}
    cfg = detect_omnisr_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not an OmniSR checkpoint")
    return OmniSR(cfg), nest(flat)
