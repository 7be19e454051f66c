"""DAT — Dual Aggregation Transformer super-resolution.

Capability match for the reference's chainner DAT
(reference: comfyUI/comfy_extras/chainner_models/architecture/DAT.py —
SpatialGate/SGFN :43-111, DynamicPosBias :114-153, Spatial_Attention
:156-290, Adaptive_Spatial_Attention :293-575, Adaptive_Channel_Attention
:578-681, DATB/ResidualGroup :682-847, DAT assembly + state-dict detection
:897-1182). Functional JAX, NHWC, torch param layout.

Architecture: residual groups alternate DSTB (dual rectangle-window spatial
attention over split channel halves, with dynamic relative position bias)
and DCTB (XCiT-style channel attention), each fused with a depthwise-conv
branch through the Adaptive Interaction Module (sigmoid channel/spatial
maps). Shift masks and position-bias coordinate tables are trace-time numpy.
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
from stable_renderer_tpu.models.swinir import RGB_MEAN, pixel_shuffle


@dataclass(frozen=True)
class DATConfig:
    embed_dim: int = 180
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (2, 2, 2, 2)
    split_size: Tuple[int, int] = (2, 4)
    expansion_factor: float = 4.0
    upsampler: str = "pixelshuffle"  # or 'pixelshuffledirect'
    upscale: int = 2
    num_feat: int = 64
    img_range: float = 1.0
    in_chans: int = 3
    out_chans: int = 3
    resi_connection: str = "1conv"


TINY_DAT_CONFIG = DATConfig(embed_dim=16, depths=(2,), num_heads=(2,),
                            split_size=(2, 4), expansion_factor=2.0,
                            upsampler="pixelshuffledirect", upscale=2,
                            num_feat=16)


def _bn(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """BatchNorm2d inference over NHWC channels."""
    mean = p["running_mean"].astype(jnp.float32)
    var = p["running_var"].astype(jnp.float32)
    w = p["weight"].astype(jnp.float32)
    b = p["bias"].astype(jnp.float32)
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps) * w + b
    return out.astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _dwconv(p: dict, x: jax.Array, k: int = 3, padding: int = 1) -> jax.Array:
    """Depthwise conv: torch weight (C, 1, k, k), groups=C."""
    c = x.shape[-1]
    w = p["weight"].astype(x.dtype)  # (C,1,k,k)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "OIHW", "NHWC"), feature_group_count=c)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _dwconv_bn_gelu(p: dict, x: jax.Array) -> jax.Array:
    """Sequential(dw Conv2d, BatchNorm2d, GELU) — the conv branch."""
    return _gelu(_bn(p["1"], _dwconv(p["0"], x)))


def _channel_interaction(p: dict, x: jax.Array) -> jax.Array:
    """Sequential(AdaptiveAvgPool, 1x1, BN, GELU, 1x1) -> (B,1,1,C) map."""
    pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
    h = conv2d(p["1"], pooled)
    h = _gelu(_bn(p["2"], h))
    return conv2d(p["4"], h)


def _spatial_interaction(p: dict, x: jax.Array) -> jax.Array:
    """Sequential(1x1, BN, GELU, 1x1) -> (B,H,W,1) map."""
    h = conv2d(p["0"], x)
    h = _gelu(_bn(p["1"], h))
    return conv2d(p["3"], h)


def _spatial_gate(p: dict, x: jax.Array, h: int, w: int) -> jax.Array:
    """SpatialGate (DAT.py:43-68): x (B,N,C) -> (B,N,C/2)."""
    c = x.shape[-1]
    x1, x2 = x[..., : c // 2], x[..., c // 2:]
    n2 = layer_norm(p["norm"], x2)
    img = n2.reshape(x.shape[0], h, w, c // 2)
    img = _dwconv(p["conv"], img)
    return x1 * img.reshape(x.shape[0], h * w, c // 2)


def _sgfn(p: dict, x: jax.Array, h: int, w: int) -> jax.Array:
    x = _gelu(linear(p["fc1"], x))
    x = _spatial_gate(p["sg"], x, h, w)
    return linear(p["fc2"], x)


def _dyn_pos_bias(p: dict, biases: jax.Array) -> jax.Array:
    """DynamicPosBias, non-residual path (DAT.py:145-153)."""
    pos = linear(p["pos_proj"], biases)
    pos = linear(p["pos1"]["2"], jax.nn.relu(layer_norm(p["pos1"]["0"], pos)))
    pos = linear(p["pos2"]["2"], jax.nn.relu(layer_norm(p["pos2"]["0"], pos)))
    return linear(p["pos3"]["2"], jax.nn.relu(layer_norm(p["pos3"]["0"], pos)))


def _rect_mask(h: int, w: int, hsp: int, wsp: int, sh: int, sw: int) -> np.ndarray:
    """Shift mask for rectangle windows (calculate_mask, DAT.py:395-468)."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -hsp), slice(-hsp, -sh), slice(-sh, None)):
        for wsl in (slice(0, -wsp), slice(-wsp, -sw), slice(-sw, None)):
            img[hs, wsl] = cnt
            cnt += 1
    mw = img.reshape(h // hsp, hsp, w // wsp, wsp).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, hsp * wsp)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _spatial_attention(p: dict, q, k, v, h: int, w: int, hsp: int, wsp: int,
                       heads: int, mask: Optional[np.ndarray]) -> jax.Array:
    """Rectangle-window attention with dynamic position bias
    (Spatial_Attention.forward, DAT.py:239-290). q/k/v: (B, H*W, C)."""
    b, _, c = q.shape
    d = c // heads

    def win(t):
        t = t.reshape(b, h // hsp, hsp, w // wsp, wsp, c)
        t = t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, hsp * wsp, c)
        return t.reshape(-1, hsp * wsp, heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = win(q) * (d ** -0.5), win(k), win(v)
    attn = jnp.einsum("whnd,whmd->whnm", qh, kh)
    # dynamic relative position bias over the (2H-1)x(2W-1) coordinate table
    bias_h = np.arange(1 - hsp, hsp)
    bias_w = np.arange(1 - wsp, wsp)
    coords = np.stack(np.meshgrid(bias_h, bias_w, indexing="ij")).reshape(2, -1).T
    pos = _dyn_pos_bias(p["pos"], jnp.asarray(coords, jnp.float32))  # (T, heads)
    ch = np.stack(np.meshgrid(np.arange(hsp), np.arange(wsp), indexing="ij"))
    flat = ch.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += hsp - 1
    rel[:, :, 1] += wsp - 1
    rel[:, :, 0] *= 2 * wsp - 1
    idx = rel.sum(-1).reshape(-1)
    n = hsp * wsp
    rpb = pos[idx].reshape(n, n, heads).transpose(2, 0, 1)
    attn = attn + rpb[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(-1, nw, heads, n, n) + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(-1, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(-1, n, c)
    out = out.reshape(b, h // hsp, w // wsp, hsp, wsp, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _adaptive_spatial_attention(p: dict, x: jax.Array, h: int, w: int,
                                heads: int, split: Tuple[int, int],
                                do_shift: bool) -> jax.Array:
    """DSTB attention (DAT.py:473-575). x: (B, H*W, C)."""
    b, l, c = x.shape
    shift = (split[0] // 2, split[1] // 2)
    qkv = linear(p["qkv"], x).reshape(b, l, 3, c).transpose(2, 0, 1, 3)
    q, k, v = qkv[0], qkv[1], qkv[2]
    v_img = v.reshape(b, h, w, c)

    mx = max(split)
    ph = (mx - h % mx) % mx
    pw = (mx - w % mx) % mx
    hh, ww = h + ph, w + pw

    def pad_img(t):
        return jnp.pad(t.reshape(b, h, w, c), ((0, 0), (0, ph), (0, pw), (0, 0)))

    qi, ki, vi = pad_img(q), pad_img(k), pad_img(v)
    half = c // 2
    hsp0, wsp0 = split[0], split[1]   # branch 0
    hsp1, wsp1 = split[1], split[0]   # branch 1 (swapped)
    if do_shift:
        def roll0(t):
            return jnp.roll(t[..., :half], (-shift[0], -shift[1]), axis=(1, 2))

        def roll1(t):
            return jnp.roll(t[..., half:], (-shift[1], -shift[0]), axis=(1, 2))

        m0 = _rect_mask(hh, ww, hsp0, wsp0, shift[0], shift[1])
        m1 = _rect_mask(hh, ww, hsp1, wsp1, shift[1], shift[0])
        x0 = _spatial_attention(
            p["attns"]["0"],
            *(roll0(t).reshape(b, hh * ww, half) for t in (qi, ki, vi)),
            hh, ww, hsp0, wsp0, heads // 2, m0)
        x1 = _spatial_attention(
            p["attns"]["1"],
            *(roll1(t).reshape(b, hh * ww, half) for t in (qi, ki, vi)),
            hh, ww, hsp1, wsp1, heads // 2, m1)
        x0 = jnp.roll(x0, (shift[0], shift[1]), axis=(1, 2))[:, :h, :w]
        x1 = jnp.roll(x1, (shift[1], shift[0]), axis=(1, 2))[:, :h, :w]
    else:
        x0 = _spatial_attention(
            p["attns"]["0"],
            *(t[..., :half].reshape(b, hh * ww, half) for t in (qi, ki, vi)),
            hh, ww, hsp0, wsp0, heads // 2, None)[:, :h, :w]
        x1 = _spatial_attention(
            p["attns"]["1"],
            *(t[..., half:].reshape(b, hh * ww, half) for t in (qi, ki, vi)),
            hh, ww, hsp1, wsp1, heads // 2, None)[:, :h, :w]
    attened = jnp.concatenate([x0, x1], -1).reshape(b, l, c)

    # Adaptive Interaction Module
    conv_x = _dwconv_bn_gelu(p["dwconv"], v_img)
    channel_map = _channel_interaction(p["channel_interaction"], conv_x)
    spatial_map = _spatial_interaction(
        p["spatial_interaction"], attened.reshape(b, h, w, c))
    attened = attened * jax.nn.sigmoid(channel_map.reshape(b, 1, c))
    conv_x = conv_x * jax.nn.sigmoid(spatial_map)
    out = attened + conv_x.reshape(b, l, c)
    return linear(p["proj"], out)


def _adaptive_channel_attention(p: dict, x: jax.Array, h: int, w: int,
                                heads: int) -> jax.Array:
    """DCTB attention (DAT.py:627-681): XCiT channel attention + AIM."""
    b, n, c = x.shape
    d = c // heads
    qkv = linear(p["qkv"], x).reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    # transpose: channels attend over channels (B, heads, d, N)
    qt = q.transpose(0, 1, 3, 2)
    kt = k.transpose(0, 1, 3, 2)
    vt = v.transpose(0, 1, 3, 2)
    qt = qt / jnp.maximum(jnp.linalg.norm(qt, axis=-1, keepdims=True), 1e-12)
    kt = kt / jnp.maximum(jnp.linalg.norm(kt, axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum("bhcn,bhdn->bhcd", qt, kt) * p["temperature"]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhcd,bhdn->bhcn", attn, vt)  # (B, heads, d, N)
    attened = out.transpose(0, 3, 1, 2).reshape(b, n, c)

    v_img = vt.reshape(b, c, n).transpose(0, 2, 1).reshape(b, h, w, c)
    conv_x = _dwconv_bn_gelu(p["dwconv"], v_img)
    channel_map = _channel_interaction(
        p["channel_interaction"], attened.reshape(b, h, w, c))
    spatial_map = _spatial_interaction(p["spatial_interaction"], conv_x)
    attened = attened * jax.nn.sigmoid(spatial_map.reshape(b, n, 1))
    conv_x = conv_x * jax.nn.sigmoid(channel_map)
    out = attened + conv_x.reshape(b, n, c)
    return linear(p["proj"], out)


def _do_shift(rg_idx: int, b_idx: int) -> bool:
    """The reference's shift cadence (DAT.py:363-366 / :501-503)."""
    return ((rg_idx % 2 == 0 and b_idx > 0 and (b_idx - 2) % 4 == 0)
            or (rg_idx % 2 != 0 and b_idx % 4 == 0))


class DAT:
    def __init__(self, config: DATConfig = DATConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return self.config.upscale

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        cfg = self.config
        b, h, w, _ = x.shape
        mean = (jnp.asarray(RGB_MEAN, x.dtype) if cfg.in_chans == 3
                else jnp.zeros((x.shape[-1],), x.dtype))
        x = (x - mean) * cfg.img_range

        feat = conv2d(params["conv_first"], x, padding=1)

        t = feat.reshape(b, h * w, cfg.embed_dim)
        t = layer_norm(params["before_RG"]["1"], t)
        for rg, depth in enumerate(cfg.depths):
            lp = params["layers"][str(rg)]
            res = t
            for bi in range(depth):
                bp = lp["blocks"][str(bi)]
                n1 = layer_norm(bp["norm1"], t)
                if bi % 2 == 0:  # DSTB
                    a = _adaptive_spatial_attention(
                        bp["attn"], n1, h, w, cfg.num_heads[rg],
                        cfg.split_size, _do_shift(rg, bi))
                else:  # DCTB
                    a = _adaptive_channel_attention(
                        bp["attn"], n1, h, w, cfg.num_heads[rg])
                t = t + a
                t = t + _sgfn(bp["ffn"], layer_norm(bp["norm2"], t), h, w)
            timg = t.reshape(b, h, w, cfg.embed_dim)
            if cfg.resi_connection == "3conv":
                timg = jax.nn.leaky_relu(conv2d(lp["conv"]["0"], timg, padding=1), 0.2)
                timg = jax.nn.leaky_relu(conv2d(lp["conv"]["2"], timg), 0.2)
                timg = conv2d(lp["conv"]["4"], timg, padding=1)
            else:
                timg = conv2d(lp["conv"], timg, padding=1)
            t = res + timg.reshape(b, h * w, cfg.embed_dim)
        t = layer_norm(params["norm"], t)
        deep = t.reshape(b, h, w, cfg.embed_dim)

        feat = conv2d(params["conv_after_body"], deep, padding=1) + feat
        if cfg.upsampler == "pixelshuffle":
            up = jax.nn.leaky_relu(
                conv2d(params["conv_before_upsample"]["0"], feat, padding=1), 0.01)
            for s in range(int(math.log2(cfg.upscale))):
                up = pixel_shuffle(
                    conv2d(params["upsample"][str(s * 2)], up, padding=1), 2)
            out = conv2d(params["conv_last"], up, padding=1)
        else:  # pixelshuffledirect
            out = pixel_shuffle(conv2d(params["upsample"]["0"], feat, padding=1),
                                cfg.upscale)
        return out / cfg.img_range + mean[: out.shape[-1]]

    # --- random init for tests (torch layout incl. BN stats) ---

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 16384))

        def conv(i, o, k=3, bias=True):
            p = {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def dconv(c, k=3):
            return {"weight": jax.random.normal(next(keys), (c, 1, k, k), dtype) * 0.05,
                    "bias": jnp.zeros((c,), dtype)}

        def lin(i, o, bias=True):
            p = {"weight": jax.random.normal(next(keys), (o, i), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        def bn(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                    "running_mean": jnp.zeros((c,), dtype),
                    "running_var": jnp.ones((c,), dtype)}

        e = cfg.embed_dim

        def aim(c):
            return {
                "dwconv": {"0": dconv(c), "1": bn(c)},
                "channel_interaction": {"1": conv(c, max(c // 8, 1), 1),
                                        "2": bn(max(c // 8, 1)),
                                        "4": conv(max(c // 8, 1), c, 1)},
                "spatial_interaction": {"0": conv(c, max(c // 16, 1), 1),
                                        "1": bn(max(c // 16, 1)),
                                        "3": conv(max(c // 16, 1), 1, 1)},
            }

        def pos_block(c_half, heads):
            pd = max(c_half // 4, 4)
            return {"pos_proj": lin(2, pd),
                    "pos1": {"0": norm(pd), "2": lin(pd, pd)},
                    "pos2": {"0": norm(pd), "2": lin(pd, pd)},
                    "pos3": {"0": norm(pd), "2": lin(pd, heads)}}

        def dstb_attn(heads):
            return {
                "qkv": lin(e, 3 * e, bias=True),
                "proj": lin(e, e),
                "attns": {"0": {"pos": pos_block(e // 2, heads // 2)},
                          "1": {"pos": pos_block(e // 2, heads // 2)}},
                **aim(e),
            }

        def dctb_attn(heads):
            return {
                "qkv": lin(e, 3 * e, bias=True),
                "proj": lin(e, e),
                "temperature": jnp.ones((heads, 1, 1), dtype),
                **aim(e),
            }

        def block(rg, bi, heads):
            hidden = int(e * cfg.expansion_factor)
            return {
                "norm1": norm(e), "norm2": norm(e),
                "attn": dstb_attn(heads) if bi % 2 == 0 else dctb_attn(heads),
                "ffn": {"fc1": lin(e, hidden),
                        "sg": {"norm": norm(hidden // 2), "conv": dconv(hidden // 2)},
                        "fc2": lin(hidden // 2, e)},
            }

        layers = {
            str(rg): {
                "blocks": {str(bi): block(rg, bi, cfg.num_heads[rg])
                           for bi in range(depth)},
                "conv": conv(e, e),
            }
            for rg, depth in enumerate(cfg.depths)
        }
        params = {
            "conv_first": conv(cfg.in_chans, e),
            "before_RG": {"1": norm(e)},
            "layers": layers,
            "norm": norm(e),
            "conv_after_body": conv(e, e),
        }
        if cfg.upsampler == "pixelshuffle":
            params["conv_before_upsample"] = {"0": conv(e, cfg.num_feat)}
            params["upsample"] = {
                str(s * 2): conv(cfg.num_feat, 4 * cfg.num_feat)
                for s in range(int(math.log2(cfg.upscale)))}
            params["conv_last"] = conv(cfg.num_feat, cfg.out_chans)
        else:
            params["upsample"] = {
                "0": conv(e, cfg.out_chans * cfg.upscale ** 2)}
        return params


def detect_dat_config(flat: Dict[str, np.ndarray]) -> Optional[DATConfig]:
    """Auto-detect a DAT checkpoint (DAT.py:947-1035)."""
    if "layers.0.blocks.0.attn.attns.0.pos.pos_proj.weight" not in flat:
        return None
    keys = flat.keys()
    if "conv_before_upsample.0.weight" in keys:
        upsampler = "pixelshuffle"
    elif "upsample.0.weight" in keys:
        upsampler = "pixelshuffledirect"
    else:
        upsampler = "pixelshuffle"
    num_feat = (flat["conv_before_upsample.0.weight"].shape[0]
                if "conv_before_upsample.0.weight" in keys else 64)
    embed_dim = flat["conv_first.weight"].shape[0]
    in_chans = flat["conv_first.weight"].shape[1]
    out_chans = (flat["conv_last.weight"].shape[0]
                 if "conv_last.weight" in keys else in_chans)
    upscale = 1
    if upsampler == "pixelshuffle":
        for k in keys:
            if "upsample" in k and "conv" not in k and "bias" not in k:
                upscale *= int(math.sqrt(flat[k].shape[0] // num_feat))
    else:
        upscale = int(math.sqrt(flat["upsample.0.bias"].shape[0] // out_chans))
    max_layer = max_block = 0
    for k in keys:
        mt = re.match(r"layers.(\d+).blocks.(\d+).norm1.weight", k)
        if mt:
            max_layer = max(max_layer, int(mt.group(1)))
            max_block = max(max_block, int(mt.group(2)))
    depths = tuple(max_block + 1 for _ in range(max_layer + 1))
    if "layers.0.blocks.1.attn.temperature" in keys:
        heads_n = flat["layers.0.blocks.1.attn.temperature"].shape[0]
    else:
        heads_n = depths[0]
    heads = tuple(heads_n for _ in range(max_layer + 1))
    expansion = float(flat["layers.0.blocks.0.ffn.fc1.weight"].shape[0] / embed_dim)
    resi = "3conv" if "layers.0.conv.4.weight" in keys else "1conv"
    split = (2, 4)
    if "layers.0.blocks.0.attn.attns.0.rpe_biases" in keys:
        last = flat["layers.0.blocks.0.attn.attns.0.rpe_biases"][-1]
        split = (int(last[0]) + 1, int(last[1]) + 1)
    return DATConfig(embed_dim=embed_dim, depths=depths, num_heads=heads,
                     split_size=split, expansion_factor=expansion,
                     upsampler=upsampler, upscale=max(upscale, 1),
                     num_feat=num_feat, in_chans=in_chans, out_chans=out_chans,
                     resi_connection=resi)


def load_dat(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    cfg = detect_dat_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not a DAT checkpoint")
    flat = {k: v for k, v in flat.items()
            if not (k.endswith("relative_position_index")
                    or k.endswith("rpe_biases") or ".attn_mask" in k
                    or k.endswith("num_batches_tracked"))}
    return DAT(cfg), nest(flat)
