"""SwinIR — window-attention transformer super-resolution / denoising.

Capability match for the reference's chainner SwinIR
(reference: comfyUI/comfy_extras/chainner_models/architecture/SwinIR.py —
WindowAttention :83-210, SwinTransformerBlock :212-395, RSTB :541-652,
state-dict auto-detection :820-990, forward :1140-1215). Functional JAX,
NHWC, torch param layout so real checkpoints load unchanged.

TPU notes: every spatial size under jit is static, so the shifted-window
attention mask and the relative-position index are computed with numpy at
trace time — zero device cost. Window partition is pure reshape/transpose
(layout ops XLA folds into the attention einsums), and all four upsampler
flavors (pixelshuffle / pixelshuffledirect / nearest+conv / none) lower to
reshapes + MXU convs.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, layer_norm, linear

RGB_MEAN = (0.4488, 0.4371, 0.4040)  # SwinIR.py:989


@dataclass(frozen=True)
class SwinIRConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 4.0
    upsampler: str = "pixelshuffle"  # '', 'pixelshuffle(direct)', 'nearest+conv'
    upscale: int = 4
    num_feat: int = 64
    img_range: float = 1.0
    in_chans: int = 3
    out_chans: int = 3
    resi_connection: str = "1conv"
    start_unshuffle: int = 1
    patch_norm: bool = True


TINY_SWINIR_CONFIG = SwinIRConfig(
    embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=4,
    mlp_ratio=2.0, upsampler="pixelshuffledirect", upscale=2, num_feat=16)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """torch PixelShuffle in NHWC: channel order (C', r, r)."""
    b, h, w, c = x.shape
    cp = c // (r * r)
    x = x.reshape(b, h, w, cp, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, cp)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """torch PixelUnshuffle in NHWC: channel order (C, r, r)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def _rel_pos_index(ws: int) -> np.ndarray:
    """Pairwise relative-position index (SwinIR.py:119-134), static numpy."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) 0/-100 mask for shifted windows (calculate_mask),
    static numpy at trace time."""
    img_mask = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    mw = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    mw = mw.reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_reverse(win: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    c = win.shape[-1]
    x = win.reshape(-1, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


def _window_attention(p: dict, x: jax.Array, heads: int, ws: int,
                      mask: Optional[np.ndarray]) -> jax.Array:
    """W-MSA with relative position bias (SwinIR.py:145-194).
    x: (nW*B, N, C); mask: (nW, N, N) or None."""
    bw, n, c = x.shape
    d = c // heads
    qkv = linear(p["qkv"], x).reshape(bw, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0] * (d ** -0.5), qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    idx = _rel_pos_index(ws).reshape(-1)
    bias = p["relative_position_bias_table"][idx].reshape(n, n, heads)
    attn = attn + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bw // nw, nw, heads, n, n)
        attn = attn + jnp.asarray(mask)[None, :, None]
        attn = attn.reshape(bw, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
    return linear(p["proj"], out)


def _swin_block(p: dict, x: jax.Array, hw: Tuple[int, int], heads: int,
                ws: int, shift: int) -> jax.Array:
    """SwinTransformerBlock (SwinIR.py:321-372). x: (B, H*W, C)."""
    h, w = hw
    b, l, c = x.shape
    shortcut = x
    xs = layer_norm(p["norm1"], x).reshape(b, h, w, c)
    if shift > 0:
        xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
        mask = _shift_attn_mask(h, w, ws, shift)
    else:
        mask = None
    win = _window_partition(xs, ws)
    win = _window_attention(p["attn"], win, heads, ws, mask)
    xs = _window_reverse(win, ws, h, w)
    if shift > 0:
        xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
    x = shortcut + xs.reshape(b, l, c)
    n2 = layer_norm(p["norm2"], x)
    mlp = linear(p["mlp"]["fc2"], jax.nn.gelu(linear(p["mlp"]["fc1"], n2),
                                              approximate=False))
    return x + mlp


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class SwinIR:
    def __init__(self, config: SwinIRConfig = SwinIRConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return self.config.upscale // self.config.start_unshuffle

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C) in [0,1] -> (B, scale*H, scale*W, C)."""
        cfg = self.config
        ws = cfg.window_size
        b, h_in, w_in, _ = x.shape

        if cfg.in_chans == 3 * cfg.start_unshuffle ** 2 and x.shape[-1] == 3:
            mean = jnp.asarray(RGB_MEAN, x.dtype)
        else:
            mean = jnp.zeros((x.shape[-1],), x.dtype)
        x = (x - mean) * cfg.img_range
        if cfg.start_unshuffle > 1:
            x = pixel_unshuffle(x, cfg.start_unshuffle)

        # pad to a window multiple (check_image_size, SwinIR.py:1140-1146)
        h, w = x.shape[1], x.shape[2]
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = x.shape[1], x.shape[2]

        feat = conv2d(params["conv_first"], x, padding=1)

        def features(f):
            t = f.reshape(b, h * w, cfg.embed_dim)
            if cfg.patch_norm and "patch_embed" in params:
                t = layer_norm(params["patch_embed"]["norm"], t)
            for li, depth in enumerate(cfg.depths):
                lp = params["layers"][str(li)]
                r = t
                for bi in range(depth):
                    shift = 0 if bi % 2 == 0 else ws // 2
                    # no shift when the padded image is a single window
                    if min(h, w) <= ws:
                        shift = 0
                    r = _swin_block(lp["residual_group"]["blocks"][str(bi)],
                                    r, (h, w), cfg.num_heads[li], ws, shift)
                rimg = r.reshape(b, h, w, cfg.embed_dim)
                if cfg.resi_connection == "3conv":
                    cpr = lp["conv"]
                    rimg = _lrelu(conv2d(cpr["0"], rimg, padding=1))
                    rimg = _lrelu(conv2d(cpr["2"], rimg, padding=0))
                    rimg = conv2d(cpr["4"], rimg, padding=1)
                else:
                    rimg = conv2d(lp["conv"], rimg, padding=1)
                t = rimg.reshape(b, h * w, cfg.embed_dim) + t
            t = layer_norm(params["norm"], t)
            return t.reshape(b, h, w, cfg.embed_dim)

        if cfg.upsampler == "pixelshuffle":
            feat = conv2d(params["conv_after_body"], features(feat), padding=1) + feat
            feat = _lrelu(conv2d(params["conv_before_upsample"]["0"], feat, padding=1))
            up = feat
            n_steps = int(math.log2(self.scale))
            for s in range(n_steps):
                up = pixel_shuffle(conv2d(params["upsample"][str(s * 2)], up, padding=1), 2)
            out = conv2d(params["conv_last"], up, padding=1)
        elif cfg.upsampler == "pixelshuffledirect":
            feat = conv2d(params["conv_after_body"], features(feat), padding=1) + feat
            out = pixel_shuffle(conv2d(params["upsample"]["0"], feat, padding=1),
                                self.scale)
        elif cfg.upsampler == "nearest+conv":
            feat = conv2d(params["conv_after_body"], features(feat), padding=1) + feat
            feat = _lrelu(conv2d(params["conv_before_upsample"]["0"], feat, padding=1))
            feat = _lrelu(conv2d(params["conv_up1"],
                                 jnp.repeat(jnp.repeat(feat, 2, 1), 2, 2), padding=1))
            if self.scale >= 4:
                feat = _lrelu(conv2d(params["conv_up2"],
                                     jnp.repeat(jnp.repeat(feat, 2, 1), 2, 2), padding=1))
            if self.scale >= 8:
                feat = _lrelu(conv2d(params["conv_up3"],
                                     jnp.repeat(jnp.repeat(feat, 2, 1), 2, 2), padding=1))
            out = conv2d(params["conv_last"], _lrelu(conv2d(params["conv_hr"], feat,
                                                            padding=1)), padding=1)
        else:  # denoise / artifact removal: residual, no upsample
            res = conv2d(params["conv_after_body"], features(feat), padding=1) + feat
            out = x + conv2d(params["conv_last"], res, padding=1)

        out = out / cfg.img_range + mean[: out.shape[-1]]
        return out[:, : h_in * self.scale, : w_in * self.scale]

    # --- random init for tests (torch layout) ---

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 8192))

        def conv(i, o, k=3):
            return {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        def lin(i, o):
            return {"weight": jax.random.normal(next(keys), (o, i), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        e, ws = cfg.embed_dim, cfg.window_size
        hidden = int(e * cfg.mlp_ratio)

        def block(heads):
            return {
                "norm1": norm(e), "norm2": norm(e),
                "attn": {
                    "qkv": lin(e, 3 * e), "proj": lin(e, e),
                    "relative_position_bias_table": jax.random.normal(
                        next(keys), ((2 * ws - 1) ** 2, heads), dtype) * 0.02,
                },
                "mlp": {"fc1": lin(e, hidden), "fc2": lin(hidden, e)},
            }

        layers = {
            str(li): {
                "residual_group": {"blocks": {
                    str(bi): block(cfg.num_heads[li]) for bi in range(depth)}},
                "conv": conv(e, e),
            }
            for li, depth in enumerate(cfg.depths)
        }
        params = {
            "conv_first": conv(cfg.in_chans, e),
            "patch_embed": {"norm": norm(e)},
            "layers": layers,
            "norm": norm(e),
            "conv_after_body": conv(e, e),
        }
        r = self.scale
        if cfg.upsampler == "pixelshuffle":
            params["conv_before_upsample"] = {"0": conv(e, cfg.num_feat)}
            params["upsample"] = {
                str(s * 2): conv(cfg.num_feat, 4 * cfg.num_feat)
                for s in range(int(math.log2(r)))}
            params["conv_last"] = conv(cfg.num_feat, cfg.out_chans)
        elif cfg.upsampler == "pixelshuffledirect":
            params["upsample"] = {"0": conv(e, cfg.out_chans * r * r)}
        elif cfg.upsampler == "nearest+conv":
            params["conv_before_upsample"] = {"0": conv(e, cfg.num_feat)}
            params["conv_up1"] = conv(cfg.num_feat, cfg.num_feat)
            if r >= 4:
                params["conv_up2"] = conv(cfg.num_feat, cfg.num_feat)
            if r >= 8:
                params["conv_up3"] = conv(cfg.num_feat, cfg.num_feat)
            params["conv_hr"] = conv(cfg.num_feat, cfg.num_feat)
            params["conv_last"] = conv(cfg.num_feat, cfg.out_chans)
        else:
            params["conv_last"] = conv(e, cfg.out_chans)
        return params


def detect_swinir_config(flat: Dict[str, np.ndarray]) -> Optional[SwinIRConfig]:
    """Auto-detect a SwinIR checkpoint layout (SwinIR.py:820-990)."""
    if "layers.0.residual_group.blocks.0.norm1.weight" not in flat:
        return None
    keys = flat.keys()
    if "conv_before_upsample.0.weight" in keys:
        upsampler = "nearest+conv" if "conv_up1.weight" in keys else "pixelshuffle"
    elif "upsample.0.weight" in keys:
        upsampler = "pixelshuffledirect"
    else:
        upsampler = ""
    num_feat = (flat["conv_before_upsample.0.weight"].shape[0]
                if "conv_before_upsample.0.weight" in keys else 64)
    start_unshuffle = 1
    if "conv_first.1.weight" in keys:  # pixel-unshuffled realSR variants
        start_unshuffle = round(math.sqrt(flat["conv_first.1.weight"].shape[1] // 3))
    conv_first_w = flat.get("conv_first.weight", flat.get("conv_first.1.weight"))
    in_chans = conv_first_w.shape[1]
    embed_dim = conv_first_w.shape[0]
    out_chans = (flat["conv_last.weight"].shape[0]
                 if "conv_last.weight" in keys else in_chans)
    upscale = 1
    if upsampler == "nearest+conv":
        upscale = 2 ** len([k for k in keys if "conv_up" in k and "bias" not in k])
    elif upsampler == "pixelshuffle":
        for k in keys:
            if "upsample" in k and "conv" not in k and "bias" not in k:
                upscale *= int(math.sqrt(flat[k].shape[0] // num_feat))
    elif upsampler == "pixelshuffledirect":
        upscale = int(math.sqrt(flat["upsample.0.bias"].shape[0] // out_chans))
    max_layer = max_block = 0
    for k in keys:
        mt = re.match(r"layers.(\d+).residual_group.blocks.(\d+).norm1.weight", k)
        if mt:
            max_layer = max(max_layer, int(mt.group(1)))
            max_block = max(max_block, int(mt.group(2)))
    depths = tuple(max_block + 1 for _ in range(max_layer + 1))
    bias_table = flat["layers.0.residual_group.blocks.0.attn.relative_position_bias_table"]
    heads = tuple(bias_table.shape[-1] for _ in range(max_layer + 1))
    mlp_ratio = float(flat["layers.0.residual_group.blocks.0.mlp.fc1.bias"].shape[0]
                      / embed_dim)
    resi = "3conv" if "layers.0.conv.4.weight" in keys else "1conv"
    # bias table rows = (2w-1)^2 -> w = (sqrt(rows)+1)/2
    window_size = (math.isqrt(int(bias_table.shape[0])) + 1) // 2
    img_range = 255.0 if window_size == 7 else 1.0
    return SwinIRConfig(
        embed_dim=embed_dim, depths=depths, num_heads=heads,
        window_size=window_size, mlp_ratio=mlp_ratio, upsampler=upsampler,
        upscale=max(upscale, 1), num_feat=num_feat, img_range=img_range,
        in_chans=in_chans, out_chans=out_chans, resi_connection=resi,
        start_unshuffle=start_unshuffle,
        patch_norm="patch_embed.norm.weight" in keys,
    )


def load_swinir(path: str):
    """Load a SwinIR checkpoint -> (SwinIR, params)."""
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    if any(k.startswith(("params_ema.", "params.")) for k in flat):
        flat = {k.split(".", 1)[1]: v for k, v in flat.items()
                if k.startswith(("params_ema.", "params."))}
    cfg = detect_swinir_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not a SwinIR checkpoint")
    if "conv_first.1.weight" in flat:
        flat["conv_first.weight"] = flat.pop("conv_first.1.weight")
        flat["conv_first.bias"] = flat.pop("conv_first.1.bias")
    flat = {k: v for k, v in flat.items()
            if not (k.endswith("relative_position_index") or k.endswith("attn_mask"))}
    return SwinIR(cfg), nest(flat)
