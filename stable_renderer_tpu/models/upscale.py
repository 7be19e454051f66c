"""Image upscalers — ESRGAN/RRDBNet family.

Capability match for the most-used member of the reference's chainner upscaler
zoo (reference: comfyUI/comfy_extras/chainner_models/ — ESRGAN/RRDB is the
workhorse; SwinIR/HAT/DAT etc. remain TODO). Functional JAX, NHWC, params in the
"new-arch" torch layout (conv_first / body.N.rdbM.convK / conv_up1...), with the
old-arch ESRGAN key remap (model.0.weight style) handled at load.

Usage:
    params, cfg = load_esrgan("RealESRGAN_x4plus.pth")
    up = RRDBNet(cfg).apply(params, images)   # (N, H, W, 3) -> (N, sH, sW, 3)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, upsample_nearest_2x
from stable_renderer_tpu.models.weights import nest


@dataclass(frozen=True)
class RRDBConfig:
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _rdb(p: dict, x: jax.Array) -> jax.Array:
    """Residual dense block: 5 convs with dense connectivity, 0.2 residual."""
    x1 = _lrelu(conv2d(p["conv1"], x, padding=1))
    x2 = _lrelu(conv2d(p["conv2"], jnp.concatenate([x, x1], -1), padding=1))
    x3 = _lrelu(conv2d(p["conv3"], jnp.concatenate([x, x1, x2], -1), padding=1))
    x4 = _lrelu(conv2d(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1), padding=1))
    x5 = conv2d(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1), padding=1)
    return x + 0.2 * x5


def _rrdb(p: dict, x: jax.Array) -> jax.Array:
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return x + 0.2 * out


class RRDBNet:
    def __init__(self, config: RRDBConfig = RRDBConfig()):
        self.config = config

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        """x: (N, H, W, 3) in [0,1] -> (N, scale*H, scale*W, 3)."""
        cfg = self.config
        feat = conv2d(params["conv_first"], x, padding=1)
        body = feat
        for i in range(cfg.num_block):
            body = _rrdb(params["body"][str(i)], body)
        feat = feat + conv2d(params["conv_body"], body, padding=1)
        if cfg.scale >= 2:
            feat = _lrelu(conv2d(params["conv_up1"], upsample_nearest_2x(feat), padding=1))
        if cfg.scale >= 4:
            feat = _lrelu(conv2d(params["conv_up2"], upsample_nearest_2x(feat), padding=1))
        out = conv2d(params["conv_last"], _lrelu(conv2d(params["conv_hr"], feat, padding=1)), padding=1)
        return jnp.clip(out, 0.0, 1.0)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 4096))

        def conv(i, o, k=3):
            return {
                "weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.02,
                "bias": jnp.zeros((o,), dtype),
            }

        nf, gc = cfg.num_feat, cfg.num_grow_ch

        def rdb():
            return {
                "conv1": conv(nf, gc),
                "conv2": conv(nf + gc, gc),
                "conv3": conv(nf + 2 * gc, gc),
                "conv4": conv(nf + 3 * gc, gc),
                "conv5": conv(nf + 4 * gc, nf),
            }

        return {
            "conv_first": conv(3, nf),
            "body": {str(i): {"rdb1": rdb(), "rdb2": rdb(), "rdb3": rdb()} for i in range(cfg.num_block)},
            "conv_body": conv(nf, nf),
            "conv_up1": conv(nf, nf),
            "conv_up2": conv(nf, nf),
            "conv_hr": conv(nf, nf),
            "conv_last": conv(nf, 3),
        }


_OLD_ARCH_MAP = {
    "model.0": "conv_first",
    "model.1.sub.23": "conv_body",
    "model.3": "conv_up1",
    "model.6": "conv_up2",
    "model.8": "conv_hr",
    "model.10": "conv_last",
}


def convert_esrgan_state_dict(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize old-arch ESRGAN keys (model.1.sub.N.RDBk.convM.0.*) to the
    new-arch names used above (chainner does the same normalization)."""
    if "conv_first.weight" in flat:
        return dict(flat)
    out: Dict[str, np.ndarray] = {}
    for key, value in flat.items():
        base = key.rsplit(".", 1)
        name, leaf = base[0], base[1]
        mapped = None
        if name in _OLD_ARCH_MAP:
            mapped = _OLD_ARCH_MAP[name]
        elif name.startswith("model.1.sub."):
            parts = name.split(".")  # model 1 sub N RDBk convM 0
            block, rdbk, convm = parts[3], parts[4].lower(), parts[5].lower()
            mapped = f"body.{block}.{rdbk}.{convm}"
        if mapped is not None:
            out[f"{mapped}.{leaf}"] = value
        else:
            out[key] = value
    return out


def load_esrgan(path: str):
    """Load an ESRGAN/RealESRGAN .pth/.safetensors -> (params, RRDBConfig)."""
    from stable_renderer_tpu.models.weights import load_state_dict

    flat = load_state_dict(path)
    if any(k.startswith("params_ema") or k.startswith("params.") for k in flat):
        flat = {
            k.split(".", 1)[1]: v
            for k, v in flat.items()
            if k.startswith(("params_ema.", "params."))
        }
    flat = convert_esrgan_state_dict(flat)
    nf = flat["conv_first.weight"].shape[0]
    blocks = 1 + max(
        int(k.split(".")[1]) for k in flat if k.startswith("body.")
    )
    gc = flat["body.0.rdb1.conv1.weight"].shape[0]
    scale = 4 if "conv_up2.weight" in flat else 2
    cfg = RRDBConfig(num_feat=nf, num_block=blocks, num_grow_ch=gc, scale=scale)
    return nest(flat, ""), cfg


# ---------------------------------------------------------------------------
# SRVGG / RealESRGAN-compact (chainner SRVGG.py:10-116)


@dataclass(frozen=True)
class SRVGGConfig:
    num_feat: int = 64
    num_conv: int = 16
    scale: int = 4
    in_ch: int = 3


class SRVGGNetCompact:
    """VGG-style compact SR: conv+prelu body, one pixelshuffle, nearest
    residual (SRVGG.py forward)."""

    def __init__(self, config: SRVGGConfig = SRVGGConfig()):
        self.config = config

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        cfg = self.config
        body = params["body"]
        out = x
        for i in range(0, 2 * (cfg.num_conv + 1), 2):
            out = conv2d(body[str(i)], out, padding=1)
            prelu_w = body[str(i + 1)]["weight"].astype(out.dtype)
            out = jnp.maximum(out, 0.0) + prelu_w * jnp.minimum(out, 0.0)
        out = conv2d(body[str(2 * (cfg.num_conv + 1))], out, padding=1)
        from stable_renderer_tpu.models.swinir import pixel_shuffle

        out = pixel_shuffle(out, cfg.scale)
        base = jnp.repeat(jnp.repeat(x, cfg.scale, 1), cfg.scale, 2)
        return out + base

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 256))

        def conv(i, o):
            return {"weight": jax.random.normal(next(keys), (o, i, 3, 3), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        body = {"0": conv(cfg.in_ch, cfg.num_feat),
                "1": {"weight": jnp.full((cfg.num_feat,), 0.25, dtype)}}
        for c in range(cfg.num_conv):
            body[str(2 + 2 * c)] = conv(cfg.num_feat, cfg.num_feat)
            body[str(3 + 2 * c)] = {"weight": jnp.full((cfg.num_feat,), 0.25, dtype)}
        body[str(2 * (cfg.num_conv + 1))] = conv(
            cfg.num_feat, cfg.in_ch * cfg.scale * cfg.scale)
        return {"body": body}


def detect_srvgg_config(flat) -> "SRVGGConfig | None":
    keys = sorted(flat.keys(), key=lambda k: tuple(
        int(p) if p.isdigit() else p for p in k.split(".")))
    if not keys or not keys[0].startswith("body.0."):
        return None
    if any(not k.startswith("body.") for k in keys):
        return None
    last_idx = max(int(k.split(".")[1]) for k in keys)
    num_conv = (last_idx - 2) // 2
    num_feat = flat["body.0.weight"].shape[0]
    in_ch = flat["body.0.weight"].shape[1]
    ps_shape = flat[f"body.{last_idx}.weight"].shape[0]
    import math as _math

    scale = int(_math.sqrt(ps_shape / in_ch))
    return SRVGGConfig(num_feat=num_feat, num_conv=num_conv, scale=scale,
                       in_ch=in_ch)


# ---------------------------------------------------------------------------
# unified loader (chainner __init__.py load_state_dict dispatch)


def load_upscale_model(path: str):
    """Sniff the architecture and load: SwinIR / SRVGG / ESRGAN-RRDB.
    Returns (model, params) where model.apply(params, images) upscales and
    model.config.scale (or .scale) gives the factor."""
    from stable_renderer_tpu.models.weights import load_state_dict

    flat = load_state_dict(path)
    if any(k.startswith(("params_ema.", "params.")) for k in flat):
        flat = {k.split(".", 1)[1]: v for k, v in flat.items()
                if k.startswith(("params_ema.", "params."))}
    if "layers.0.residual_group.overlap_attn.norm1.weight" in flat:
        # HAT shares SwinIR's residual_group layout — check its OCAB first
        from stable_renderer_tpu.models.hat import load_hat

        return load_hat(path)
    if "layers.0.residual_group.blocks.0.attn.logit_scale" in flat:
        # Swin2SR shares SwinIR's layout — the SwinV2 logit_scale marks it
        from stable_renderer_tpu.models.swin2sr import load_swin2sr

        return load_swin2sr(path)
    if "layers.0.residual_group.blocks.0.norm1.weight" in flat:
        from stable_renderer_tpu.models.swinir import load_swinir

        return load_swinir(path)
    if "decoder.mid.attn_1.norm2.weight" in flat and "quantize.embedding.weight" in flat:
        from stable_renderer_tpu.models.restoreformer import load_restoreformer

        return load_restoreformer(path)
    if "position_emb" in flat and "quantize.embedding.weight" in flat:
        from stable_renderer_tpu.models.codeformer import load_codeformer

        return load_codeformer(path)
    if "stylegan_decoder.style_conv1.modulated_conv.weight" in flat:
        from stable_renderer_tpu.models.gfpgan import load_gfpgan

        return load_gfpgan(path)
    if "m_head.0.weight" in flat and "m_down1.0.trans_block.ln1.weight" in flat:
        from stable_renderer_tpu.models.scunet import load_scunet

        return load_scunet(path)
    if "layers.0.blocks.0.attn.attns.0.pos.pos_proj.weight" in flat:
        from stable_renderer_tpu.models.dat import load_dat

        return load_dat(path)
    if ("input.weight" in flat
            and any(k.startswith("residual_layer.0.residual_layer.0.layer.")
                    for k in flat)):
        from stable_renderer_tpu.models.omnisr import load_omnisr

        return load_omnisr(path)
    if "b_fea_conv.weight" in flat or "b_fea_conv.0.weight" in flat:
        from stable_renderer_tpu.models.spsr import load_spsr

        return load_spsr(path)
    swift = detect_swift_srgan_config(flat)
    if swift is not None:
        return SwiftSRGAN(swift), nest(flat, "")
    srvgg = detect_srvgg_config(flat)
    if srvgg is not None:
        return SRVGGNetCompact(srvgg), nest(flat, "")
    params, cfg = load_esrgan(path)
    return RRDBNet(cfg), params


# ---------------------------------------------------------------------------
# Swift-SRGAN (chainner SwiftSRGAN.py:7-161): depthwise-separable SRGAN


@dataclass(frozen=True)
class SwiftSRGANConfig:
    num_channels: int = 64
    num_blocks: int = 16
    scale: int = 4
    in_ch: int = 3


def _sep_conv(p: dict, x: jax.Array, padding: int) -> jax.Array:
    """SeperableConv2d: depthwise (groups=C) then pointwise 1x1."""
    c = x.shape[-1]
    w = p["depthwise"]["weight"].astype(x.dtype)  # (C,1,k,k)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "OIHW", "NHWC"), feature_group_count=c)
    if "bias" in p["depthwise"]:
        out = out + p["depthwise"]["bias"].astype(x.dtype)
    return conv2d(p["pointwise"], out)


def _prelu(w: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0.0) + w.astype(x.dtype) * jnp.minimum(x, 0.0)


def _swift_bn(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    out = (x.astype(jnp.float32) - p["running_mean"]) * jax.lax.rsqrt(
        p["running_var"].astype(jnp.float32) + eps)
    out = out * p["weight"] + p["bias"]
    return out.astype(x.dtype)


class SwiftSRGAN:
    """Generator (SwiftSRGAN.py:90-161)."""

    def __init__(self, config: SwiftSRGANConfig = SwiftSRGANConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return self.config.scale

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        from stable_renderer_tpu.models.swinir import pixel_shuffle

        cfg = self.config
        init = _prelu(params["initial"]["act"]["weight"],
                      _sep_conv(params["initial"]["cnn"], x, 4))
        h = init
        for i in range(cfg.num_blocks):
            bp = params["residual"][str(i)]
            r = _prelu(bp["block1"]["act"]["weight"],
                       _swift_bn(bp["block1"]["bn"],
                                 _sep_conv(bp["block1"]["cnn"], h, 1)))
            r = _swift_bn(bp["block2"]["bn"], _sep_conv(bp["block2"]["cnn"], r, 1))
            h = h + r
        h = _swift_bn(params["convblock"]["bn"],
                      _sep_conv(params["convblock"]["cnn"], h, 1)) + init
        for i in range(cfg.scale // 2):
            up = params["upsampler"][str(i)]
            h = pixel_shuffle(_sep_conv(up["conv"], h, 1), 2)
            h = _prelu(up["act"]["weight"], h)
        out = _sep_conv(params["final_conv"], h, 4)
        return (jnp.tanh(out) + 1.0) / 2.0

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 2048))

        def sep(i, o, k, bias=True):
            p = {"depthwise": {"weight": jax.random.normal(next(keys), (i, 1, k, k), dtype) * 0.05},
                 "pointwise": {"weight": jax.random.normal(next(keys), (o, i, 1, 1), dtype) * 0.05,
                               "bias": jnp.zeros((o,), dtype)}}
            if bias:
                p["depthwise"]["bias"] = jnp.zeros((i,), dtype)
            return p

        def bn(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                    "running_mean": jnp.zeros((c,), dtype),
                    "running_var": jnp.ones((c,), dtype)}

        def act(c):
            return {"weight": jnp.full((c,), 0.25, dtype)}

        n = cfg.num_channels
        params = {
            "initial": {"cnn": sep(cfg.in_ch, n, 9), "act": act(n)},
            "residual": {
                str(i): {"block1": {"cnn": sep(n, n, 3, bias=False), "bn": bn(n),
                                    "act": act(n)},
                         "block2": {"cnn": sep(n, n, 3, bias=False), "bn": bn(n)}}
                for i in range(cfg.num_blocks)},
            "convblock": {"cnn": sep(n, n, 3, bias=False), "bn": bn(n)},
            "upsampler": {str(i): {"conv": sep(n, 4 * n, 3), "act": act(n)}
                          for i in range(cfg.scale // 2)},
            "final_conv": sep(n, cfg.in_ch, 9),
        }
        return params


def detect_swift_srgan_config(flat) -> "SwiftSRGANConfig | None":
    if "initial.cnn.depthwise.weight" not in flat:
        return None
    in_ch = flat["initial.cnn.depthwise.weight"].shape[0]
    n = flat["initial.cnn.pointwise.weight"].shape[0]
    blocks = len({k.split(".")[1] for k in flat if k.startswith("residual.")})
    scale = 2 ** len({k.split(".")[1] for k in flat if k.startswith("upsampler.")})
    return SwiftSRGANConfig(num_channels=n, num_blocks=blocks, scale=scale,
                            in_ch=in_ch)
