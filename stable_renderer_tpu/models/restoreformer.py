"""RestoreFormer — multi-head cross-attention VQ face restoration.

Capability match for the reference's third face-restore model
(reference: comfyUI/comfy_extras/chainner_models/architecture/face/
restoreformer_arch.py — VectorQuantizer :11-124, ResnetBlock :162-220,
MultiHeadAttnBlock :222-289, MultiHeadEncoder :292-414,
MultiHeadDecoderTransformer :544-672, RestoreFormer :674-790). Functional
JAX, NHWC, torch param layout.

Flow: VQ encoder (collecting the attention-level features) -> nearest
codebook quantization -> decoder whose multi-head attention blocks
cross-attend the decoder features (queries) against the encoder's stored
features (keys/values) — the "restore from priors" mechanism."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, group_norm


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _norm(p, x):
    return group_norm(p, x, num_groups=32, eps=1e-6)


@dataclass(frozen=True)
class RestoreFormerConfig:
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resolution: int = 512
    z_channels: int = 256
    embed_dim: int = 256
    codebook_size: int = 1024
    head_size: int = 8
    in_ch: int = 3
    out_ch: int = 3


TINY_RESTOREFORMER_CONFIG = RestoreFormerConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
    resolution=16, z_channels=16, embed_dim=16, codebook_size=32, head_size=2)


def _res_block(p: dict, x: jax.Array) -> jax.Array:
    """ResnetBlock (restoreformer_arch.py:162-220)."""
    h = conv2d(p["conv1"], _swish(_norm(p["norm1"], x)), padding=1)
    h = conv2d(p["conv2"], _swish(_norm(p["norm2"], h)), padding=1)
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def _mh_attn(p: dict, x: jax.Array, heads: int,
             y: Optional[jax.Array] = None) -> jax.Array:
    """MultiHeadAttnBlock (restoreformer_arch.py:222-289): queries from y
    (norm2), keys/values from x (norm1); residual onto x."""
    b, h, w, c = x.shape
    d = c // heads
    hx = _norm(p["norm1"], x)
    hy = hx if y is None else _norm(p["norm2"], y)
    q = conv2d(p["q"], hy).reshape(b, h * w, heads, d).transpose(0, 2, 1, 3)
    k = conv2d(p["k"], hx).reshape(b, h * w, heads, d).transpose(0, 2, 1, 3)
    v = conv2d(p["v"], hx).reshape(b, h * w, heads, d).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q * (d ** -0.5), k), -1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], out)


class RestoreFormer:
    def __init__(self, config: RestoreFormerConfig = RestoreFormerConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return 1

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        """(B, S, S, 3) in [-1, 1] -> restored (B, S, S, 3)."""
        cfg = self.config
        heads = cfg.head_size
        nres = len(cfg.ch_mult)
        enc = params["encoder"]

        # --- encoder (restoreformer_arch.py:379-414) ---
        h = conv2d(enc["conv_in"], x, padding=1)
        hs: Dict[str, jax.Array] = {}
        curr = cfg.resolution
        for i in range(nres):
            dp = enc["down"][str(i)]
            for j in range(cfg.num_res_blocks):
                h = _res_block(dp["block"][str(j)], h)
                if curr in cfg.attn_resolutions:
                    h = _mh_attn(dp["attn"][str(j)], h, heads)
            if i != nres - 1:
                hs[f"block_{i}"] = h
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = conv2d(dp["downsample"]["conv"], hp, stride=2)
                curr //= 2
        h = _res_block(enc["mid"]["block_1"], h)
        hs[f"block_{nres - 1}_atten"] = h
        h = _mh_attn(enc["mid"]["attn_1"], h, heads)
        h = _res_block(enc["mid"]["block_2"], h)
        hs["mid_atten"] = h
        h = conv2d(enc["conv_out"], _swish(_norm(enc["norm_out"], h)), padding=1)

        # --- quantize (nearest codebook) ---
        z = conv2d(params["quant_conv"], h)
        codebook = params["quantize"]["embedding"]["weight"]
        b, zh, zw, zc = z.shape
        flat = z.reshape(-1, zc)
        d2 = (jnp.sum(flat ** 2, -1, keepdims=True)
              + jnp.sum(codebook ** 2, -1)
              - 2.0 * flat @ codebook.T)
        idx = jnp.argmin(d2, -1)
        quant = codebook[idx].reshape(b, zh, zw, zc)

        # --- decoder with cross-attention priors (:636-672) ---
        dec = params["decoder"]
        h = conv2d(params["post_quant_conv"], quant)
        h = conv2d(dec["conv_in"], h, padding=1)
        h = _res_block(dec["mid"]["block_1"], h)
        h = _mh_attn(dec["mid"]["attn_1"], h, heads, y=hs["mid_atten"])
        h = _res_block(dec["mid"]["block_2"], h)
        curr = cfg.resolution // 2 ** (nres - 1)
        for i in reversed(range(nres)):
            up = dec["up"][str(i)]
            for j in range(cfg.num_res_blocks + 1):
                h = _res_block(up["block"][str(j)], h)
                if curr in cfg.attn_resolutions:
                    h = _mh_attn(up["attn"][str(j)], h, heads,
                                 y=hs[f"block_{i}_atten"])
            if i != 0:
                h = jnp.repeat(jnp.repeat(h, 2, 1), 2, 2)
                h = conv2d(up["upsample"]["conv"], h, padding=1)
                curr *= 2
        h = conv2d(dec["conv_out"], _swish(_norm(dec["norm_out"], h)), padding=1)
        return h

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 16384))

        def conv(i, o, k=3):
            return {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        def res(i, o):
            p = {"norm1": norm(i), "conv1": conv(i, o), "norm2": norm(o),
                 "conv2": conv(o, o)}
            if i != o:
                p["nin_shortcut"] = conv(i, o, 1)
            return p

        def attn(c):
            return {"norm1": norm(c), "norm2": norm(c), "q": conv(c, c, 1),
                    "k": conv(c, c, 1), "v": conv(c, c, 1),
                    "proj_out": conv(c, c, 1)}

        ch, cm = cfg.ch, cfg.ch_mult
        nres = len(cm)
        in_mult = (1,) + tuple(cm)

        enc: dict = {"conv_in": conv(cfg.in_ch, ch), "down": {}}
        curr = cfg.resolution
        cin = ch
        for i in range(nres):
            cin = ch * in_mult[i]
            cout = ch * cm[i]
            blocks, attns = {}, {}
            for j in range(cfg.num_res_blocks):
                blocks[str(j)] = res(cin, cout)
                cin = cout
                if curr in cfg.attn_resolutions:
                    attns[str(j)] = attn(cin)
            d = {"block": blocks, "attn": attns}
            if i != nres - 1:
                d["downsample"] = {"conv": conv(cin, cin)}
                curr //= 2
            enc["down"][str(i)] = d
        enc["mid"] = {"block_1": res(cin, cin), "attn_1": attn(cin),
                      "block_2": res(cin, cin)}
        enc["norm_out"] = norm(cin)
        enc["conv_out"] = conv(cin, cfg.z_channels)

        dec: dict = {"conv_in": conv(cfg.z_channels, ch * cm[-1]), "up": {}}
        block_in = ch * cm[-1]
        dec["mid"] = {"block_1": res(block_in, block_in),
                      "attn_1": attn(block_in),
                      "block_2": res(block_in, block_in)}
        curr = cfg.resolution // 2 ** (nres - 1)
        for i in reversed(range(nres)):
            cout = ch * cm[i]
            blocks, attns = {}, {}
            for j in range(cfg.num_res_blocks + 1):
                blocks[str(j)] = res(block_in, cout)
                block_in = cout
                if curr in cfg.attn_resolutions:
                    attns[str(j)] = attn(block_in)
            d = {"block": blocks, "attn": attns}
            if i != 0:
                d["upsample"] = {"conv": conv(block_in, block_in)}
                curr *= 2
            dec["up"][str(i)] = d
        dec["norm_out"] = norm(block_in)
        dec["conv_out"] = conv(block_in, cfg.out_ch)

        return {
            "encoder": enc, "decoder": dec,
            "quant_conv": conv(cfg.z_channels, cfg.embed_dim, 1),
            "post_quant_conv": conv(cfg.embed_dim, cfg.z_channels, 1),
            "quantize": {"embedding": {"weight": jax.random.normal(
                next(keys), (cfg.codebook_size, cfg.embed_dim), dtype) * 0.05}},
        }


def detect_restoreformer_config(flat: Dict[str, np.ndarray]) -> Optional[RestoreFormerConfig]:
    if ("encoder.down.0.block.0.norm1.weight" not in flat
            or "decoder.mid.attn_1.norm2.weight" not in flat):
        return None
    ch = flat["encoder.conv_in.weight"].shape[0]
    in_ch = flat["encoder.conv_in.weight"].shape[1]
    codebook, embed = flat["quantize.embedding.weight"].shape
    z = flat["quant_conv.weight"].shape[1]
    n_levels = 1 + max(int(k.split(".")[2]) for k in flat
                       if k.startswith("encoder.down."))
    ch_mult = tuple(
        flat[f"encoder.down.{i}.block.0.conv1.weight"].shape[0] // ch
        for i in range(n_levels))
    n_res = 1 + max(int(k.split(".")[4]) for k in flat
                    if k.startswith("encoder.down.0.block."))
    return RestoreFormerConfig(ch=ch, ch_mult=ch_mult, num_res_blocks=n_res,
                               z_channels=z, embed_dim=embed,
                               codebook_size=codebook, in_ch=in_ch)


def load_restoreformer(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    if any(k.startswith("params_ema.") for k in flat):
        flat = {k.split(".", 1)[1]: v for k, v in flat.items()
                if k.startswith("params_ema.")}
    cfg = detect_restoreformer_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not a RestoreFormer checkpoint")
    return RestoreFormer(cfg), nest(flat)
