"""SPSR — structure-preserving super-resolution with a gradient branch.

Capability match for the reference's chainner SPSR
(reference: comfyUI/comfy_extras/chainner_models/architecture/SPSR.py —
Get_gradient_nopadding :13-36, SPSRNet assembly :38-338, forward :338-420;
block.py RRDB :286-352, ResidualDenseBlock_5C :356-460, upconv_block
:519-560). Functional JAX, NHWC, old-arch torch key layout
(model.1.sub.{i}.RDB{k}.conv{m}.0.*).

Two trunks: the ESRGAN RRDB SR trunk (23 blocks, features tapped every 5
blocks) and a gradient branch fed by the per-channel Sobel-magnitude map,
fused via concat+RRDB at four taps, then a final fusion block."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, upsample_nearest_2x


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _c(p: dict) -> dict:
    """Tolerant conv access: chainner SPSR checkpoints wrap some convs in a
    Sequential ('X.0.weight') and leave others bare ('X.weight')."""
    return p if "weight" in p else p["0"]


def gradient_map(x: jax.Array) -> jax.Array:
    """Per-channel Sobel-ish gradient magnitude (SPSR.py:13-36)."""
    kv = jnp.asarray([[0, -1, 0], [0, 0, 0], [0, 1, 0]], jnp.float32)
    kh = jnp.asarray([[0, 0, 0], [-1, 0, 1], [0, 0, 0]], jnp.float32)
    c = x.shape[-1]
    wv = jnp.tile(kv[None, None], (c, 1, 1, 1))  # (C,1,3,3) depthwise
    wh = jnp.tile(kh[None, None], (c, 1, 1, 1))

    def dw(w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "OIHW", "NHWC"), feature_group_count=c)

    return jnp.sqrt(dw(wv) ** 2 + dw(wh) ** 2 + 1e-6)


def _rdb(p: dict, x: jax.Array) -> jax.Array:
    x1 = _lrelu(conv2d(_c(p["conv1"]), x, padding=1))
    x2 = _lrelu(conv2d(_c(p["conv2"]), jnp.concatenate([x, x1], -1), padding=1))
    x3 = _lrelu(conv2d(_c(p["conv3"]), jnp.concatenate([x, x1, x2], -1), padding=1))
    x4 = _lrelu(conv2d(_c(p["conv4"]), jnp.concatenate([x, x1, x2, x3], -1), padding=1))
    x5 = conv2d(_c(p["conv5"]), jnp.concatenate([x, x1, x2, x3, x4], -1), padding=1)
    return x + 0.2 * x5


def _rrdb(p: dict, x: jax.Array) -> jax.Array:
    out = _rdb(p["RDB1"], x)
    out = _rdb(p["RDB2"], out)
    out = _rdb(p["RDB3"], out)
    return x + 0.2 * out


@dataclass(frozen=True)
class SPSRConfig:
    num_filters: int = 64
    num_blocks: int = 23
    scale: int = 4
    in_nc: int = 3
    out_nc: int = 3


TINY_SPSR_CONFIG = SPSRConfig(num_filters=16, num_blocks=4, scale=2)


class SPSRNet:
    def __init__(self, config: SPSRConfig = SPSRConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return self.config.scale

    def _upsample_chain(self, p: dict, x: jax.Array, conv_idxs) -> jax.Array:
        for i in conv_idxs:
            x = _lrelu(conv2d(_c(p[str(i)]), upsample_nearest_2x(x), padding=1))
        return x

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        cfg = self.config
        n_up = int(math.log2(cfg.scale))
        m = params["model"]

        x_grad = gradient_map(x)
        feat = conv2d(_c(m["0"]), x, padding=1)

        # trunk: 23 RRDBs with taps every 5 (SPSR.py:496-527)
        sub = m["1"]["sub"]
        nb = cfg.num_blocks
        tap_every = max(nb // 4, 1)
        h = feat
        taps = []
        for i in range(nb):
            h = _rrdb(sub[str(i)], h)
            if (i + 1) % tap_every == 0 and len(taps) < 4:
                taps.append(h)
        while len(taps) < 4:
            taps.append(h)
        h = conv2d(_c(sub[str(nb)]), h, padding=1)  # trailing LR conv
        h = feat + h
        # upsample chain: conv indices 3, 6 (scale 4) or 3 (scale 2); then
        # HR convs at the following even indices (old-arch layout)
        idx = 3
        for _ in range(n_up):
            h = _lrelu(conv2d(_c(m[str(idx)]), upsample_nearest_2x(h), padding=1))
            idx += 3
        hr0 = idx - 1
        h = _lrelu(conv2d(_c(m[str(hr0)]), h, padding=1))
        h = conv2d(_c(m[str(hr0 + 2)]), h, padding=1)
        h = conv2d(_c(params["HR_conv1_new"]), h, padding=1)  # ref applies twice

        # gradient branch
        b = conv2d(_c(params["b_fea_conv"]), x_grad, padding=1)
        cat = b
        for k in range(1, 5):
            cat = jnp.concatenate([cat, taps[k - 1]], -1)
            cat = _rrdb(params[f"b_block_{k}"], cat)
            cat = conv2d(_c(params[f"b_concat_{k}"]), cat, padding=1)
        cat = conv2d(_c(params["b_LR_conv"]), cat, padding=1)
        cat = cat + b
        bm = params["b_module"]
        bi = 1
        for _ in range(n_up):
            cat = _lrelu(conv2d(_c(bm[str(bi)]), upsample_nearest_2x(cat), padding=1))
            bi += 3
        branch = _lrelu(conv2d(_c(bm[str(bi - 1)]), cat, padding=1))
        branch = conv2d(_c(bm[str(bi + 1)]), branch, padding=1)

        # final fusion (SPSR.py:374-380)
        f = jnp.concatenate([branch, h], -1)
        f = _rrdb(params["f_block"], f)
        f = conv2d(_c(params["f_concat"]), f, padding=1)
        f = _lrelu(conv2d(_c(params["f_HR_conv0"]), f, padding=1))
        return conv2d(_c(params["f_HR_conv1"]), f, padding=1)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 8192))
        nf, gc = cfg.num_filters, max(cfg.num_filters // 2, 8)

        def conv(i, o, k=3):
            return {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.02,
                    "bias": jnp.zeros((o,), dtype)}

        def rdb(n):
            return {"conv1": conv(n, gc), "conv2": conv(n + gc, gc),
                    "conv3": conv(n + 2 * gc, gc), "conv4": conv(n + 3 * gc, gc),
                    "conv5": conv(n + 4 * gc, n)}

        def rrdb(n):
            return {"RDB1": rdb(n), "RDB2": rdb(n), "RDB3": rdb(n)}

        n_up = int(math.log2(cfg.scale))
        model = {"0": conv(cfg.in_nc, nf)}
        model["1"] = {"sub": {str(i): rrdb(nf) for i in range(cfg.num_blocks)}}
        model["1"]["sub"][str(cfg.num_blocks)] = conv(nf, nf)
        idx = 3
        for _ in range(n_up):
            model[str(idx)] = conv(nf, nf)
            idx += 3
        model[str(idx - 1)] = conv(nf, nf)       # HR_conv0_new
        model[str(idx + 1)] = conv(nf, nf)       # HR_conv1_new
        b_module = {}
        bi = 1
        for _ in range(n_up):
            b_module[str(bi)] = conv(nf, nf)
            bi += 3
        b_module[str(bi - 1)] = conv(nf, nf)
        b_module[str(bi + 1)] = conv(nf, nf)
        params = {
            "model": model,
            "HR_conv1_new": model[str(idx + 1)],
            "b_fea_conv": conv(cfg.in_nc, nf),
            "b_LR_conv": conv(nf, nf),
            "b_module": b_module,
            "conv_w": conv(nf, cfg.out_nc, 1),
            "f_concat": conv(2 * nf, nf),
            "f_block": rrdb(2 * nf),
            "f_HR_conv0": conv(nf, nf),
            "f_HR_conv1": conv(nf, cfg.out_nc),
        }
        for k in range(1, 5):
            params[f"b_block_{k}"] = rrdb(2 * nf)
            params[f"b_concat_{k}"] = conv(2 * nf, nf)
        return params


def detect_spsr_config(flat: Dict[str, np.ndarray]) -> Optional[SPSRConfig]:
    if "b_fea_conv.weight" not in flat and "b_fea_conv.0.weight" not in flat:
        return None
    if "model.0.weight" not in flat:
        return None
    nf = flat["model.0.weight"].shape[0]
    in_nc = flat["model.0.weight"].shape[1]
    out_key = ("f_HR_conv1.0.bias" if "f_HR_conv1.0.bias" in flat
               else "f_HR_conv1.bias")
    out_nc = flat[out_key].shape[0]
    nb = 0
    for k in flat:
        parts = k.split(".")
        if len(parts) >= 4 and parts[0] == "model" and parts[2] == "sub":
            nb = max(nb, int(parts[3]))
    # upsample convs in b_module at indices 1, 4, ... (every 3)
    n_up = len({k.split(".")[1] for k in flat
                if k.startswith("b_module.")
                and int(k.split(".")[1]) % 3 == 1 and k.endswith("weight")})
    return SPSRConfig(num_filters=nf, num_blocks=nb, scale=2 ** max(n_up, 1),
                      in_nc=in_nc, out_nc=out_nc)


def load_spsr(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    cfg = detect_spsr_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not an SPSR checkpoint")
    return SPSRNet(cfg), nest(flat)
