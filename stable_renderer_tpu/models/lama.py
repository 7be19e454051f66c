"""LaMa — large-mask inpainting with Fast Fourier Convolutions.

Capability match for the reference's chainner LaMa
(reference: comfyUI/comfy_extras/chainner_models/architecture/LaMa.py —
FourierUnit :83-221, SpectralTransform :224-279, FFC :282-388, FFC_BN_ACT
:391-442, FFCResnetBlock :444-506, FFCResNetGenerator :519-663, LaMa wrapper
:666-694). Functional JAX, NHWC, torch param layout
(``model.model.{idx}`` Sequential indices).

TPU notes: the FFC global branch is an rfft2 -> 1x1 conv over stacked
real/imag channels -> irfft2 — jnp.fft lowers to XLA's FFT, so the global
receptive field costs O(HW log HW) with no giant conv kernels. All paddings
are reflect, matching the torch padding_mode."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.dat import _bn  # BatchNorm2d inference


@dataclass(frozen=True)
class LaMaConfig:
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18
    ratio_g: float = 0.75
    max_features: int = 1024
    in_nc: int = 4
    out_nc: int = 3


TINY_LAMA_CONFIG = LaMaConfig(ngf=8, n_downsampling=2, n_blocks=2,
                              max_features=64)


def _reflect_conv(p: dict, x: jax.Array, k: int, stride: int = 1,
                  pad: Optional[int] = None) -> jax.Array:
    """Conv2d with reflect padding (torch padding_mode='reflect')."""
    pad = k // 2 if pad is None else pad
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    w = p["weight"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _conv_transpose_s2(p: dict, x: jax.Array) -> jax.Array:
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1): fractionally
    strided conv with the flipped, transposed kernel and (1, 2) padding."""
    w = p["weight"].astype(x.dtype)  # (in, out, 3, 3)
    w2 = jnp.flip(w, (-2, -1)).transpose(1, 0, 2, 3)  # (out, in, 3, 3)
    out = jax.lax.conv_general_dilated(
        x, w2, window_strides=(1, 1), padding=[(1, 2), (1, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "OIHW", "NHWC"))
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _fourier_unit(p: dict, x: jax.Array) -> jax.Array:
    """FourierUnit (LaMa.py:126-221): rfft2 -> 1x1 conv on stacked
    real/imag -> irfft2, ortho norm."""
    b, h, w, c = x.shape
    f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
    # channel-major (c, 2) stacking like torch's permute/view
    stacked = jnp.stack([f.real, f.imag], axis=-1)  # (b,h,w2,c,2)
    stacked = stacked.reshape(b, h, f.shape[2], 2 * c)
    y = _reflect_conv(p["conv_layer"], stacked, 1, pad=0)
    y = jax.nn.relu(_bn(p["bn"], y))
    y = y.reshape(b, h, f.shape[2], c, 2)
    comp = jax.lax.complex(y[..., 0], y[..., 1])
    out = jnp.fft.irfft2(comp, s=(h, w), axes=(1, 2), norm="ortho")
    return out.astype(x.dtype)


def _spectral_transform(p: dict, x: jax.Array) -> jax.Array:
    """SpectralTransform, stride 1, LFU disabled (LaMa.py:259-279)."""
    h = jax.nn.relu(_bn(p["conv1"]["1"], _reflect_conv(p["conv1"]["0"], x, 1, pad=0)))
    out = _fourier_unit(p["fu"], h)
    return _reflect_conv(p["conv2"], h + out, 1, pad=0)


def _ffc_bn_act(p: dict, x_l: jax.Array, x_g: Union[jax.Array, int],
                k: int, stride: int, ratio_gin: float, ratio_gout: float,
                relu: bool = True) -> Tuple[jax.Array, Union[jax.Array, int]]:
    """FFC + BN + ReLU over the (local, global) pair (LaMa.py:282-442)."""
    ffc = p["ffc"]
    out_l: Union[jax.Array, int] = 0
    out_g: Union[jax.Array, int] = 0
    if ratio_gout != 1:
        out_l = _reflect_conv(ffc["convl2l"], x_l, k, stride)
        if ratio_gin > 0 and isinstance(x_g, jax.Array):
            out_l = out_l + _reflect_conv(ffc["convg2l"], x_g, k, stride)
    if ratio_gout != 0:
        out_g = _reflect_conv(ffc["convl2g"], x_l, k, stride)
        if ratio_gin > 0 and isinstance(x_g, jax.Array):
            out_g = out_g + _spectral_transform(ffc["convg2g"], x_g)
    if ratio_gout != 1:
        out_l = _bn(p["bn_l"], out_l)
        if relu:
            out_l = jax.nn.relu(out_l)
    if ratio_gout != 0:
        out_g = _bn(p["bn_g"], out_g)
        if relu:
            out_g = jax.nn.relu(out_g)
    return out_l, out_g


class LaMa:
    def __init__(self, config: LaMaConfig = LaMaConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return 1

    def apply(self, params: dict, img: jax.Array, mask: jax.Array) -> jax.Array:
        """img (B,H,W,3) in [0,1], mask (B,H,W,1) with 1 = hole.
        Returns the inpainted composite (LaMa.forward, LaMa.py:690-694)."""
        cfg = self.config
        b, h_in, w_in, _ = img.shape
        pad_mod = 2 ** cfg.n_downsampling
        ph = (pad_mod - h_in % pad_mod) % pad_mod
        pw = (pad_mod - w_in % pad_mod) % pad_mod
        if ph or pw:
            img_p = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            mask_p = jnp.pad(mask, ((0, 0), (0, ph), (0, pw), (0, 0)))
        else:
            img_p, mask_p = img, mask

        masked = img_p * (1.0 - mask_p)
        x = jnp.concatenate([masked, mask_p], -1)
        m = params["model"]["model"]

        # index 0 is the structural ReflectionPad(3); _reflect_conv's internal
        # k//2 reflect pad is exactly equivalent for the k=7 pad=0 conv
        idx = 1
        x_l, x_g = _ffc_bn_act(m[str(idx)], x, 0, 7, 1, 0.0, 0.0)
        idx += 1
        for i in range(cfg.n_downsampling):
            gout = cfg.ratio_g if i == cfg.n_downsampling - 1 else 0.0
            x_l, x_g = _ffc_bn_act(m[str(idx)], x_l, x_g, 3, 2, 0.0, gout)
            idx += 1
        for _ in range(cfg.n_blocks):
            bp = m[str(idx)]
            id_l, id_g = x_l, x_g
            x_l, x_g = _ffc_bn_act(bp["conv1"], x_l, x_g, 3, 1,
                                   cfg.ratio_g, cfg.ratio_g)
            x_l, x_g = _ffc_bn_act(bp["conv2"], x_l, x_g, 3, 1,
                                   cfg.ratio_g, cfg.ratio_g)
            x_l, x_g = id_l + x_l, id_g + x_g
            idx += 1
        x = jnp.concatenate([x_l, x_g], -1)
        idx += 1  # ConcatTupleLayer
        for _ in range(cfg.n_downsampling):
            x = _conv_transpose_s2(m[str(idx)], x)
            x = jax.nn.relu(_bn(m[str(idx + 1)], x))
            idx += 3  # convtranspose + bn + relu
        idx += 1  # ReflectionPad(3)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        out = jax.nn.sigmoid(_reflect_conv(m[str(idx)], x, 7, pad=0))

        out = out[:, : h_in, : w_in]
        mask = mask[:, : h_in, : w_in]
        return mask * out + (1.0 - mask) * img

    # --- random init (torch layout) ---

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 8192))

        def conv(i, o, k=3, bias=False):
            p = {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def convt(i, o):
            return {"weight": jax.random.normal(next(keys), (i, o, 3, 3), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        def bn(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                    "running_mean": jnp.zeros((c,), dtype),
                    "running_var": jnp.ones((c,), dtype)}

        mf = cfg.max_features

        def ffc_plain(i, o, k):
            return {"ffc": {"convl2l": conv(i, o, k)}, "bn_l": bn(o)}

        def ffc_split(i, o, gout):
            ocg = int(o * gout)
            ocl = o - ocg
            return {"ffc": {"convl2l": conv(i, ocl, 3),
                            "convl2g": conv(i, ocg, 3)},
                    "bn_l": bn(ocl), "bn_g": bn(ocg)}

        def spectral(cg):
            half = cg // 2
            return {"conv1": {"0": conv(cg, half, 1), "1": bn(half)},
                    "fu": {"conv_layer": conv(2 * half, 2 * half, 1), "bn": bn(2 * half)},
                    "conv2": conv(half, cg, 1)}

        def ffc_res(dim):
            cg = int(dim * cfg.ratio_g)
            cl = dim - cg
            def one():
                return {"ffc": {"convl2l": conv(cl, cl, 3),
                                "convl2g": conv(cl, cg, 3),
                                "convg2l": conv(cg, cl, 3),
                                "convg2g": spectral(cg)},
                        "bn_l": bn(cl), "bn_g": bn(cg)}
            return {"conv1": one(), "conv2": one()}

        m: Dict[str, dict] = {}
        m["1"] = ffc_plain(cfg.in_nc, cfg.ngf, 7)
        idx = 2
        for i in range(cfg.n_downsampling):
            cin = min(mf, cfg.ngf * 2 ** i)
            cout = min(mf, cfg.ngf * 2 ** (i + 1))
            if i == cfg.n_downsampling - 1:
                m[str(idx)] = ffc_split(cin, cout, cfg.ratio_g)
            else:
                m[str(idx)] = ffc_plain(cin, cout, 3)
            idx += 1
        bottleneck = min(mf, cfg.ngf * 2 ** cfg.n_downsampling)
        for _ in range(cfg.n_blocks):
            m[str(idx)] = ffc_res(bottleneck)
            idx += 1
        idx += 1  # concat
        for i in range(cfg.n_downsampling):
            mult = 2 ** (cfg.n_downsampling - i)
            cin = min(mf, cfg.ngf * mult)
            cout = min(mf, cfg.ngf * mult // 2)
            m[str(idx)] = convt(cin, cout)
            m[str(idx + 1)] = bn(cout)
            idx += 3
        idx += 1  # reflect pad
        m[str(idx)] = conv(cfg.ngf, cfg.out_nc, 7, bias=True)
        return {"model": {"model": m}}


def detect_lama_config(flat: Dict[str, np.ndarray]) -> Optional[LaMaConfig]:
    key = None
    for k in flat:
        if k.endswith("model.1.ffc.convl2l.weight"):
            key = k
            break
    if key is None or not any(".ffc.convg2g.fu.conv_layer" in k for k in flat):
        return None
    in_nc = flat[key].shape[1]
    ngf = flat[key].shape[0]
    return LaMaConfig(ngf=ngf, in_nc=in_nc)


def load_lama(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    # the official checkpoints use 'generator.model.*' (LaMa.py:680-683)
    flat = {k.replace("generator.model", "model.model"): v
            for k, v in flat.items()}
    flat = {k: v for k, v in flat.items()
            if not k.endswith("num_batches_tracked")}
    cfg = detect_lama_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not a LaMa checkpoint")
    return LaMa(cfg), nest(flat)
