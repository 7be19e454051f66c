"""SCUNet — Swin-Conv-UNet blind denoiser.

Capability match for the reference's chainner SCUNet
(reference: comfyUI/comfy_extras/chainner_models/architecture/SCUNet.py —
WMSA :19-165, Block :167-200, ConvTransBlock :203-271, SCUNet UNet assembly
:273-441). Functional JAX, NHWC, torch param layout (m_head/m_down1..3/
m_body/m_up3..1/m_tail Sequential indices) so real checkpoints load.

TPU notes: the stride-2 kernel-2 ConvTranspose upsample has no overlap, so
it lowers to one einsum + depth-to-space reshuffle (pure MXU work, no
scatter); shifted-window masks are trace-time numpy like models/swinir.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, layer_norm, linear
from stable_renderer_tpu.models.swinir import _shift_attn_mask


@dataclass(frozen=True)
class SCUNetConfig:
    dim: int = 64
    config: Tuple[int, ...] = (4, 4, 4, 4, 4, 4, 4)
    head_dim: int = 32
    window_size: int = 8
    in_nc: int = 3


TINY_SCUNET_CONFIG = SCUNetConfig(dim=16, config=(1, 1, 1, 1, 1, 1, 1),
                                  head_dim=8, window_size=4)


def _wmsa(p: dict, x: jax.Array, head_dim: int, ws: int, shifted: bool) -> jax.Array:
    """Window MSA (SCUNet.py:19-165). x: (B, H, W, C)."""
    b, h, w, c = x.shape
    heads = c // head_dim
    if shifted:
        x = jnp.roll(x, (-(ws // 2), -(ws // 2)), axis=(1, 2))
    win = x.reshape(b, h // ws, ws, w // ws, ws, c)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ws * ws, c)  # (B,nW,N,C)
    qkv = linear(p["embedding_layer"], win)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_of(t):
        return t.reshape(b, t.shape[1], ws * ws, heads, head_dim).transpose(0, 3, 1, 2, 4)

    q, k, v = heads_of(q), heads_of(k), heads_of(v)
    sim = jnp.einsum("bhwpc,bhwqc->bhwpq", q, k) * (head_dim ** -0.5)
    # relative embedding: params stored (heads, 2w-1, 2w-1) (SCUNet.py:45-51)
    cord = np.array([[i, j] for i in range(ws) for j in range(ws)])
    rel = cord[:, None, :] - cord[None, :, :] + ws - 1
    bias = p["relative_position_params"][:, rel[:, :, 0], rel[:, :, 1]]
    sim = sim + bias[None, :, None]
    if shifted:
        mask = _shift_attn_mask(h, w, ws, ws // 2)  # (nW, N, N) 0/-100
        sim = sim + jnp.asarray(mask)[None, None]
    probs = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhwij,bhwjc->bhwic", probs, v)
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, -1, ws * ws, c)
    out = linear(p["linear"], out)
    out = out.reshape(b, h // ws, w // ws, ws, ws, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    if shifted:
        out = jnp.roll(out, (ws // 2, ws // 2), axis=(1, 2))
    return out


def _trans_block(p: dict, x: jax.Array, head_dim: int, ws: int,
                 shifted: bool) -> jax.Array:
    """Swin Block (SCUNet.py:167-200). x: (B, H, W, C)."""
    x = x + _wmsa(p["msa"], layer_norm(p["ln1"], x), head_dim, ws, shifted)
    h = layer_norm(p["ln2"], x)
    h = linear(p["mlp"]["2"], jax.nn.gelu(linear(p["mlp"]["0"], h),
                                          approximate=False))
    return x + h


def _conv_trans_block(p: dict, x: jax.Array, conv_dim: int, head_dim: int,
                      ws: int, shifted: bool) -> jax.Array:
    """ConvTransBlock (SCUNet.py:203-271): 1x1 split into conv branch +
    transformer branch, re-merged by 1x1, residual."""
    y = conv2d(p["conv1_1"], x)
    conv_x, trans_x = y[..., :conv_dim], y[..., conv_dim:]
    cb = conv2d(p["conv_block"]["0"], conv_x, padding=1)
    cb = conv2d(p["conv_block"]["2"], jax.nn.relu(cb), padding=1)
    conv_x = cb + conv_x
    trans_x = _trans_block(p["trans_block"], trans_x, head_dim, ws, shifted)
    res = conv2d(p["conv1_2"], jnp.concatenate([conv_x, trans_x], -1))
    return x + res


def _conv_down(p: dict, x: jax.Array) -> jax.Array:
    """stride-2 kernel-2 conv (no bias)."""
    return conv2d(p, x, stride=2, padding=0)


def _conv_transpose_up(p: dict, x: jax.Array) -> jax.Array:
    """stride-2 kernel-2 ConvTranspose2d, torch weight (in, out, 2, 2):
    no kernel overlap -> einsum + depth-to-space (MXU-only)."""
    w = p["weight"].astype(x.dtype)  # (Cin, Cout, 2, 2)
    b, h, ww, c = x.shape
    t = jnp.einsum("bhwc,coij->bhwijo", x, w)
    t = t.reshape(b, h, ww, 2, 2, -1).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(b, h * 2, ww * 2, -1)


class SCUNet:
    def __init__(self, config: SCUNetConfig = SCUNetConfig()):
        self.config = config

    @property
    def scale(self) -> int:
        return 1

    def _stage(self, params: dict, x: jax.Array, name: str, n_blocks: int,
               conv_dim: int, first_up: bool = False,
               last_down: bool = False) -> jax.Array:
        cfg = self.config
        sp = params[name]
        idx = 0
        if first_up:
            x = _conv_transpose_up(sp["0"], x)
            idx = 1
        for i in range(n_blocks):
            x = _conv_trans_block(sp[str(idx + i)], x, conv_dim, cfg.head_dim,
                                  cfg.window_size, shifted=bool(i % 2))
        if last_down:
            x = _conv_down(sp[str(idx + n_blocks)], x)
        return x

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C) in [0,1] -> denoised (B, H, W, C)."""
        cfg = self.config
        d = cfg.dim
        b, h_in, w_in, _ = x.shape
        pad = 8 * cfg.window_size  # the UNet's 3 downsamples x window size
        ph, pw = (pad - h_in % pad) % pad, (pad - w_in % pad) % pad
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        c = cfg.config
        x1 = conv2d(params["m_head"]["0"], x, padding=1)
        x2 = self._stage(params, x1, "m_down1", c[0], d // 2, last_down=True)
        x3 = self._stage(params, x2, "m_down2", c[1], d, last_down=True)
        x4 = self._stage(params, x3, "m_down3", c[2], 2 * d, last_down=True)
        y = self._stage(params, x4, "m_body", c[3], 4 * d)
        y = self._stage(params, y + x4, "m_up3", c[4], 2 * d, first_up=True)
        y = self._stage(params, y + x3, "m_up2", c[5], d, first_up=True)
        y = self._stage(params, y + x2, "m_up1", c[6], d // 2, first_up=True)
        out = conv2d(params["m_tail"]["0"], y + x1, padding=1)
        return out[:, :h_in, :w_in]

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 8192))

        def conv(i, o, k=3, bias=False):
            p = {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def convt(i, o):
            return {"weight": jax.random.normal(next(keys), (i, o, 2, 2), dtype) * 0.05}

        def lin(i, o):
            return {"weight": jax.random.normal(next(keys), (o, i), dtype) * 0.05,
                    "bias": jnp.zeros((o,), dtype)}

        def norm(ch):
            return {"weight": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}

        ws = cfg.window_size

        def ctb(cd, td):
            heads = td // cfg.head_dim
            return {
                "conv1_1": conv(cd + td, cd + td, 1, bias=True),
                "conv1_2": conv(cd + td, cd + td, 1, bias=True),
                "conv_block": {"0": conv(cd, cd), "2": conv(cd, cd)},
                "trans_block": {
                    "ln1": norm(td), "ln2": norm(td),
                    "msa": {
                        "embedding_layer": lin(td, 3 * td),
                        "linear": lin(td, td),
                        "relative_position_params": jax.random.normal(
                            next(keys), (heads, 2 * ws - 1, 2 * ws - 1), dtype) * 0.02,
                    },
                    "mlp": {"0": lin(td, 4 * td), "2": lin(4 * td, td)},
                },
            }

        d, c = cfg.dim, cfg.config
        params: Dict[str, dict] = {
            "m_head": {"0": conv(cfg.in_nc, d)},
            "m_tail": {"0": conv(d, cfg.in_nc)},
        }
        params["m_down1"] = {str(i): ctb(d // 2, d // 2) for i in range(c[0])}
        params["m_down1"][str(c[0])] = conv(d, 2 * d, 2)
        params["m_down2"] = {str(i): ctb(d, d) for i in range(c[1])}
        params["m_down2"][str(c[1])] = conv(2 * d, 4 * d, 2)
        params["m_down3"] = {str(i): ctb(2 * d, 2 * d) for i in range(c[2])}
        params["m_down3"][str(c[2])] = conv(4 * d, 8 * d, 2)
        params["m_body"] = {str(i): ctb(4 * d, 4 * d) for i in range(c[3])}
        params["m_up3"] = {"0": convt(8 * d, 4 * d)}
        params["m_up3"].update({str(1 + i): ctb(2 * d, 2 * d) for i in range(c[4])})
        params["m_up2"] = {"0": convt(4 * d, 2 * d)}
        params["m_up2"].update({str(1 + i): ctb(d, d) for i in range(c[5])})
        params["m_up1"] = {"0": convt(2 * d, d)}
        params["m_up1"].update({str(1 + i): ctb(d // 2, d // 2) for i in range(c[6])})
        return params


def detect_scunet_config(flat: Dict[str, np.ndarray]) -> Optional[SCUNetConfig]:
    if "m_head.0.weight" not in flat or "m_down1.0.trans_block.ln1.weight" not in flat:
        return None
    dim = flat["m_head.0.weight"].shape[0]
    in_nc = flat["m_head.0.weight"].shape[1]

    def n_blocks(stage: str, offset: int = 0) -> int:
        i = offset
        while f"{stage}.{i}.trans_block.ln1.weight" in flat:
            i += 1
        return i - offset

    cfg = (n_blocks("m_down1"), n_blocks("m_down2"), n_blocks("m_down3"),
           n_blocks("m_body"), n_blocks("m_up3", 1), n_blocks("m_up2", 1),
           n_blocks("m_up1", 1))
    heads = flat["m_down1.0.trans_block.msa.relative_position_params"].shape[0]
    head_dim = (dim // 2) // heads
    wtab = flat["m_down1.0.trans_block.msa.relative_position_params"].shape[1]
    window_size = (wtab + 1) // 2
    return SCUNetConfig(dim=dim, config=cfg, head_dim=head_dim,
                        window_size=window_size, in_nc=in_nc)


def load_scunet(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    cfg = detect_scunet_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not a SCUNet checkpoint")
    return SCUNet(cfg), nest(flat)
