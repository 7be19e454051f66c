"""TAESD — tiny autoencoder for fast latent preview/decode.

Capability match for the reference's TAESD (reference: comfy/taesd/taesd.py,
used by latent_preview for cheap on-the-fly decodes). Param keys use the torch
Sequential indices of the original ("decoder.1.weight",
"decoder.3.conv.0.weight", ...) so official taesd_encoder/decoder .pth files
load directly via models/weights.py.

Layer plan (taesd.py):
  Encoder: conv(3,64) B c2 B B B c2 B B B c2 B B B conv(64,4)
  Decoder: Clamp conv(4,64) ReLU  B B B U c  B B B U c  B B B U c  B conv(64,3)
  (B = residual block of 3 convs + ReLUs; c2 = stride-2 conv no-bias;
   U = nearest x2; c = conv no-bias)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import conv2d, upsample_nearest_2x

_ENC_PLAN: List[Tuple[str, ...]] = (
    [("conv", 3, 64)]
    + [("block", 64)]
    + [("down", 64), ("block", 64), ("block", 64), ("block", 64)]
    + [("down", 64), ("block", 64), ("block", 64), ("block", 64)]
    + [("down", 64), ("block", 64), ("block", 64), ("block", 64)]
    + [("conv", 64, 4)]
)
_DEC_PLAN: List[Tuple[str, ...]] = (
    [("clamp",), ("conv", 4, 64), ("relu",)]
    + [("block", 64), ("block", 64), ("block", 64), ("up",), ("convnb", 64, 64)]
    + [("block", 64), ("block", 64), ("block", 64), ("up",), ("convnb", 64, 64)]
    + [("block", 64), ("block", 64), ("block", 64), ("up",), ("convnb", 64, 64)]
    + [("block", 64), ("conv", 64, 3)]
)

LATENT_MAGNITUDE = 3.0
LATENT_SHIFT = 0.5


def _block(p: dict, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(conv2d(p["conv"]["0"], x, padding=1))
    h = jax.nn.relu(conv2d(p["conv"]["2"], h, padding=1))
    h = conv2d(p["conv"]["4"], h, padding=1)
    return jax.nn.relu(h + x)


def _run_plan(plan, params: dict, x: jax.Array) -> jax.Array:
    for idx, layer in enumerate(plan):
        kind = layer[0]
        key = str(idx)
        if kind == "conv" or kind == "convnb":
            x = conv2d(params[key], x, padding=1)
        elif kind == "down":
            x = conv2d(params[key], x, stride=2, padding=1)
        elif kind == "block":
            x = _block(params[key], x)
        elif kind == "up":
            x = upsample_nearest_2x(x)
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "clamp":
            x = jnp.tanh(x / 3.0) * 3.0
    return x


class TAESD:
    def encode(self, params: dict, x: jax.Array) -> jax.Array:
        """pixels (N,H,W,3) in [0,1] -> scaled SD latent (N,H/8,W/8,4)."""
        raw = _run_plan(_ENC_PLAN, params["encoder"], x)
        return (raw / LATENT_MAGNITUDE) + 0.0  # taesd scale_latents

    def decode(self, params: dict, z: jax.Array) -> jax.Array:
        """SD latent -> pixels (N, 8h, 8w, 3) in [0,1]."""
        out = _run_plan(_DEC_PLAN, params["decoder"], z)
        return jnp.clip(out, 0.0, 1.0)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        keys = iter(jax.random.split(key, 512))

        def conv(i, o, bias=True):
            p = {"weight": jax.random.normal(next(keys), (o, i, 3, 3), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def build(plan):
            params: Dict[str, dict] = {}
            for idx, layer in enumerate(plan):
                kind = layer[0]
                if kind == "conv":
                    params[str(idx)] = conv(layer[1], layer[2])
                elif kind == "convnb":
                    params[str(idx)] = conv(layer[1], layer[2], bias=False)
                elif kind == "down":
                    params[str(idx)] = conv(layer[1], layer[1], bias=False)
                elif kind == "block":
                    n = layer[1]
                    params[str(idx)] = {
                        "conv": {"0": conv(n, n), "2": conv(n, n), "4": conv(n, n)}
                    }
            return params

        return {"encoder": build(_ENC_PLAN), "decoder": build(_DEC_PLAN)}

    @staticmethod
    def load(encoder_path: str | None = None, decoder_path: str | None = None) -> dict:
        """Load official taesd .pth/.safetensors files."""
        from stable_renderer_tpu.models.weights import load_state_dict, nest

        params: dict = {"encoder": {}, "decoder": {}}
        if encoder_path:
            params["encoder"] = nest(load_state_dict(encoder_path), "")
        if decoder_path:
            params["decoder"] = nest(load_state_dict(decoder_path), "")
        return params
