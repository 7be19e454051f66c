"""Int8 conv-path quantization — the TPU analogue of the reference's fp8 modes.

The reference exposes per-component reduced-precision flags (fp8_e4m3fn /
fp8_e5m2 unet+text-encoder+vae, comfy/cli_args.py:40-130 and
model_management fp8 casts). TPU v5e has no fp8, but the MXU runs int8 at
2x the bf16 rate — measured on-chip: 3x3 convs 42->60 TOP/s at 64x64x320 and
68->88 at 16x16x1280 including the requantize, plus halved weight HBM
traffic (the 8x8 UNet levels are weight-bandwidth-bound).

STATUS — measured on-chip, know what you're buying: isolated int8 convs beat
bf16 by 1.3-1.4x (42->60 TOP/s at 64x64x320), but the DYNAMIC activation
quantization (full-tensor max reduce + round/clip before every conv, dequant
after) costs more than the MXU saves at SD shapes: full UNet 19.5 -> 46.4
ms/eval, VAE decode 24.8 -> 26.5 ms. The flag therefore buys WEIGHT MEMORY
(conv weights halve: int8 vs bf16 — relevant for multi-model serving), not
single-chip speed. Speed would need static calibrated activation scales or a
Pallas conv with a fused quant prologue — future work, documented in PERF.md
("Negative result: int8 dynamic-quant conv path"). Output fidelity proxy:
cosine(bf16, int8) = 0.9986 on a random-weight SD1.5 UNet eval.

Scheme (weights static, activations dynamic — standard PTQ):
  * weights: per-output-channel symmetric int8, quantized once at load time,
    stored HWIO (the conv's native layout, killing the OIHW transpose too);
  * activations: per-tensor dynamic scale max|x|/127, quantized on the fly;
  * accumulation int32 on the MXU, dequantized by (act_scale * w_scale[O])
    into the activation dtype.

Only convolution weights quantize (``weight`` ndim==4): convs carry the
UNet/VAE FLOPs, while attention/linear stay bf16 (the flash kernel and the
fused-QKV path read raw weights). Opt-in via RenderConfig(int8_conv=True);
this trades a small amount of output fidelity for throughput, exactly like
the reference's fp8 switches.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_conv_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """{"weight": (O,I,kH,kW), "bias"?} -> int8 HWIO + per-O scale."""
    w = jnp.asarray(p["weight"]).astype(jnp.float32)
    o = w.shape[0]
    s = jnp.max(jnp.abs(w.reshape(o, -1)), axis=1) / 127.0   # (O,)
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s[:, None, None, None]), -127, 127)
    out: Dict[str, Any] = {
        # HWIO: conv-native layout, no per-call transpose
        "weight_q": jnp.transpose(q.astype(jnp.int8), (2, 3, 1, 0)),
        "w_scale": s,
    }
    if "bias" in p and p["bias"] is not None:
        out["bias"] = p["bias"]
    return out


def quantize_tree(params: Any) -> Any:
    """Walk a torch-layout param tree and quantize every conv leaf dict
    (a dict with a 4-D ``weight``). Norms (1-D weights) and linears (2-D)
    pass through untouched."""
    if isinstance(params, dict):
        w = params.get("weight")
        if w is not None and hasattr(w, "ndim") and w.ndim == 4:
            return quantize_conv_params(params)
        return {k: quantize_tree(v) for k, v in params.items()}
    return params


def quant_act(x: jax.Array):
    """Per-tensor dynamic symmetric int8: (q, scale)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def conv2d_q(p: Dict[str, Any], x: jax.Array, stride: int = 1,
             padding: int = 0) -> jax.Array:
    """Int8 conv with int32 MXU accumulation and f32 dequant."""
    q, s_x = quant_act(x)
    acc = jax.lax.conv_general_dilated(
        q,
        p["weight_q"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_x * p["w_scale"])
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)
