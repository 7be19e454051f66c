"""Int8 conv-path quantization — the TPU analogue of the reference's fp8 modes.

The reference exposes per-component reduced-precision flags (fp8_e4m3fn /
fp8_e5m2 unet+text-encoder+vae, comfy/cli_args.py:40-130 and
model_management fp8 casts). TPU v5e has no fp8, but the MXU runs int8 at
2x the bf16 rate — measured on-chip: 3x3 convs 42->60 TOP/s at 64x64x320 and
68->88 at 16x16x1280 including the requantize, plus halved weight HBM
traffic (the 8x8 UNet levels are weight-bandwidth-bound).

STATUS (round 4) — TWO activation-scale modes, measured on-chip:

  * DYNAMIC (round-3, kept as fallback): full-tensor max reduce + round/clip
    before every conv. The serializing reduce costs more than the MXU saves
    at SD shapes: full UNet 19.5 -> 46.4 ms/eval. Only buys WEIGHT MEMORY.
  * STATIC CALIBRATED (round-4, the speed path): per-conv activation scales
    measured once by ``calibrate_act_scales`` (one jitted eval that records
    max|x| at every conv input over a representative batch — e.g. the LCM
    schedule's sigmas x cfg 2). The quantize becomes a pure elementwise
    multiply/round/clip that XLA fuses into the producer's epilogue (no
    reduce, no serialization), and the dequant fuses into the conv output.

Scheme (standard PTQ):
  * weights: per-output-channel symmetric int8, quantized once at load time,
    stored HWIO (the conv's native layout, killing the OIHW transpose too);
  * activations: per-tensor symmetric int8 — static scale when calibrated
    (``a_scale`` key), dynamic max|x|/127 otherwise;
  * accumulation int32 on the MXU, dequantized by (act_scale * w_scale[O])
    into the activation dtype.

Only convolution weights quantize (``weight`` ndim==4): convs carry the
UNet/VAE FLOPs, while attention/linear stay bf16 (the flash kernel and the
fused-QKV path read raw weights). First/last convs (conv_in / conv_out)
stay bf16 by default (``DEFAULT_SKIP_RE``) — standard PTQ practice; they
are <1% of the FLOPs and carry the most fidelity. Opt-in via
RenderConfig(int8_conv=True); this trades a small amount of output fidelity
for throughput, exactly like the reference's fp8 switches.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger("sr_tpu.quant")

# conv paths kept in bf16 under the default skip policy: the UNet's first
# (input_blocks.0.0) and last (out.*) convs, the VAE's conv_in/conv_out and
# the 1x1 quant bridges — <1% of FLOPs, most of the end-to-end fidelity.
DEFAULT_SKIP_RE = re.compile(
    r"(^|\.)(input_blocks\.0\.0|out\.2|conv_in|conv_out|post_quant_conv|quant_conv)($|\.)"
)


def quantize_conv_params(p: Dict[str, Any],
                         a_scale: Optional[float] = None) -> Dict[str, Any]:
    """{"weight": (O,I,kH,kW), "bias"?} -> int8 HWIO + per-O scale.

    ``a_scale``: calibrated max|activation| for this conv's input; stored as
    the static per-tensor quant step (max/127) under ``a_scale``."""
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
    if a_scale is not None:
        out["a_scale"] = jnp.float32(max(float(a_scale), 1e-8) / 127.0)
    if "bias" in p and p["bias"] is not None:
        out["bias"] = p["bias"]
    return out


def _is_conv_leaf(node: Any) -> bool:
    if not isinstance(node, dict):
        return False
    w = node.get("weight")
    return w is not None and getattr(w, "ndim", 0) == 4


def quantize_tree(params: Any,
                  act_scales: Optional[Dict[str, Any]] = None,
                  skip_re: Optional[re.Pattern] = DEFAULT_SKIP_RE,
                  min_pixels: int = 0,
                  _path: str = "",
                  _missed: Optional[List[str]] = None) -> Any:
    """Walk a torch-layout param tree and quantize every conv leaf dict
    (a dict with a 4-D ``weight``). Norms (1-D weights) and linears (2-D)
    pass through untouched.

    ``act_scales``: {dotted.path: max_abs | (max_abs, pixels)} from
    ``calibrate_act_scales`` — convs present in it get a STATIC activation
    scale (the fast path). When ``act_scales`` is provided, convs ABSENT
    from it stay bf16 (a calibration miss means no measured range; dynamic
    quant here is the documented 2.4x end-to-end regression, so never fall
    back to it silently — the misses are logged). With ``act_scales=None``
    every conv takes the dynamic path (the memory-only mode).
    ``skip_re``: conv paths to keep in bf16 entirely (default: first/last
    convs). ``min_pixels``: keep convs whose calibrated input spatial size
    (H*W) is below this in bf16 — device traces show XLA's int8 conv beats
    bf16 only at large spatial sizes (512^2 VAE decode: 1.65 -> 0.98 ms at
    256^2, but 0.73 -> 1.59 ms REGRESSION at 64^2 where the s32 accumulator
    gets a T(1,128) layout); see scripts/trace_breakdown.py --int8."""
    top = _missed is None and act_scales is not None
    if top:
        _missed = []
    if isinstance(params, dict):
        if _is_conv_leaf(params):
            if skip_re is not None and skip_re.search(_path):
                return params
            a = act_scales.get(_path) if act_scales else None
            if act_scales is not None and a is None:
                if _missed is not None:
                    _missed.append(_path)
                return params  # calibration miss: keep bf16, never dynamic
            px = None
            if isinstance(a, (tuple, list)):
                a, px = a
            if min_pixels and px is not None and px < min_pixels:
                return params  # measured: int8 loses to bf16 at small spatial
            return quantize_conv_params(params, a_scale=a)
        out = {
            k: quantize_tree(v, act_scales, skip_re, min_pixels,
                             _path=f"{_path}.{k}" if _path else str(k),
                             _missed=_missed)
            for k, v in params.items()
        }
        if top and _missed:
            logger.warning(
                "int8 quantization: %d conv(s) missing from act_scales kept "
                "bf16 (calibration never reached them): %s",
                len(_missed), ", ".join(_missed[:8])
                + ("..." if len(_missed) > 8 else ""))
        return out
    return params


# --- calibration -------------------------------------------------------------


class _Calibration:
    """Trace-time collector: while ``active``, layers.conv2d records
    max|input| per conv leaf (keyed by the leaf dict's id, mapped back to a
    dotted tree path registered before the traced apply)."""

    active: bool = False

    def __init__(self) -> None:
        self.maxima: Dict[int, jax.Array] = {}
        self.paths: Dict[int, str] = {}
        self.pixels: Dict[int, int] = {}

    def record(self, p: Dict[str, Any], x: jax.Array) -> None:
        i = id(p)
        if i not in self.paths:
            return  # conv dict built on the fly (fused views etc.) — skip
        m = jnp.max(jnp.abs(x)).astype(jnp.float32)
        prev = self.maxima.get(i)
        self.maxima[i] = m if prev is None else jnp.maximum(prev, m)
        px = int(x.shape[1] * x.shape[2]) if x.ndim == 4 else 0
        self.pixels[i] = max(self.pixels.get(i, 0), px)


_CAL = _Calibration()


def _register_paths(tree: Any, path: str, out: Dict[int, str]) -> None:
    if not isinstance(tree, dict):
        return
    if _is_conv_leaf(tree):
        out[id(tree)] = path
        return
    for k, v in tree.items():
        _register_paths(v, f"{path}.{k}" if path else str(k), out)


def calibrate_act_scales(apply_fn: Callable, params: Any,
                         *args: Any) -> Dict[str, tuple]:
    """Run ``apply_fn(params, *args)`` once under jit while recording the
    max|input| (and input spatial size) of every conv in ``params``;
    returns {dotted.path: (max_abs, pixels)}.

    Feed a REPRESENTATIVE batch: for an SD UNet, latents at each of the
    sampler schedule's sigmas (activation ranges scale with sigma) x the cfg
    batch. One compiled eval; scales come back as concrete floats.

    Requirements (the collector is trace-time Python state):
      * ``apply_fn`` must NOT wrap an inner ``jax.jit`` — the inner trace
        would run in a separate context and record nothing;
      * conv leaf dicts must be the SAME objects as in ``params`` (paths are
        keyed by ``id()``; rebuilding the dicts breaks the mapping);
      * not re-entrant: one calibration at a time (module-global collector).
    Coverage is checked after the run — a warning names every registered
    conv the traced eval never touched (those stay bf16 in quantize_tree)."""
    pixels: Dict[str, int] = {}

    def run(p, *a):
        _CAL.__init__()
        _CAL.active = True
        _register_paths(p, "", _CAL.paths)
        try:
            apply_fn(p, *a)
        finally:
            _CAL.active = False
        pixels.clear()
        pixels.update({path: _CAL.pixels.get(i, 0)
                       for i, path in _CAL.paths.items() if i in _CAL.maxima})
        return {path: _CAL.maxima[i]
                for i, path in _CAL.paths.items() if i in _CAL.maxima}

    out = jax.jit(run)(params, *args)
    registered: Dict[int, str] = {}
    _register_paths(params, "", registered)
    missed = sorted(set(registered.values()) - set(out.keys()))
    if missed:
        logger.warning(
            "calibration missed %d/%d conv(s) (path not executed by the "
            "traced eval, or an inner jit/dict rebuild hid it): %s",
            len(missed), len(registered),
            ", ".join(missed[:8]) + ("..." if len(missed) > 8 else ""))
    return {k: (float(v), pixels.get(k, 0))
            for k, v in jax.device_get(out).items()}


def quant_act(x: jax.Array):
    """Per-tensor dynamic symmetric int8: (q, scale)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def conv2d_q(p: Dict[str, Any], x: jax.Array, stride: int = 1,
             padding: int = 0) -> jax.Array:
    """Int8 conv with int32 MXU accumulation and f32 dequant.

    Static ``a_scale`` (calibrated): the quantize is pure elementwise and
    fuses into the producer; dynamic fallback pays a full-tensor reduce."""
    if "a_scale" in p:
        s_x = p["a_scale"]
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
        q = q.astype(jnp.int8)
    else:
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
