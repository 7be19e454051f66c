"""LoRA loading and weight merging (incl. LCM-LoRA).

Capability match for the reference's LoRA path
(reference: comfy/lora.py model_lora_keys_unet/clip + load_lora,
comfy/model_patcher.py weight patches; the realtime miku config merges an LCM LoRA
into dreamshaper_8, BASELINE.md). The reference applies patches lazily at load;
here LoRAs merge directly into the param tree before jit — merged weights cost
nothing at inference, which is the TPU-friendly choice.

Key formats supported:
  * comfy/kohya: ``lora_unet_{path_with_underscores}.lora_up.weight`` /
    ``.lora_down.weight`` / ``.alpha`` and ``lora_te_*`` for the text encoder.
  * diffusers: ``{path}.lora.up.weight`` style is normalized to the same shape.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from stable_renderer_tpu.models.weights import flatten, nest
from stable_renderer_tpu.utils.log import get_logger

logger = get_logger("sr_tpu.lora")


def _target_lookup(params: dict) -> Dict[str, str]:
    """{dotted_path_with_underscores: dotted_path} for every weight leaf."""
    out = {}
    for path in flatten(params):
        if path.endswith(".weight"):
            base = path[: -len(".weight")]
            out[base.replace(".", "_")] = base
    return out


def parse_lora(flat: Dict[str, np.ndarray], prefix: str) -> Dict[str, dict]:
    """Group lora tensors by target module name (without the lora prefix)."""
    groups: Dict[str, dict] = {}
    for key, value in flat.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix) :]
        for marker, slot in (
            (".lora_up.weight", "up"),
            (".lora_down.weight", "down"),
            (".lora.up.weight", "up"),
            (".lora.down.weight", "down"),
            (".alpha", "alpha"),
        ):
            if rest.endswith(marker):
                name = rest[: -len(marker)]
                groups.setdefault(name, {})[slot] = value
                break
    return groups


def merge_lora(
    params: dict,
    lora_flat: Dict[str, np.ndarray],
    strength: float = 1.0,
    prefix: str = "lora_unet_",
) -> dict:
    """Return params with ``W += strength * (alpha/rank) * up @ down`` merged in.

    Unmatched lora keys are logged and skipped (comfy load_lora behavior).
    """
    lookup = _target_lookup(params)
    groups = parse_lora(lora_flat, prefix)
    flat_params = flatten(params)
    merged = dict(flat_params)
    n_applied = 0
    for name, g in groups.items():
        if "up" not in g or "down" not in g:
            continue
        target = lookup.get(name)
        if target is None:
            logger.debug(f"lora key {name} has no matching weight; skipped")
            continue
        w = np.asarray(flat_params[target + ".weight"], np.float32)
        up = np.asarray(g["up"], np.float32)
        down = np.asarray(g["down"], np.float32)
        rank = down.shape[0]
        alpha = float(g["alpha"]) if "alpha" in g else float(rank)
        scale = strength * alpha / rank
        if w.ndim == 4:  # conv: (O, I, kh, kw)
            up2 = up.reshape(up.shape[0], -1)
            down2 = down.reshape(down.shape[0], -1)
            delta = (up2 @ down2).reshape(w.shape)
        else:
            delta = up @ down
        merged[target + ".weight"] = (w + scale * delta).astype(flat_params[target + ".weight"].dtype)
        n_applied += 1
    logger.info(f"merged LoRA: {n_applied}/{len(groups)} modules applied (strength={strength})")
    return nest(merged, "")
