"""Checkpoint loading: reference-format safetensors/ckpt -> our param trees.

Capability match for the reference's checkpoint loader
(reference: comfy/sd.py:592-712 load_checkpoint_guess_config, comfy/utils.py
load_torch_file, comfy/model_detection.py). The param trees in models/* use the
torch module names verbatim, so loading is pure re-nesting — no per-layer rename
tables:

    model.diffusion_model.*   -> UNet params
    first_stage_model.*       -> VAE params
    cond_stage_model.transformer.* (or .clip_l.transformer.*) -> CLIP params

Weights stay in torch layouts ((out,in) Linear, (O,I,kH,kW) Conv) — the layer
functions account for it. Everything loads as numpy then lands on device lazily
at first use (or eagerly via jax.device_put on the assembled tree).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

from stable_renderer_tpu.models.clip import CLIPConfig, SD15_CLIP_CONFIG
from stable_renderer_tpu.models.unet import SD15_UNET_CONFIG, UNetConfig
from stable_renderer_tpu.models.vae import SD15_VAE_CONFIG, VAEConfig
from stable_renderer_tpu.utils.log import get_logger

logger = get_logger("sr_tpu.weights")


def load_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Load a .safetensors (preferred) or torch .ckpt/.pt file as flat numpy."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors import safe_open

        out = {}
        with safe_open(str(path), framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    # torch pickle formats — use torch (cpu) only as a file reader
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def nest(flat: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Re-nest a flat dotted-key dict under ``prefix`` into nested dicts."""
    tree: dict = {}
    plen = len(prefix)
    for key, value in flat.items():
        if not key.startswith(prefix):
            continue
        parts = key[plen:].split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def flatten(tree: dict, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def detect_unet_config(flat: Dict[str, np.ndarray]) -> UNetConfig:
    """Minimal model detection (comfy/model_detection.py capability): reads widths
    from the state dict. Currently recognizes the SD1.x family."""
    prefix = "model.diffusion_model."
    w = flat.get(prefix + "input_blocks.0.0.weight")
    if w is None:
        raise ValueError("state dict has no diffusion model")
    model_channels = w.shape[0]
    in_channels = w.shape[1]
    label_w = flat.get(prefix + "label_emb.0.0.weight")
    if any(".time_stack." in k for k in flat if k.startswith(prefix)):
        # SVD img2vid temporal UNet (comfy supported_models.py:257
        # use_temporal_attention/use_temporal_resblock)
        import dataclasses

        from stable_renderer_tpu.models.video_unet import SVD_UNET_CONFIG

        return dataclasses.replace(
            SVD_UNET_CONFIG,
            in_channels=in_channels,
            model_channels=model_channels,
            adm_in_channels=None if label_w is None else label_w.shape[1],
        )
    if label_w is not None:
        # SDXL family: ADM conditioning present; context dim from any attn2.to_k
        from stable_renderer_tpu.models.unet import SDXL_UNET_CONFIG
        import dataclasses

        ctx_dim = 2048
        for k, v in flat.items():
            if k.startswith(prefix) and k.endswith("attn2.to_k.weight"):
                ctx_dim = v.shape[1]
                break
        return dataclasses.replace(
            SDXL_UNET_CONFIG,
            in_channels=in_channels,
            model_channels=model_channels,
            context_dim=ctx_dim,
            adm_in_channels=label_w.shape[1],
        )
    ctx = flat.get(prefix + "input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight")
    context_dim = ctx.shape[1] if ctx is not None else 768
    return UNetConfig(
        in_channels=in_channels,
        model_channels=model_channels,
        context_dim=context_dim,
        # SD2.x (OpenCLIP-H context) uses fixed 64-wide heads instead of 8
        # heads (comfy model_detection.py num_head_channels=64)
        head_dim=64 if context_dim >= 1024 else None,
    )


def split_checkpoint(
    flat: Dict[str, np.ndarray],
) -> Tuple[dict, dict, dict]:
    """flat checkpoint -> (unet_params, vae_params, clip_params) nested trees."""
    unet = nest(flat, "model.diffusion_model.")
    vae = nest(flat, "first_stage_model.")
    clip = nest(flat, "cond_stage_model.transformer.")
    if not clip:
        clip = nest(flat, "cond_stage_model.clip_l.transformer.")
    return unet, vae, clip


def load_checkpoint_flat(flat: Dict[str, np.ndarray], label: str = "<flat>"):
    """Split + detect from an in-memory flat state dict (shared by ldm files
    and the diffusers-folder conversion path)."""
    cfg = detect_unet_config(flat)
    unet, vae, clip = split_checkpoint(flat)
    logger.info(
        f"Loaded checkpoint {label}: unet ch={cfg.model_channels} ctx={cfg.context_dim}, "
        f"{len(flat)} tensors"
    )
    return unet, vae, clip, cfg


def load_checkpoint(path: str | Path):
    """Load a full SD checkpoint; returns (unet_params, vae_params, clip_params,
    unet_config). The reference equivalent is load_checkpoint_guess_config.

    A directory path is treated as a diffusers model folder
    (comfy diffusers_load.py load_diffusers)."""
    if Path(path).is_dir():
        from stable_renderer_tpu.models.diffusers_convert import load_diffusers_folder

        return load_checkpoint_flat(load_diffusers_folder(str(path)), str(path))
    return load_checkpoint_flat(load_state_dict(path), str(path))


def to_device(tree: dict, dtype=None) -> dict:
    """Move a nested numpy tree onto the default device (optionally casting)."""
    import jax
    import jax.numpy as jnp

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and a.dtype in (jnp.float32, jnp.float16, jnp.bfloat16):
            a = a.astype(dtype)
        return a

    return jax.tree_util.tree_map(conv, tree)
