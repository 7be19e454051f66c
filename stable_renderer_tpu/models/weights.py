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


def _st_depth(flat: Dict[str, np.ndarray], prefix: str, block: str) -> int:
    """Transformer depth of a SpatialTransformer param subtree (0 = absent)."""
    if prefix + block + ".proj_in.weight" not in flat:
        return 0
    d = 0
    while f"{prefix}{block}.transformer_blocks.{d}.attn1.to_q.weight" in flat:
        d += 1
    return d


def detect_unet_config(flat: Dict[str, np.ndarray]) -> UNetConfig:
    """Architecture detection from the state dict alone (the capability of
    comfy/model_detection.py detect_unet_config): walks the input/middle/output
    block keys and derives channel_mult, per-level res-block counts, per-block
    transformer depths, context width, ADM width, and head layout. This is what
    makes the whole reference model zoo load without presets — SD1.x/2.x, SDXL
    (+ refiner), the distilled SDXL family (SSD-1B / Segmind Vega / KOALA,
    supported_models.py:217-255, non-uniform per-block depths + missing middle
    transformer), SD2.1-unclip, SD_X4Upscaler, SVD."""
    prefix = "model.diffusion_model."
    w = flat.get(prefix + "input_blocks.0.0.weight")
    if w is None:
        raise ValueError("state dict has no diffusion model")
    model_channels = w.shape[0]
    in_channels = w.shape[1]
    label_w = flat.get(prefix + "label_emb.0.0.weight")
    adm = None if label_w is None else label_w.shape[1]
    # class-embedding TABLE (openaimodel num_classes path, SD_X4Upscaler):
    # label_emb.weight (num_classes, time_embed_dim) instead of the ADM MLP
    class_w = flat.get(prefix + "label_emb.weight")
    num_classes = None if class_w is None else class_w.shape[0]
    if any(".time_stack." in k for k in flat if k.startswith(prefix)):
        # SVD img2vid temporal UNet (comfy supported_models.py:257
        # use_temporal_attention/use_temporal_resblock)
        import dataclasses

        from stable_renderer_tpu.models.video_unet import SVD_UNET_CONFIG

        return dataclasses.replace(
            SVD_UNET_CONFIG,
            in_channels=in_channels,
            model_channels=model_channels,
            adm_in_channels=adm,
        )
    # context dim from any cross-attention K projection
    context_dim = 768
    for k, v in flat.items():
        if k.startswith(prefix) and k.endswith("attn2.to_k.weight"):
            context_dim = v.shape[1]
            break
    # --- walk input blocks: levels end at downsample ops ---------------------
    channel_mult = []
    num_res_blocks = []
    depth_in = []
    disable_self = []
    cur_res = 0
    cur_dis = False
    last_ch = model_channels
    i = 1
    while True:
        b = f"input_blocks.{i}"
        if prefix + b + ".0.op.weight" in flat:  # downsample closes a level
            channel_mult.append(last_ch // model_channels)
            num_res_blocks.append(cur_res)
            disable_self.append(cur_dis)
            cur_res, cur_dis = 0, False
            i += 1
            continue
        rw = flat.get(prefix + b + ".0.out_layers.3.weight")
        if rw is None:
            break
        last_ch = rw.shape[0]
        cur_res += 1
        depth_in.append(_st_depth(flat, prefix, b + ".1"))
        # disable_self_attn (SD_X4Upscaler): attn1 K projects from the text
        # context, so its input width differs from the block channels
        k1 = flat.get(prefix + b + ".1.transformer_blocks.0.attn1.to_k.weight")
        if k1 is not None and k1.shape[1] != last_ch:
            cur_dis = True
        i += 1
    channel_mult.append(last_ch // model_channels)
    num_res_blocks.append(cur_res)
    disable_self.append(cur_dis)
    # --- middle block (openaimodel.py:735-738 layouts) ------------------------
    if prefix + "middle_block.1.proj_in.weight" in flat:
        depth_middle = _st_depth(flat, prefix, "middle_block.1")
    elif prefix + "middle_block.0.in_layers.0.weight" in flat:
        depth_middle = -1
    else:
        depth_middle = -2
    # --- output blocks ---------------------------------------------------------
    depth_out = []
    n_out = sum(r + 1 for r in num_res_blocks)
    for i in range(n_out):
        depth_out.append(_st_depth(flat, prefix, f"output_blocks.{i}.1"))
    # head layout heuristic (comfy model_detection.py unet_config defaults):
    # SD1.x (768-ctx) uses 8 fixed heads; everything newer uses 64-wide heads
    head_dim = None if context_dim == 768 else 64
    return UNetConfig(
        in_channels=in_channels,
        model_channels=model_channels,
        channel_mult=tuple(channel_mult),
        num_res_blocks=max(num_res_blocks) if num_res_blocks else 2,
        num_res_blocks_per_level=tuple(num_res_blocks),
        transformer_depth_blocks=tuple(depth_in),
        transformer_depth_blocks_out=tuple(depth_out),
        transformer_depth_middle=depth_middle,
        disable_self_attn_levels=(
            tuple(disable_self) if any(disable_self) else None
        ),
        context_dim=context_dim,
        head_dim=head_dim,
        adm_in_channels=adm,
        num_classes=num_classes,
    )


def detect_model_family(flat: Dict[str, np.ndarray], cfg: UNetConfig) -> dict:
    """Classify the checkpoint into the reference's model families and return
    sampling metadata (comfy/supported_models.py models list +
    supported_models_base.BASE.model_type):

    Returns {"family", "prediction", "noise_aug_dim"}. prediction is
    "eps" | "v"; noise_aug_dim is the CLIP-embed width for SD2.1-unclip
    checkpoints (feeds models/noise_aug.NoiseAugmentor), else None.
    """
    family, prediction, noise_aug_dim = "sd1", "eps", None
    if any(".time_stack." in k for k in flat):
        return {"family": "svd", "prediction": "v", "noise_aug_dim": None}
    if cfg.context_dim == 1024:
        if cfg.adm_in_channels in (1536, 2048):
            # SD21UnclipL/H (supported_models.py:91-115): always v-prediction,
            # ADM = noise-augmented CLIP embed + level embedding (2 * D)
            return {"family": "sd21-unclip", "prediction": "v",
                    "noise_aug_dim": cfg.adm_in_channels // 2}
        if cfg.in_channels == 7:
            # SD_X4Upscaler (supported_models.py:308): v-prediction latent
            # upscaler, [latent, lowres image] concat input
            return {"family": "sd-x4-upscaler", "prediction": "v",
                    "noise_aug_dim": None}
        family = "sd2"
        # SD2.x eps-vs-v heuristic (comfy supported_models.py SD20.model_type):
        # the 768-v checkpoints have out-layer statistics with std > 0.09.
        # Only for in_channels == 4 — "SD2.0 inpainting models are not
        # v prediction" (9-channel SD2 inpaint checkpoints stay eps)
        if cfg.in_channels == 4:
            k = "model.diffusion_model.output_blocks.11.1.transformer_blocks.0.norm1.bias"
            t = flat.get(k)
            if t is not None and float(np.std(np.asarray(t, np.float64))) > 0.09:
                prediction = "v"
    elif cfg.context_dim == 1280:
        family = "sdxl-refiner"
    elif cfg.context_dim == 2048:
        family = "sdxl"
    return {"family": family, "prediction": prediction, "noise_aug_dim": noise_aug_dim}


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


def tree_to_hwio(tree: dict) -> dict:
    """Compute-layout view of a param tree: every conv weight (4-D ``weight``)
    transposed OIHW -> HWIO under the key ``w_hwio`` (layers.conv2d detects
    it). TPU-native conv layout — measured 1.1-1.65x over OIHW at the SD
    UNet/VAE hot shapes (scripts/sweep_conv.py, v5e). The CANONICAL trees
    (checkpoint format, LoRA merge targets, save paths) stay OIHW; this view
    is cached per params version by DiffusionPipeline.compute_params.
    int8-quantized convs (``weight_q``, already HWIO) pass through."""
    import jax.numpy as jnp

    def walk(node):
        if not isinstance(node, dict):
            return node
        is_conv = (
            "weight" in node
            and getattr(node["weight"], "ndim", 0) == 4
            and "weight_q" not in node
        )
        out = {}
        for k, v in node.items():
            if is_conv and k == "weight":
                out["w_hwio"] = jnp.transpose(jnp.asarray(v), (2, 3, 1, 0))
            else:
                out[k] = walk(v)
        return out

    return walk(tree)


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
