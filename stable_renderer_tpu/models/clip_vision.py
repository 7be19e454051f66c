"""CLIP vision tower — image embeddings for unCLIP-style conditioning.

Capability match for the reference's clip_vision
(reference: comfyUI/comfy/clip_vision.py:25-140 clip_preprocess /
ClipVisionModel.encode_image / load_clipvision_from_sd size detection, and
comfy/clip_model.py:139-196 CLIPVisionEmbeddings/CLIPVision/
CLIPVisionModelProjection). Functional JAX over a transformers-layout param
dict; the ViT runs as one jitted program, bf16-friendly: the patch embedding
is a conv that XLA lowers onto the MXU, and all L layers are a python loop
unrolled at trace time (static depth).

Outputs mirror the reference's Output triple: last_hidden_state,
penultimate_hidden_states (intermediate_output=-2), image_embeds (projected
pooled class token).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import attention, gelu_quick, layer_norm, linear

# clip_vision.py:26-27 normalization constants (data contract)
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768


# size detection by deepest layer present (clip_vision.py:109-117)
VITL_CONFIG = CLIPVisionConfig()  # ViT-L/14 (SD1.5 unCLIP / IP-Adapter)
VITH_CONFIG = CLIPVisionConfig(hidden_size=1280, num_layers=32, num_heads=16,
                               intermediate_size=5120, projection_dim=1024)
VITG_CONFIG = CLIPVisionConfig(hidden_size=1664, num_layers=48, num_heads=16,
                               intermediate_size=8192, patch_size=14,
                               projection_dim=1280)
TINY_VISION_CONFIG = CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=2,
                                      intermediate_size=128, image_size=28,
                                      patch_size=14, projection_dim=32)


class VisionOutput(NamedTuple):
    last_hidden_state: jax.Array          # (B, 1+P, H)
    penultimate_hidden_states: jax.Array  # (B, 1+P, H)
    image_embeds: jax.Array               # (B, projection_dim)


def clip_preprocess(image: jax.Array, size: int = 224) -> jax.Array:
    """(B,H,W,3) [0,1] -> (B,size,size,3) normalized (clip_preprocess,
    clip_vision.py:25-36): bicubic resize of the short side to ``size``,
    center crop, 8-bit quantize, CLIP mean/std normalize."""
    b, h, w, _ = image.shape
    if (h, w) != (size, size):
        scale = size / min(h, w)
        nh, nw = round(scale * h), round(scale * w)
        image = jax.image.resize(image, (b, nh, nw, 3), "cubic")
        top, left = (nh - size) // 2, (nw - size) // 2
        image = image[:, top: top + size, left: left + size, :]
    image = jnp.round(jnp.clip(image * 255.0, 0, 255)) / 255.0
    mean = jnp.asarray(_CLIP_MEAN, image.dtype)
    std = jnp.asarray(_CLIP_STD, image.dtype)
    return (image - mean) / std


class CLIPVisionModel:
    """Functional ViT (clip_model.py CLIPVisionModelProjection)."""

    def __init__(self, config: CLIPVisionConfig = VITL_CONFIG):
        self.config = config

    def apply(self, params: dict, pixel_values: jax.Array) -> VisionOutput:
        """pixel_values: (B, S, S, 3) already clip_preprocess-ed."""
        cfg = self.config
        vm = params["vision_model"]
        emb = vm["embeddings"]
        # patch embedding: conv stride=patch (MXU matmul after im2col by XLA)
        x = jax.lax.conv_general_dilated(
            pixel_values, emb["patch_embedding"]["weight"].astype(pixel_values.dtype),
            window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dimension_numbers=("NHWC", "OIHW", "NHWC"),
        )
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_size)  # (B, P, H)
        cls = jnp.broadcast_to(
            emb["class_embedding"].astype(x.dtype)[None, None], (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + emb["position_embedding"]["weight"][: x.shape[1]].astype(x.dtype)[None]
        x = layer_norm(vm["pre_layrnorm"], x)  # transformers' (sic) key name

        penultimate = x
        for i in range(cfg.num_layers):
            lp = vm["encoder"]["layers"][str(i)]
            h = layer_norm(lp["layer_norm1"], x)
            q = linear(lp["self_attn"]["q_proj"], h)
            k = linear(lp["self_attn"]["k_proj"], h)
            v = linear(lp["self_attn"]["v_proj"], h)
            h = attention(q, k, v, cfg.num_heads)  # NOT causal (vision)
            x = x + linear(lp["self_attn"]["out_proj"], h)
            h = layer_norm(lp["layer_norm2"], x)
            h = linear(lp["mlp"]["fc1"], h)
            h = gelu_quick(h)
            x = x + linear(lp["mlp"]["fc2"], h)
            if i == cfg.num_layers - 2:  # intermediate_output=-2
                penultimate = x

        last = layer_norm(vm["post_layernorm"], x)
        pooled = last[:, 0]  # class token
        image_embeds = pooled @ params["visual_projection"]["weight"].astype(pooled.dtype).T
        return VisionOutput(last, penultimate, image_embeds)

    def encode_image(self, params: dict, image: jax.Array) -> VisionOutput:
        """Raw (B,H,W,3) [0,1] image -> embeddings (encode_image,
        clip_vision.py:71-80). jit-able end to end."""
        return self.apply(params, clip_preprocess(image, self.config.image_size))

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        from stable_renderer_tpu.models.unet import _KeyGen

        keys = _KeyGen(key)

        def lin(i, o):
            return {"weight": jax.random.normal(keys(), (o, i), dtype) * 0.02,
                    "bias": jnp.zeros((o,), dtype)}

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        h = cfg.hidden_size
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        layers = {
            str(i): {
                "layer_norm1": norm(h), "layer_norm2": norm(h),
                "self_attn": {"q_proj": lin(h, h), "k_proj": lin(h, h),
                              "v_proj": lin(h, h), "out_proj": lin(h, h)},
                "mlp": {"fc1": lin(h, cfg.intermediate_size),
                        "fc2": lin(cfg.intermediate_size, h)},
            }
            for i in range(cfg.num_layers)
        }
        return {
            "vision_model": {
                "embeddings": {
                    "class_embedding": jax.random.normal(keys(), (h,), dtype) * 0.02,
                    "patch_embedding": {
                        "weight": jax.random.normal(
                            keys(), (h, 3, cfg.patch_size, cfg.patch_size), dtype) * 0.02,
                    },
                    "position_embedding": {
                        "weight": jax.random.normal(keys(), (n_pos, h), dtype) * 0.02,
                    },
                },
                "pre_layrnorm": norm(h),
                "encoder": {"layers": layers},
                "post_layernorm": norm(h),
            },
            "visual_projection": {
                "weight": jax.random.normal(keys(), (cfg.projection_dim, h), dtype) * 0.02,
            },
        }


def detect_vision_config(sd_keys) -> Optional[CLIPVisionConfig]:
    """Pick the config from the deepest encoder layer present
    (load_clipvision_from_sd, clip_vision.py:109-117)."""
    def has(i: int) -> bool:
        return any(f"layers.{i}." in k for k in sd_keys)

    if has(47):
        return VITG_CONFIG
    if has(30):
        return VITH_CONFIG
    if has(22):
        return VITL_CONFIG
    return None


def load_clip_vision(path: str):
    """Load a transformers-layout CLIP vision checkpoint (.safetensors) ->
    (CLIPVisionModel, params). Reference load(), clip_vision.py:133-140."""
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    sd = load_state_dict(path)
    cfg = detect_vision_config(sd.keys())
    if cfg is None:
        raise ValueError(f"{path} is not a recognized CLIP vision checkpoint")
    params = nest(sd)
    return CLIPVisionModel(cfg), params
