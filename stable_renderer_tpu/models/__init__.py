from stable_renderer_tpu.models.unet import (
    AttnHooks,
    UNetConfig,
    UNetModel,
    SD15_UNET_CONFIG,
    TINY_UNET_CONFIG,
)
from stable_renderer_tpu.models.vae import VAEConfig, VAE, SD15_VAE_CONFIG, TINY_VAE_CONFIG
from stable_renderer_tpu.models.clip import (
    CLIPConfig,
    CLIPTextModel,
    Tokenizer,
    SD15_CLIP_CONFIG,
    TINY_CLIP_CONFIG,
)
from stable_renderer_tpu.models.controlnet import ControlNet, ControlNetConfig

__all__ = [
    "AttnHooks",
    "UNetConfig",
    "UNetModel",
    "SD15_UNET_CONFIG",
    "TINY_UNET_CONFIG",
    "VAEConfig",
    "VAE",
    "SD15_VAE_CONFIG",
    "TINY_VAE_CONFIG",
    "CLIPConfig",
    "CLIPTextModel",
    "Tokenizer",
    "SD15_CLIP_CONFIG",
    "TINY_CLIP_CONFIG",
    "ControlNet",
    "ControlNetConfig",
]
