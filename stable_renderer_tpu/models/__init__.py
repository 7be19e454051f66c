from stable_renderer_tpu.models.unet import UNetConfig, UNetModel, SD15_UNET_CONFIG
from stable_renderer_tpu.models.vae import VAEConfig, VAE, SD15_VAE_CONFIG
from stable_renderer_tpu.models.clip import CLIPConfig, CLIPTextModel, SD15_CLIP_CONFIG

__all__ = [
    "UNetConfig",
    "UNetModel",
    "SD15_UNET_CONFIG",
    "VAEConfig",
    "VAE",
    "SD15_VAE_CONFIG",
    "CLIPConfig",
    "CLIPTextModel",
    "SD15_CLIP_CONFIG",
]
