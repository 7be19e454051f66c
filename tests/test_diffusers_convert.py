"""Diffusers-layout conversion tests (reference comfy/diffusers_convert.py +
diffusers_load.py)."""

import numpy as np
import pytest

from stable_renderer_tpu.models.diffusers_convert import (
    convert_unet_state_dict,
    convert_vae_state_dict,
    load_diffusers_folder,
)


def test_unet_key_mapping():
    sd = {
        "time_embedding.linear_1.weight": np.zeros(1),
        "conv_in.weight": np.zeros(2),
        "down_blocks.0.resnets.0.norm1.weight": np.zeros(3),
        "down_blocks.0.resnets.0.time_emb_proj.weight": np.zeros(4),
        "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight": np.zeros(5),
        "down_blocks.0.downsamplers.0.conv.weight": np.zeros(6),
        "up_blocks.2.resnets.1.conv_shortcut.weight": np.zeros(7),
        "up_blocks.0.upsamplers.0.conv.weight": np.zeros(8),
        "mid_block.attentions.0.proj_out.weight": np.zeros(9),
        "mid_block.resnets.1.conv1.weight": np.zeros(10),
        "conv_out.bias": np.zeros(11),
    }
    out = convert_unet_state_dict(sd)
    assert out["time_embed.0.weight"].shape == (1,)
    assert out["input_blocks.0.0.weight"].shape == (2,)
    assert out["input_blocks.1.0.in_layers.0.weight"].shape == (3,)
    assert out["input_blocks.1.0.emb_layers.1.weight"].shape == (4,)
    assert out["input_blocks.4.1.transformer_blocks.0.attn1.to_q.weight"].shape == (5,)
    assert out["input_blocks.3.0.op.weight"].shape == (6,)
    assert out["output_blocks.7.0.skip_connection.weight"].shape == (7,)
    assert out["output_blocks.2.1.conv.weight"].shape == (8,)
    assert out["middle_block.1.proj_out.weight"].shape == (9,)
    assert out["middle_block.2.in_layers.2.weight"].shape == (10,)  # resnet conv1 -> in_layers.2
    assert out["out.2.bias"].shape == (11,)


def test_vae_key_mapping_and_attn_reshape():
    sd = {
        "encoder.down_blocks.0.resnets.0.conv1.weight": np.zeros(1),
        "decoder.up_blocks.0.resnets.2.conv_shortcut.weight": np.zeros(2),
        "encoder.mid_block.resnets.0.conv1.weight": np.zeros(3),
        "decoder.mid_block.attentions.0.to_q.weight": np.zeros((8, 8)),
        "decoder.conv_norm_out.weight": np.zeros(5),
        "encoder.down_blocks.1.downsamplers.0.conv.weight": np.zeros(6),
    }
    out = convert_vae_state_dict(sd)
    assert out["encoder.down.0.block.0.conv1.weight"].shape == (1,)
    assert out["decoder.up.3.block.2.nin_shortcut.weight"].shape == (2,)
    assert out["encoder.mid.block_1.conv1.weight"].shape == (3,)
    # mid attention linear reshaped to a 1x1 conv
    assert out["decoder.mid.attn_1.q.weight"].shape == (8, 8, 1, 1)
    assert out["decoder.norm_out.weight"].shape == (5,)
    assert out["encoder.down.1.downsample.conv.weight"].shape == (6,)


def test_load_diffusers_folder(tmp_path):
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    (tmp_path / "unet").mkdir()
    (tmp_path / "vae").mkdir()
    (tmp_path / "text_encoder").mkdir()
    save_file({"conv_in.weight": np.zeros((320, 4, 3, 3), np.float32),
               "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight":
                   np.zeros((320, 768), np.float32)},
              str(tmp_path / "unet" / "diffusion_pytorch_model.safetensors"))
    save_file({"encoder.conv_in.weight": np.zeros((128, 3, 3, 3), np.float32)},
              str(tmp_path / "vae" / "diffusion_pytorch_model.safetensors"))
    save_file({"text_model.embeddings.token_embedding.weight":
                   np.zeros((49408, 768), np.float32)},
              str(tmp_path / "text_encoder" / "model.safetensors"))
    flat = load_diffusers_folder(str(tmp_path))
    assert "model.diffusion_model.input_blocks.0.0.weight" in flat
    assert ("model.diffusion_model.input_blocks.1.1.transformer_blocks.0."
            "attn2.to_k.weight") in flat
    assert "first_stage_model.encoder.conv_in.weight" in flat
    assert ("cond_stage_model.transformer.text_model.embeddings."
            "token_embedding.weight") in flat
    # config detection works on the assembled dict
    from stable_renderer_tpu.models.weights import detect_unet_config

    cfg = detect_unet_config(flat)
    assert cfg.model_channels == 320 and cfg.context_dim == 768
