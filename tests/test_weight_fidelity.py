"""Full-key weight-fidelity proof (SURVEY hard-part #2, VERDICT r2 #3).

Generates the COMPLETE comfy/ldm checkpoint key sets for the SD1.5 family —
UNet (model.diffusion_model.*), VAE (first_stage_model.*) and CLIP
(cond_stage_model.transformer.*) — from an INDEPENDENT spec of the reference
architecture (comfy/ldm module layout, comfy/model_detection.py:1-363,
comfy/sd.py:592), then asserts our param trees consume every key and expect
nothing more. A single renamed/missing/extra parameter fails these tests —
with real checkpoints such a mismatch would silently produce garbage.

The generators here are written from the architecture spec, NOT by flattening
our own init trees (that would be circular).
"""

import dataclasses

import jax
import numpy as np
import pytest

from stable_renderer_tpu.models.clip import SD15_CLIP_CONFIG, CLIPTextModel
from stable_renderer_tpu.models.unet import SD15_UNET_CONFIG, SDXL_UNET_CONFIG, UNetModel
from stable_renderer_tpu.models.vae import SD15_VAE_CONFIG, VAE
from stable_renderer_tpu.models.weights import flatten


def _wb(keys, p):
    keys.add(f"{p}.weight")
    keys.add(f"{p}.bias")


def _w(keys, p):
    keys.add(f"{p}.weight")


def sd_unet_keys(model_channels=320, channel_mult=(1, 2, 4, 4),
                 num_res_blocks=2, attention_levels=(0, 1, 2),
                 depth_per_level=None, in_channels=4, adm=False):
    """The comfy/ldm UNetModel state-dict key set (openaimodel.py layout)."""
    keys = set()

    def resblock(p, cin, cout):
        _wb(keys, f"{p}.in_layers.0")
        _wb(keys, f"{p}.in_layers.2")
        _wb(keys, f"{p}.emb_layers.1")
        _wb(keys, f"{p}.out_layers.0")
        _wb(keys, f"{p}.out_layers.3")
        if cin != cout:
            _wb(keys, f"{p}.skip_connection")

    def transformer(p, depth):
        _wb(keys, f"{p}.norm")
        _wb(keys, f"{p}.proj_in")
        _wb(keys, f"{p}.proj_out")
        for d in range(depth):
            b = f"{p}.transformer_blocks.{d}"
            for n in ("norm1", "norm2", "norm3"):
                _wb(keys, f"{b}.{n}")
            for a in ("attn1", "attn2"):
                for t in ("to_q", "to_k", "to_v"):
                    _w(keys, f"{b}.{a}.{t}")
                _wb(keys, f"{b}.{a}.to_out.0")
            _wb(keys, f"{b}.ff.net.0.proj")
            _wb(keys, f"{b}.ff.net.2")

    def depth_at(level):
        if depth_per_level is not None:
            return depth_per_level[level]
        return 1

    _wb(keys, "time_embed.0")
    _wb(keys, "time_embed.2")
    if adm:
        _wb(keys, "label_emb.0.0")
        _wb(keys, "label_emb.0.2")
    _wb(keys, "input_blocks.0.0")

    ch = model_channels
    input_chs = [ch]
    idx = 1
    for level, mult in enumerate(channel_mult):
        out_ch = model_channels * mult
        for _ in range(num_res_blocks):
            resblock(f"input_blocks.{idx}.0", ch, out_ch)
            ch = out_ch
            if level in attention_levels and depth_at(level) > 0:
                transformer(f"input_blocks.{idx}.1", depth_at(level))
            input_chs.append(ch)
            idx += 1
        if level != len(channel_mult) - 1:
            _wb(keys, f"input_blocks.{idx}.0.op")
            input_chs.append(ch)
            idx += 1

    resblock("middle_block.0", ch, ch)
    mid_depth = max(depth_at(len(channel_mult) - 1), 1)
    transformer("middle_block.1", mid_depth)
    resblock("middle_block.2", ch, ch)

    idx = 0
    for level in reversed(range(len(channel_mult))):
        out_ch = model_channels * channel_mult[level]
        for i in range(num_res_blocks + 1):
            skip_ch = input_chs.pop()
            resblock(f"output_blocks.{idx}.0", ch + skip_ch, out_ch)
            ch = out_ch
            has_attn = level in attention_levels and depth_at(level) > 0
            if has_attn:
                transformer(f"output_blocks.{idx}.1", depth_at(level))
            if level != 0 and i == num_res_blocks:
                up_slot = "2" if has_attn else "1"
                _wb(keys, f"output_blocks.{idx}.{up_slot}.conv")
            idx += 1

    _wb(keys, "out.0")
    _wb(keys, "out.2")
    return keys


def sd_vae_keys():
    """The comfy/ldm AutoencoderKL state-dict key set (first_stage_model.*)."""
    keys = set()

    def resnet(p, cin, cout):
        _wb(keys, f"{p}.norm1")
        _wb(keys, f"{p}.conv1")
        _wb(keys, f"{p}.norm2")
        _wb(keys, f"{p}.conv2")
        if cin != cout:
            _wb(keys, f"{p}.nin_shortcut")

    def attn(p):
        _wb(keys, f"{p}.norm")
        for t in ("q", "k", "v", "proj_out"):
            _wb(keys, f"{p}.{t}")

    ch_mult = (1, 2, 4, 4)
    base = 128
    # encoder: 2 resnets per level, downsample between levels
    _wb(keys, "encoder.conv_in")
    ch = base
    for level, mult in enumerate(ch_mult):
        out_ch = base * mult
        for b in range(2):
            resnet(f"encoder.down.{level}.block.{b}", ch, out_ch)
            ch = out_ch
        if level != len(ch_mult) - 1:
            _wb(keys, f"encoder.down.{level}.downsample.conv")
    resnet("encoder.mid.block_1", ch, ch)
    attn("encoder.mid.attn_1")
    resnet("encoder.mid.block_2", ch, ch)
    _wb(keys, "encoder.norm_out")
    _wb(keys, "encoder.conv_out")

    # decoder: 3 resnets per level (reversed mults), upsample between levels
    _wb(keys, "decoder.conv_in")
    ch = base * ch_mult[-1]
    resnet("decoder.mid.block_1", ch, ch)
    attn("decoder.mid.attn_1")
    resnet("decoder.mid.block_2", ch, ch)
    for level in reversed(range(len(ch_mult))):
        out_ch = base * ch_mult[level]
        for b in range(3):
            resnet(f"decoder.up.{level}.block.{b}", ch, out_ch)
            ch = out_ch
        if level != 0:
            _wb(keys, f"decoder.up.{level}.upsample.conv")
    _wb(keys, "decoder.norm_out")
    _wb(keys, "decoder.conv_out")

    _wb(keys, "quant_conv")
    _wb(keys, "post_quant_conv")
    return keys


def sd_clip_keys(layers=12):
    """CLIPTextModel keys under cond_stage_model.transformer. (sd1_clip.py)."""
    keys = set()
    _w(keys, "text_model.embeddings.token_embedding")
    _w(keys, "text_model.embeddings.position_embedding")
    for i in range(layers):
        b = f"text_model.encoder.layers.{i}"
        for t in ("k_proj", "v_proj", "q_proj", "out_proj"):
            _wb(keys, f"{b}.self_attn.{t}")
        _wb(keys, f"{b}.layer_norm1")
        _wb(keys, f"{b}.layer_norm2")
        _wb(keys, f"{b}.mlp.fc1")
        _wb(keys, f"{b}.mlp.fc2")
    _wb(keys, "text_model.final_layer_norm")
    return keys


def _diff(ours: set, comfy: set, label: str):
    missing = sorted(comfy - ours)
    extra = sorted(ours - comfy)
    assert not missing and not extra, (
        f"{label}: {len(missing)} comfy keys our tree lacks "
        f"(e.g. {missing[:8]}), {len(extra)} keys comfy never ships "
        f"(e.g. {extra[:8]})")


def test_sd15_unet_full_key_coverage():
    tree = jax.eval_shape(lambda: UNetModel(SD15_UNET_CONFIG).init(jax.random.PRNGKey(0)))
    ours = set(flatten(tree).keys())
    comfy = sd_unet_keys()
    assert len(comfy) == 686  # the canonical SD1.5 UNet tensor count
    _diff(ours, comfy, "SD1.5 UNet")


def test_sd15_inpaint_unet_key_coverage():
    cfg = dataclasses.replace(SD15_UNET_CONFIG, in_channels=9)
    tree = jax.eval_shape(lambda: UNetModel(cfg).init(jax.random.PRNGKey(0)))
    _diff(set(flatten(tree).keys()), sd_unet_keys(in_channels=9),
          "SD1.5 inpaint UNet")


def test_sdxl_unet_full_key_coverage():
    tree = jax.eval_shape(lambda: UNetModel(SDXL_UNET_CONFIG).init(jax.random.PRNGKey(0)))
    ours = set(flatten(tree).keys())
    comfy = sd_unet_keys(channel_mult=(1, 2, 4), attention_levels=(1, 2),
                         depth_per_level=(0, 2, 10), adm=True)
    _diff(ours, comfy, "SDXL UNet")


def test_sd15_vae_full_key_coverage():
    tree = jax.eval_shape(lambda: VAE(SD15_VAE_CONFIG).init(jax.random.PRNGKey(0)))
    ours = set(flatten(tree).keys())
    comfy = sd_vae_keys()
    assert len(comfy) == 248  # canonical kl-f8 VAE tensor count
    _diff(ours, comfy, "SD VAE")


def test_sd15_clip_full_key_coverage():
    tree = jax.eval_shape(lambda: CLIPTextModel(SD15_CLIP_CONFIG).init(jax.random.PRNGKey(0)))
    ours = set(flatten(tree).keys())
    _diff(ours, sd_clip_keys(), "SD1.5 CLIP-L")


def test_full_checkpoint_loads_with_zero_unconsumed_keys():
    """A complete synthetic SD1.5 checkpoint (every comfy key, correct shapes)
    round-trips load_checkpoint_flat with nothing dropped and nothing missing,
    and detection picks the right config (comfy sd.py:592 semantics)."""
    from stable_renderer_tpu.models.weights import load_checkpoint_flat

    shapes = {}
    for prefix, tree_fn in (
        ("model.diffusion_model.", lambda: UNetModel(SD15_UNET_CONFIG).init(jax.random.PRNGKey(0))),
        ("first_stage_model.", lambda: VAE(SD15_VAE_CONFIG).init(jax.random.PRNGKey(0))),
        ("cond_stage_model.transformer.", lambda: CLIPTextModel(SD15_CLIP_CONFIG).init(jax.random.PRNGKey(0))),
    ):
        tree = jax.eval_shape(tree_fn)
        for k, v in flatten(tree).items():
            shapes[prefix + k] = np.zeros(v.shape, np.float16)
    # sanity: the flat dict matches the independently generated key sets
    gen = ({f"model.diffusion_model.{k}" for k in sd_unet_keys()}
           | {f"first_stage_model.{k}" for k in sd_vae_keys()}
           | {f"cond_stage_model.transformer.{k}" for k in sd_clip_keys()})
    assert set(shapes) == gen
    unet_p, vae_p, clip_p, ucfg = load_checkpoint_flat(shapes, "<synthetic>")
    assert ucfg.model_channels == 320 and ucfg.context_dim == 768
    assert ucfg.in_channels == 4 and ucfg.adm_in_channels is None
    # every key consumed into exactly one of the three trees
    consumed = (len(flatten(unet_p)) + len(flatten(vae_p)) + len(flatten(clip_p)))
    assert consumed == len(shapes)
    # and each tree is loadable into its model (identical treedef)
    for tree, model_tree in (
        (unet_p, jax.eval_shape(lambda: UNetModel(SD15_UNET_CONFIG).init(jax.random.PRNGKey(0)))),
        (vae_p, jax.eval_shape(lambda: VAE(SD15_VAE_CONFIG).init(jax.random.PRNGKey(0)))),
        (clip_p, jax.eval_shape(lambda: CLIPTextModel(SD15_CLIP_CONFIG).init(jax.random.PRNGKey(0)))),
    ):
        assert set(flatten(tree)) == set(flatten(model_tree))
        for k, v in flatten(tree).items():
            assert tuple(v.shape) == tuple(flatten(model_tree)[k].shape), k


def test_lcm_lora_keys_all_consumed():
    """Every lora_unet_* module group in an LCM-LoRA-shaped file must land on a
    real UNet weight (comfy/lora.py model_lora_keys_unet mapping)."""
    from stable_renderer_tpu.models.lora import parse_lora, _target_lookup

    tree = jax.eval_shape(lambda: UNetModel(SD15_UNET_CONFIG).init(jax.random.PRNGKey(0)))
    lookup = _target_lookup(tree)
    # LCM-LoRA targets: all attention projections + ff + proj_in/out + convs
    lora_flat = {}
    targets = [k for k in sd_unet_keys()
               if any(t in k for t in ("to_q", "to_k", "to_v", "to_out",
                                       "ff.net", "proj_in", "proj_out"))
               and k.endswith(".weight")]
    assert len(targets) > 100
    for t in targets:
        base = t[: -len(".weight")].replace(".", "_")
        lora_flat[f"lora_unet_{base}.lora_up.weight"] = np.zeros((4, 4), np.float16)
        lora_flat[f"lora_unet_{base}.lora_down.weight"] = np.zeros((4, 4), np.float16)
        lora_flat[f"lora_unet_{base}.alpha"] = np.asarray(4.0, np.float16)
    groups = parse_lora(lora_flat, "lora_unet_")
    unmatched = [name for name in groups if name not in lookup]
    assert not unmatched, f"lora modules with no UNet target: {unmatched[:10]}"
    assert len(groups) == len(targets)
