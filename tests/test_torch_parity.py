"""Numeric golden parity vs the REFERENCE's own torch modules (VERDICT r3 #1).

Every test here loads IDENTICAL weights into the reference's torch model code
(imported from /root/reference/source/comfyUI/comfy via tests/torch_ref.py,
torch-CPU) and into the JAX implementation, then asserts the outputs agree.
This converts "loads the reference's checkpoints" from a structural claim
(key sets / shapes, tests/test_weight_fidelity.py) into a proven numeric one.

Reference anchors:
  UNet        comfy/ldm/modules/diffusionmodules/openaimodel.py:840 (UNetModel)
  VAE         comfy/ldm/models/autoencoder.py (AutoencoderKL)
  sampling    comfy/k_diffusion/sampling.py:129+ (sample_*)
  schedules   comfy/model_sampling.py (EPS/V_PREDICTION/ModelSamplingDiscrete)
  karras      comfy/k_diffusion/sampling.py:17 (get_sigmas_karras)
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from torch_ref import load_reference_comfy

comfy = load_reference_comfy()

from stable_renderer_tpu.models.unet import UNetConfig, UNetModel
from stable_renderer_tpu.models.weights import detect_unet_config, nest
from stable_renderer_tpu.models.sampling import samplers as jx_samplers
from stable_renderer_tpu.models.sampling import schedules as jx_schedules

TOL = 2e-4  # fp32 end-to-end through a full tiny UNet


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def fill_state_dict(module: torch.nn.Module, seed: int = 0) -> None:
    """Deterministically fill every parameter/buffer with sane values.

    1-D tensors (norm scales/biases) get near-identity values; >=2-D weights
    get small gaussians so a 20-layer stack keeps O(1) activations.
    """
    gen = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    new = {}
    for name, t in sd.items():
        if not torch.is_floating_point(t):
            new[name] = t
            continue
        r = torch.randn(t.shape, generator=gen, dtype=torch.float32)
        if t.ndim <= 1:
            if name.endswith("bias"):
                new[name] = 0.05 * r
            else:
                new[name] = 1.0 + 0.05 * r
        else:
            fan_in = int(np.prod(t.shape[1:])) or 1
            new[name] = r * (0.8 / np.sqrt(fan_in))
    module.load_state_dict(new)


def to_flat_numpy(module: torch.nn.Module, prefix: str) -> dict:
    return {
        prefix + k: v.detach().cpu().numpy()
        for k, v in module.state_dict().items()
        if torch.is_floating_point(v)
    }


def nchw_to_nhwc(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def max_err(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


# --------------------------------------------------------------------------
# UNet
# --------------------------------------------------------------------------

def _tiny_ref_unet(**overrides):
    from comfy.ldm.modules.diffusionmodules.openaimodel import UNetModel as RefUNet

    kwargs = dict(
        image_size=8,
        in_channels=4,
        model_channels=32,
        out_channels=4,
        num_res_blocks=1,
        channel_mult=(1, 2),
        num_heads=2,
        use_spatial_transformer=True,
        # per-res-block lists (input order / output order) + middle, the
        # layout comfy/model_detection.py produces
        transformer_depth=[1, 1],
        transformer_depth_output=[1, 1, 1, 1],
        transformer_depth_middle=1,
        context_dim=64,
        dtype=torch.float32,
    )
    kwargs.update(overrides)
    m = RefUNet(**kwargs)
    m.eval()
    return m


@pytest.mark.slow
def test_unet_sd15_tiny_parity():
    """SD1.5-class topology: identical weights -> identical eps prediction."""
    ref = _tiny_ref_unet()
    fill_state_dict(ref, seed=1)
    flat = to_flat_numpy(ref, "model.diffusion_model.")

    cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_levels=(0, 1), num_heads=2,
        context_dim=64,
    )
    mine = UNetModel(cfg)
    params = jax.tree_util.tree_map(
        jnp.asarray, nest(flat, "model.diffusion_model.")
    )

    gen = torch.Generator().manual_seed(7)
    x = torch.randn(2, 4, 8, 8, generator=gen)
    t = torch.tensor([400.0, 77.0])
    ctx = torch.randn(2, 9, 64, generator=gen)

    with torch.no_grad():
        ref_out = ref(x, timesteps=t, context=ctx)

    out = mine.apply(
        params, nchw_to_nhwc(x), jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy())
    )
    err = max_err(ref_out.numpy(), np.asarray(out).transpose(0, 3, 1, 2))
    assert err < TOL, f"UNet outputs diverge: max abs err {err}"

    # structural detection recovers the same architecture from the state dict
    det = detect_unet_config(flat)
    assert det.model_channels == 32
    assert tuple(det.channel_mult) == (1, 2)
    assert det.context_dim == 64
    assert det.in_channels == 4


@pytest.mark.slow
def test_unet_sdxl_tiny_parity():
    """SDXL-family topology: ADM pooled conditioning + per-level depths +
    head_dim heads + no level-0 attention."""
    ref = _tiny_ref_unet(
        model_channels=32,
        channel_mult=(1, 2),
        transformer_depth=[0, 2],  # input order: none at level 0, 2 at level 1
        # comfy convention (model_detection.py SDXL presets): listed
        # shallow-level-first; openaimodel pops from the END building the
        # deep-first output blocks
        transformer_depth_output=[0, 0, 2, 2],
        transformer_depth_middle=2,
        context_dim=96,
        num_heads=-1,
        num_head_channels=16,
        num_classes="sequential",
        adm_in_channels=24,
        use_linear_in_transformer=True,
    )
    fill_state_dict(ref, seed=2)
    flat = to_flat_numpy(ref, "model.diffusion_model.")

    det = detect_unet_config(flat)
    assert tuple(det.channel_mult) == (1, 2)
    assert det.adm_in_channels == 24
    # detection lists out-depths in output_blocks.{i} (deep-first) order
    assert tuple(det.transformer_depth_blocks_out) == (2, 2, 0, 0)
    # head width is a family convention, invisible in the state dict — the
    # heuristic assumes the production 64; this tiny model uses 16
    import dataclasses

    mine = UNetModel(dataclasses.replace(det, head_dim=16))
    params = jax.tree_util.tree_map(
        jnp.asarray, nest(flat, "model.diffusion_model.")
    )

    gen = torch.Generator().manual_seed(8)
    x = torch.randn(2, 4, 8, 8, generator=gen)
    t = torch.tensor([900.0, 12.0])
    ctx = torch.randn(2, 6, 96, generator=gen)
    y = torch.randn(2, 24, generator=gen)

    with torch.no_grad():
        ref_out = ref(x, timesteps=t, context=ctx, y=y)

    out = mine.apply(
        params, nchw_to_nhwc(x), jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()), y=jnp.asarray(y.numpy()),
    )
    err = max_err(ref_out.numpy(), np.asarray(out).transpose(0, 3, 1, 2))
    assert err < TOL, f"SDXL-family UNet outputs diverge: max abs err {err}"


@pytest.mark.slow
def test_unet_controlnet_residual_injection_parity():
    """Control residuals applied at the reference's exact injection points
    (openaimodel.py apply_control: output hs + middle)."""
    ref = _tiny_ref_unet()
    fill_state_dict(ref, seed=3)
    flat = to_flat_numpy(ref, "model.diffusion_model.")

    cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_levels=(0, 1), num_heads=2,
        context_dim=64,
    )
    mine = UNetModel(cfg)
    params = jax.tree_util.tree_map(
        jnp.asarray, nest(flat, "model.diffusion_model.")
    )

    gen = torch.Generator().manual_seed(9)
    x = torch.randn(1, 4, 8, 8, generator=gen)
    t = torch.tensor([333.0])
    ctx = torch.randn(1, 5, 64, generator=gen)

    # ControlNet-style residuals: one per input block (by h shape), one middle
    plan_in, _, _ = mine.block_plan()
    shapes = []
    h_ch, h_res = 32, 8
    ref_ctrl_out = []
    # reconstruct the per-block h shapes by walking the plan
    chans = []
    for kind, ch, *_ in plan_in:
        chans.append(ch)
    # run the torch model once to harvest actual skip shapes via hooks
    skips = []

    def _grab(module, inputs, output):
        pass

    with torch.no_grad():
        # harvest: reference forward stores hs internally; emulate via control
        # dict of correct shapes by probing module list lengths
        n_in = len(ref.input_blocks)
        probe = ref(x, timesteps=t, context=ctx)

    # Build residual tensors shaped like each input block's output: run a
    # manual forward over ref.input_blocks to capture shapes.
    with torch.no_grad():
        from comfy.ldm.modules.diffusionmodules.openaimodel import (
            timestep_embedding as ref_temb,
        )

        t_emb = ref_temb(t, 32, repeat_only=False)
        emb = ref.time_embed(t_emb)
        h = x
        shapes = []
        for module in ref.input_blocks:
            h = module(h, emb, context=ctx)
            shapes.append(tuple(h.shape))
        mid_shape = tuple(ref.middle_block(h, emb, context=ctx).shape)

    gen2 = torch.Generator().manual_seed(10)
    ctrl_outputs = [0.1 * torch.randn(s, generator=gen2) for s in shapes]
    ctrl_middle = [0.1 * torch.randn(mid_shape, generator=gen2)]

    control = {"output": list(ctrl_outputs), "middle": list(ctrl_middle)}
    with torch.no_grad():
        ref_out = ref(x, timesteps=t, context=ctx, control=control)

    my_control = {
        "output": [nchw_to_nhwc(c) for c in ctrl_outputs],
        "middle": [nchw_to_nhwc(c) for c in ctrl_middle],
    }
    out = mine.apply(
        params, nchw_to_nhwc(x), jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
        control=my_control,
    )
    err = max_err(ref_out.numpy(), np.asarray(out).transpose(0, 3, 1, 2))
    assert err < TOL, f"control-injected UNet outputs diverge: max abs err {err}"


# --------------------------------------------------------------------------
# model_sampling: schedules + parameterizations
# --------------------------------------------------------------------------

def test_discrete_schedule_sigmas_parity():
    """ModelSamplingDiscrete sigma table from the SD beta schedule."""
    import comfy.model_sampling as ms

    ref = ms.ModelSamplingDiscrete()
    mine = jx_schedules.ModelSampling()
    assert max_err(ref.sigmas.numpy(), mine.sigmas) < 1e-4
    # timestep(sigma) round trip at arbitrary sigmas
    test_sigmas = np.asarray([0.03, 0.5, 3.7, 14.6], np.float32)
    ref_t = ref.timestep(torch.from_numpy(test_sigmas)).numpy()
    my_t = mine.timestep(test_sigmas)
    assert max_err(ref_t, my_t) < 1e-2
    # sigma(timestep)
    ts = np.asarray([0.0, 250.3, 999.0], np.float32)
    ref_s = ref.sigma(torch.from_numpy(ts)).numpy()
    my_s = mine.sigma(ts)
    assert max_err(ref_s, my_s) < 1e-4


def test_eps_v_parameterization_parity():
    """EPS / V_PREDICTION calculate_denoised + calculate_input."""
    import comfy.model_sampling as ms

    gen = torch.Generator().manual_seed(11)
    x = torch.randn(2, 4, 4, 4, generator=gen)
    out = torch.randn(2, 4, 4, 4, generator=gen)
    sigma = torch.tensor([0.7, 5.3])

    from stable_renderer_tpu.models.sampling.cfg import calculate_denoised

    for pred, cls in (("eps", ms.EPS), ("v", ms.V_PREDICTION)):
        obj = cls()
        ref_den = obj.calculate_denoised(sigma, out, x).numpy()
        mine = calculate_denoised(
            pred, jnp.asarray(x.numpy()), jnp.asarray(out.numpy()),
            jnp.asarray(sigma.numpy()).reshape(-1, 1, 1, 1),
            jnp.zeros((2, 1, 1, 1)),
        )
        assert max_err(ref_den, np.asarray(mine)) < 1e-5, pred

        ref_in = obj.calculate_input(sigma, x).numpy()
        scale = 1.0 / np.sqrt(
            sigma.numpy().reshape(-1, 1, 1, 1) ** 2 + 1.0
        )
        assert max_err(ref_in, x.numpy() * scale) < 1e-6


def test_karras_exponential_sigmas_parity():
    from comfy.k_diffusion.sampling import (
        get_sigmas_exponential, get_sigmas_karras,
    )

    ref_k = get_sigmas_karras(12, 0.0292, 14.61).numpy()
    mine_k = jx_schedules.sigmas_karras(12, 0.0292, 14.61)
    assert max_err(ref_k, mine_k) < 1e-4

    ref_e = get_sigmas_exponential(9, 0.0292, 14.61).numpy()
    mine_e = jx_schedules.sigmas_exponential(9, 0.0292, 14.61)
    assert max_err(ref_e, mine_e) < 1e-4


# --------------------------------------------------------------------------
# sampler trajectories (identical synthetic denoiser both sides)
# --------------------------------------------------------------------------

def _ref_denoiser():
    def model(x, sigma, **kwargs):
        s = sigma.reshape(-1, *([1] * (x.ndim - 1)))
        return torch.tanh(x * 0.3) * 2.0 + x * (0.1 / (1.0 + s))

    return model


def _jx_denoiser():
    def model(x, sigma):
        s = jnp.reshape(sigma, (-1,) + (1,) * (x.ndim - 1))
        return jnp.tanh(x * 0.3) * 2.0 + x * (0.1 / (1.0 + s))

    return model


DETERMINISTIC_SAMPLERS = [
    ("euler", "sample_euler", {}),
    ("heun", "sample_heun", {}),
    ("dpm_2", "sample_dpm_2", {}),
    ("dpmpp_2m", "sample_dpmpp_2m", {}),
    ("lms", "sample_lms", {}),
    ("heunpp2", "sample_heunpp2", {}),
    ("euler_ancestral", "sample_euler_ancestral", {"eta": 0.0}),
    ("dpmpp_2s_ancestral", "sample_dpmpp_2s_ancestral", {"eta": 0.0}),
    ("dpm_2_ancestral", "sample_dpm_2_ancestral", {"eta": 0.0}),
    ("lcm", "sample_lcm", {}),
]


@pytest.mark.parametrize("name,ref_name,kwargs", DETERMINISTIC_SAMPLERS)
def test_sampler_trajectory_parity(name, ref_name, kwargs):
    """Full multi-step trajectories agree with k_diffusion/sampling.py."""
    import comfy.k_diffusion.sampling as kds

    sigmas_np = jx_schedules.sigmas_karras(6, 0.1, 10.0).astype(np.float32)
    gen = torch.Generator().manual_seed(12)
    noise = torch.randn(1, 3, 4, 4, generator=gen)
    x0_ref = noise * float(sigmas_np[0])

    ref_fn = getattr(kds, ref_name)
    ref_kwargs = dict(kwargs)
    if name == "lcm":
        # lcm re-noises between steps; at eta-free parity we pass a zero
        # noise sampler so both sides are deterministic
        ref_kwargs["noise_sampler"] = lambda a, b: torch.zeros_like(noise)
    if name.endswith("ancestral"):
        ref_kwargs["noise_sampler"] = lambda a, b: torch.zeros_like(noise)
    with torch.no_grad():
        ref_out = ref_fn(
            _ref_denoiser(), x0_ref.clone(),
            torch.from_numpy(sigmas_np), **ref_kwargs,
        ).numpy()

    my_kwargs = {}
    if "eta" in kwargs:
        my_kwargs["eta"] = kwargs["eta"]
    if name == "lcm":
        my_kwargs["sde_noise"] = "zero"
    out = jx_samplers.sample(
        _jx_denoiser(), jnp.asarray(noise.numpy()),
        jnp.asarray(sigmas_np), sampler=name, **my_kwargs,
    )
    err = max_err(ref_out, np.asarray(out))
    assert err < 5e-4, f"{name} trajectory diverges: max abs err {err}"


# --------------------------------------------------------------------------
# VAE
# --------------------------------------------------------------------------

def _tiny_ref_vae():
    from comfy.ldm.models.autoencoder import AutoencoderKL

    ddconfig = dict(
        double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=[],
        dropout=0.0,
    )
    m = AutoencoderKL(ddconfig=ddconfig, embed_dim=4)
    m.eval()
    return m


@pytest.mark.slow
def test_vae_encode_decode_parity():
    """AutoencoderKL encoder moments + decoder pixels, identical weights."""
    from stable_renderer_tpu.models.vae import VAE, VAEConfig

    ref = _tiny_ref_vae()
    fill_state_dict(ref, seed=4)
    flat = to_flat_numpy(ref, "first_stage_model.")

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, scale_factor=1.0)
    mine = VAE(cfg)
    params = jax.tree_util.tree_map(jnp.asarray, nest(flat, "first_stage_model."))

    gen = torch.Generator().manual_seed(13)
    x = torch.randn(1, 3, 16, 16, generator=gen) * 0.5

    with torch.no_grad():
        h = ref.encoder(x)
        ref_moments = ref.quant_conv(h)
    my_moments = mine.encode_moments(params, nchw_to_nhwc(x))
    err = max_err(ref_moments.numpy(), np.asarray(my_moments).transpose(0, 3, 1, 2))
    assert err < TOL, f"VAE encoder moments diverge: {err}"

    z = torch.randn(1, 4, 4, 4, generator=gen)
    with torch.no_grad():
        ref_px = ref.decode(z)
    my_px = mine.decode(params, nchw_to_nhwc(z))  # scale_factor=1.0
    err = max_err(ref_px.numpy(), np.asarray(my_px).transpose(0, 3, 1, 2))
    assert err < TOL, f"VAE decoder pixels diverge: {err}"


# --------------------------------------------------------------------------
# CLIP text encoder
# --------------------------------------------------------------------------

TINY_CLIP_JSON = dict(
    hidden_act="quick_gelu", hidden_size=64, intermediate_size=128,
    num_attention_heads=2, num_hidden_layers=3, vocab_size=600,
    max_position_embeddings=77, layer_norm_eps=1e-5, projection_dim=64,
)


@pytest.mark.slow
def test_clip_text_encoder_parity():
    """comfy/clip_model.py CLIPTextModel vs models/clip.py, incl. clip_skip
    (intermediate_output) and the EOS pooled output."""
    import comfy.clip_model
    import comfy.ops

    with torch.no_grad():
        ref = comfy.clip_model.CLIPTextModel(
            TINY_CLIP_JSON, torch.float32, "cpu", comfy.ops.manual_cast
        )
    ref.eval()
    fill_state_dict(ref, seed=5)

    from stable_renderer_tpu.models.clip import CLIPConfig, CLIPTextModel

    cfg = CLIPConfig(
        vocab_size=600, hidden_size=64, num_layers=3, num_heads=2,
        intermediate_size=128, eos_token=599,
    )
    mine = CLIPTextModel(cfg)
    flat = to_flat_numpy(ref, "")
    params = jax.tree_util.tree_map(jnp.asarray, nest(flat, ""))

    gen = torch.Generator().manual_seed(14)
    tokens = torch.randint(0, 598, (2, 77), generator=gen)
    tokens[:, -1] = 599  # EOS at the end

    with torch.no_grad():
        last, inter, pooled_proj, pooled_raw = ref(
            tokens, None, intermediate_output=None,
            final_layer_norm_intermediate=True,
        )
    my_last = mine.apply(params, jnp.asarray(tokens.numpy()), clip_skip=-1)
    assert max_err(last.numpy(), np.asarray(my_last)) < TOL

    # clip_skip = -2 (penultimate hidden, final-norm applied: SD2 semantics)
    with torch.no_grad():
        _, inter2, _, _ = ref(
            tokens, None, intermediate_output=-2,
            final_layer_norm_intermediate=True,
        )
    my_skip = mine.apply(params, jnp.asarray(tokens.numpy()), clip_skip=-2)
    assert max_err(inter2.numpy(), np.asarray(my_skip)) < TOL

    # penultimate WITHOUT final norm (SDXL clip_l semantics)
    with torch.no_grad():
        _, inter3, _, _ = ref(
            tokens, None, intermediate_output=-2,
            final_layer_norm_intermediate=False,
        )
    my_raw = mine.apply(
        params, jnp.asarray(tokens.numpy()), clip_skip=-2, final_norm=False
    )
    assert max_err(inter3.numpy(), np.asarray(my_raw)) < TOL

    # pooled (EOS position of the final-normed hidden)
    my_pooled = mine.pooled(params, jnp.asarray(tokens.numpy()), my_last)
    assert max_err(pooled_raw.numpy(), np.asarray(my_pooled)) < TOL


# --------------------------------------------------------------------------
# ControlNet
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_controlnet_residuals_parity():
    """cldm/cldm.py ControlNet: hint block + zero-conv residual stack."""
    from comfy.cldm.cldm import ControlNet as RefControlNet

    ref = RefControlNet(
        image_size=8, in_channels=4, model_channels=32, hint_channels=3,
        num_res_blocks=1, channel_mult=(1, 2), num_heads=2,
        use_spatial_transformer=True, transformer_depth=[1, 1],
        transformer_depth_middle=1, context_dim=64, dtype=torch.float32,
    )
    ref.eval()
    fill_state_dict(ref, seed=6)
    flat = to_flat_numpy(ref, "control_model.")

    from stable_renderer_tpu.models.controlnet import ControlNet, ControlNetConfig

    ucfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_levels=(0, 1), num_heads=2,
        context_dim=64,
    )
    mine = ControlNet(ControlNetConfig(unet=ucfg))
    params = jax.tree_util.tree_map(jnp.asarray, nest(flat, "control_model."))

    gen = torch.Generator().manual_seed(15)
    x = torch.randn(1, 4, 8, 8, generator=gen)
    hint = torch.rand(1, 3, 64, 64, generator=gen)
    t = torch.tensor([440.0])
    ctx = torch.randn(1, 5, 64, generator=gen)

    with torch.no_grad():
        ref_outs = ref(x, hint, t, ctx)

    out = mine.apply(
        params, nchw_to_nhwc(x), nchw_to_nhwc(hint),
        jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()),
    )
    my_seq = out["output"] + out["middle"]
    assert len(ref_outs) == len(my_seq)
    for i, (r, m) in enumerate(zip(ref_outs, my_seq)):
        err = max_err(r.numpy(), np.asarray(m).transpose(0, 3, 1, 2))
        # scale-aware: the randomly-filled "zero convs" amplify activations
        # to O(5); observed relative drift is ~5e-5 (fp32 accumulation order)
        scale = max(1.0, float(np.abs(r.numpy()).max()))
        assert err < 2e-4 * scale, f"control residual {i} diverges: {err}"


# --------------------------------------------------------------------------
# LoRA weight merging
# --------------------------------------------------------------------------

def test_lora_merge_formula_parity():
    """ModelPatcher.calculate_weight 'lora' branch vs models/lora.py merge:
    alpha/rank scaling + strength, linear and conv targets."""
    from comfy.model_patcher import ModelPatcher

    gen = torch.Generator().manual_seed(16)
    for shape, rank in [((20, 12), 4), ((16, 8, 3, 3), 4)]:
        w = torch.randn(shape, generator=gen)
        up = torch.randn((shape[0], rank), generator=gen)
        down_flat_dim = int(np.prod(shape[1:]))
        down = torch.randn((rank, down_flat_dim), generator=gen)
        alpha_val = 2.0
        strength = 0.7

        patches = [(strength, ("lora", (up, down, alpha_val, None)), 1.0)]
        ref_merged = ModelPatcher.calculate_weight(
            None, patches, w.clone(), "test.weight"
        ).numpy()

        from stable_renderer_tpu.models.lora import merge_lora

        my_params = {"test": {"weight": jnp.asarray(w.numpy())}}
        lora_flat = {
            "lora_unet_test.lora_up.weight": up.numpy(),
            "lora_unet_test.lora_down.weight": down.numpy().reshape(
                (rank,) + tuple(shape[1:])
            ) if len(shape) == 4 else down.numpy(),
            "lora_unet_test.alpha": np.float32(alpha_val),
        }
        merged = merge_lora(my_params, lora_flat, strength=strength, prefix="lora_unet_")
        err = max_err(ref_merged, np.asarray(merged["test"]["weight"]))
        assert err < 1e-5, f"lora merge diverges for {shape}: {err}"


# --------------------------------------------------------------------------
# full denoise loop: weights -> CFG denoiser -> 4-step euler img2img
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_full_cfg_img2img_loop_parity():
    """End-to-end: identical tiny SD1.5 weights through the reference's
    EPS parameterization + CFG + k_diffusion euler (all reference code)
    vs make_denoiser + the jitted lax.scan sampler."""
    import comfy.k_diffusion.sampling as kds
    import comfy.model_sampling as ms

    ref = _tiny_ref_unet()
    fill_state_dict(ref, seed=17)
    flat = to_flat_numpy(ref, "model.diffusion_model.")

    cfg = UNetConfig(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        channel_mult=(1, 2), attention_levels=(0, 1), num_heads=2,
        context_dim=64,
    )
    mine = UNetModel(cfg)
    params = jax.tree_util.tree_map(
        jnp.asarray, nest(flat, "model.diffusion_model.")
    )

    gen = torch.Generator().manual_seed(18)
    pos = torch.randn(1, 7, 64, generator=gen)
    neg = torch.randn(1, 7, 64, generator=gen)
    init_latent = torch.randn(1, 4, 8, 8, generator=gen) * 0.3
    noise = torch.randn(1, 4, 8, 8, generator=gen)
    cfg_scale = 2.0

    ms_ref = ms.ModelSamplingDiscrete()
    eps_ref = ms.EPS()

    # 4-step sigma slice of the full schedule (denoise=0.4-ish img2img window)
    sig_all = ms_ref.sigmas.flip(0)  # descending
    sigmas = torch.cat([sig_all[[700, 800, 900, 970]].flip(0) * 0 + torch.tensor(
        [sig_all[300], sig_all[500], sig_all[750], sig_all[950]]
    ), torch.zeros(1)])

    def ref_denoiser(x, sigma, **kwargs):
        t = ms_ref.timestep(sigma).float()
        x_in = eps_ref.calculate_input(sigma, x)
        b = x.shape[0]
        eps_c = ref(x_in, timesteps=t.expand(b), context=pos)
        eps_u = ref(x_in, timesteps=t.expand(b), context=neg)
        den_c = eps_ref.calculate_denoised(sigma, eps_c, x)
        den_u = eps_ref.calculate_denoised(sigma, eps_u, x)
        # sampling_function's CFG combine (comfy/samplers.py)
        return den_u + (den_c - den_u) * cfg_scale

    x0 = init_latent + noise * sigmas[0]
    with torch.no_grad():
        ref_out = kds.sample_euler(ref_denoiser, x0.clone(), sigmas).numpy()

    from stable_renderer_tpu.models.sampling import schedules as jxs
    from stable_renderer_tpu.models.sampling.cfg import make_denoiser

    ms_mine = jxs.ModelSampling()
    den = make_denoiser(
        mine, params,
        cond_context=jnp.asarray(pos.numpy()),
        uncond_context=jnp.asarray(neg.numpy()),
        log_sigmas=jnp.asarray(ms_mine.log_sigmas),
        cfg_scale=cfg_scale, prediction="eps",
    )
    out = jx_samplers.sample(
        den, nchw_to_nhwc(noise), jnp.asarray(sigmas.numpy()),
        latent_image=nchw_to_nhwc(init_latent), sampler="euler",
    )
    err = max_err(ref_out, np.asarray(out).transpose(0, 3, 1, 2))
    assert err < 1e-3, f"full img2img loop diverges: {err}"
