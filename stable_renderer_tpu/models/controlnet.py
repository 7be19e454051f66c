"""ControlNet (cldm) — conditioning the UNet on G-buffer maps.

Capability match for the reference's ControlNet path
(reference: comfy/controlnet.py:36-560 ControlBase/ControlNet load + get_control,
comfy/cldm/cldm.py architecture). The engine feeds it the G-buffer's normal /
depth / canny maps directly (the reference's miku example runs normalbae + depth
ControlNets from the G-buffer, BASELINE.md).

Param tree mirrors the checkpoint names under ``control_model.``:
time_embed.*, input_hint_block.*, input_blocks.*, zero_convs.N.0.*,
middle_block.*, middle_block_out.0.*.

``apply`` returns the control dict consumed by UNetModel.apply:
{'middle': [tensor], 'output': [per-input-block residuals]} — residuals already
scaled by ``strength`` and gated by the (start, end) denoise-percent range
(ControlBase.strength / timestep_range semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import conv2d, linear, silu, timestep_embedding
from stable_renderer_tpu.models.unet import (
    AttnHooks,
    UNetConfig,
    SD15_UNET_CONFIG,
    UNetModel,
    _KeyGen,
    downsample,
    res_block,
    spatial_transformer,
)


@dataclass(frozen=True)
class ControlNetConfig:
    unet: UNetConfig = SD15_UNET_CONFIG
    hint_channels: int = 3


class ControlNet:
    def __init__(self, config: ControlNetConfig = ControlNetConfig()):
        self.config = config
        self._unet = UNetModel(config.unet)

    def apply_hint(self, params: dict, hint: jax.Array) -> jax.Array:
        """input_hint_block: 8 convs, 3 stride-2, hint (B, H, W, 3) -> (B, H/8, W/8, ch)."""
        p = params["input_hint_block"]
        # cldm layout: convs at torch indices 0,2,..,14 with SiLU between; channels
        # 3->16->16->32->32->96->96->256->model_channels, stride 2 at the 32/96/256
        # transitions (the three 2x downsamples: 512 hint -> 64 latent).
        h = hint
        idx_strides = [("0", 1), ("2", 1), ("4", 2), ("6", 1), ("8", 2), ("10", 1), ("12", 2), ("14", 1)]
        for i, (key, stride) in enumerate(idx_strides):
            h = conv2d(p[key], h, stride=stride, padding=1)
            if i != len(idx_strides) - 1:
                h = silu(h)
        return h

    def apply(
        self,
        params: dict,
        x: jax.Array,          # (B, h, w, 4) scaled latent input (same as UNet x)
        hint: jax.Array,       # (B, H, W, 3) control image in [0, 1]
        timesteps: jax.Array,  # (B,)
        context: jax.Array,    # (B, L, D)
        strength: float = 1.0,
        percent_range: Tuple[float, float] = (0.0, 1.0),
        total_timesteps: int = 1000,
    ) -> dict:
        cfg = self.config.unet
        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
        emb = linear(params["time_embed"]["0"], t_emb)
        emb = linear(params["time_embed"]["2"], silu(emb))

        guided_hint = self.apply_hint(params, hint).astype(x.dtype)

        plan_in, _, _ = self._unet.block_plan()
        outs = []
        h = x
        layer_idx = 0
        hooks = AttnHooks()
        for i, (kind, _, depth, dis) in enumerate(plan_in):
            p = params["input_blocks"][str(i)]
            if kind == "conv":
                h = conv2d(p["0"], h, padding=1)
                h = h + guided_hint
            elif kind == "down":
                h = downsample(p["0"], h)
            else:
                h = res_block(p["0"], h, emb)
                if kind == "res_attn":
                    h, layer_idx = spatial_transformer(
                        p["1"], h, context, cfg.heads_for(h.shape[-1]),
                        depth, layer_idx, hooks, disable_self_attn=dis,
                    )
            outs.append(conv2d(params["zero_convs"][str(i)]["0"], h))

        mp = params["middle_block"]
        h = res_block(mp["0"], h, emb)
        h, layer_idx = spatial_transformer(
            mp["1"], h, context, cfg.heads_for(h.shape[-1]),
            max(cfg.middle_depth(), 1), layer_idx, hooks
        )
        h = res_block(mp["2"], h, emb)
        mid = conv2d(params["middle_block_out"]["0"], h)

        # strength + timestep-percent gating (ControlBase semantics): percent is
        # measured in denoise progress, 0 = start (t=999), 1 = end (t=0).
        pct = 1.0 - timesteps[0] / (total_timesteps - 1)
        on = jnp.logical_and(pct >= percent_range[0], pct <= percent_range[1] + 1e-6)
        gate = jnp.where(on, strength, 0.0).astype(x.dtype)
        return {
            "middle": [mid * gate],
            "output": [o * gate for o in outs],
        }

    def init_control_lora(self, unet_params: dict, control_weights: dict) -> dict:
        """ControlLora: compose ControlNet params from the UNet's weights plus a
        low-rank control delta file (comfy/controlnet.py:303-352 ControlLora +
        ControlLoraOps).

        The file stores: full tensors for the control-specific parts (input hint
        block, zero convs, norms, biases) and ``<name>.up``/``<name>.down``
        low-rank factors for the shared linear/conv weights. The reference
        composes ``W + up @ down`` inside every forward; weights are static at
        inference so we merge once at load time (same rationale as the
        merge-based LoRA path, models/lora.py)."""
        import numpy as np

        from stable_renderer_tpu.models.weights import flatten, nest

        flat_unet = flatten(unet_params)
        out: dict = {}
        # start from the UNet's shared trunk (the reference copies the diffusion
        # model's state dict into the control model, controlnet.py:329-336)
        for k, v in flat_unet.items():
            if k.startswith(("time_embed.", "input_blocks.", "middle_block.", "label_emb.")):
                out[k] = v
        ups = {}
        for k, v in control_weights.items():
            if k == "lora_controlnet":
                continue
            if k.endswith(".up") or k.endswith(".down"):
                ups.setdefault(k.rsplit(".", 1)[0], {})[k.rsplit(".", 1)[1]] = np.asarray(v)
            else:
                out[k] = jnp.asarray(v)
        for base, ud in ups.items():
            key = base + ".weight"
            w = np.asarray(out[key])
            up, down = ud["up"], ud["down"]
            delta = (up.reshape(up.shape[0], -1) @ down.reshape(down.shape[0], -1)).reshape(w.shape)
            out[key] = jnp.asarray(w + delta.astype(w.dtype))
        return nest(out, "")

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        """Random init with the checkpoint tree structure."""
        cfg = self.config.unet
        unet_params = self._unet.init(key, dtype)
        keys = _KeyGen(jax.random.fold_in(key, 1))

        def conv(i, o, k=3, zero=False):
            w = (
                jnp.zeros((o, i, k, k), dtype)
                if zero
                else jax.random.normal(keys(), (o, i, k, k), dtype) * 0.02
            )
            return {"weight": w, "bias": jnp.zeros((o,), dtype)}

        plan_in, _, input_chs = self._unet.block_plan()
        ch = cfg.model_channels
        zero_convs = {}
        chs = []
        cur = ch
        for i, (kind, out_ch, _depth, _dis) in enumerate(plan_in):
            if kind not in ("conv", "down") and out_ch is not None:
                cur = out_ch
            zero_convs[str(i)] = {"0": conv(cur, cur, k=1, zero=True)}
            chs.append(cur)
        mid_ch = cfg.model_channels * cfg.channel_mult[-1]
        hint_ch = [16, 16, 32, 32, 96, 96, 256, cfg.model_channels]
        hint = {}
        in_c = self.config.hint_channels
        for j, out_c in enumerate(hint_ch):
            hint[str(j * 2)] = conv(in_c, out_c, zero=(j == len(hint_ch) - 1))
            in_c = out_c
        return {
            "time_embed": unet_params["time_embed"],
            "input_blocks": unet_params["input_blocks"],
            "zero_convs": zero_convs,
            "input_hint_block": hint,
            "middle_block": unet_params["middle_block"],
            "middle_block_out": {"0": conv(mid_ch, mid_ch, k=1, zero=True)},
        }
