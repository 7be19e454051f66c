"""SD1.5/SD2-class UNet as a pure function, with correspondence hooks.

Re-implements the capability of the reference's forked ldm UNet
(reference: comfy/ldm/modules/diffusionmodules/openaimodel.py:840-946 UNetModel,
comfy/ldm/modules/attention.py:405-720 SpatialTransformer/BasicTransformerBlock)
as functional JAX over torch-layout param dicts (see models/weights.py for
checkpoint loading).

The reference threads a mutable ``transformer_options`` dict through every block
and calls ``corresponder.pre_atten_inject`` / ``post_atten_inject`` around each
self-attention (attention.py:529-599) — the temporal-consistency injection points.
Here those hooks are **explicit traced callables** (AttnHooks): pure functions of
(tensor, layer_index) so they compile into the jitted denoise step. The 16
BasicTransformerBlocks of SD1.5 are numbered 0..15 in execution order, matching
the reference's running transformer_index.

ControlNet residuals enter exactly like the reference's apply_control
(comfy/controlnet.py): added to skip connections (output hidden states) and to the
middle block output.

Everything is NHWC; matmuls/convs run in the activation dtype (bf16 on TPU) with
fp32 norm statistics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import (
    attention,
    conv2d,
    geglu,
    group_norm,
    layer_norm,
    linear,
    norm_act_conv,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    attention_levels: Tuple[int, ...] = (0, 1, 2)  # levels with SpatialTransformer
    transformer_depth: int = 1
    # SDXL-style per-level transformer depth; None = uniform transformer_depth
    transformer_depth_per_level: Optional[Tuple[int, ...]] = None
    # Per-res-block transformer depths (comfy model_detection layout: one int
    # per res block, input_blocks order / output_blocks order). Distilled SDXL
    # variants (SSD-1B, Segmind Vega, KOALA — supported_models.py:217-255) have
    # non-uniform per-block depths that the per-level scheme can't express.
    # None = use the per-level scheme above.
    transformer_depth_blocks: Optional[Tuple[int, ...]] = None
    transformer_depth_blocks_out: Optional[Tuple[int, ...]] = None
    # Middle block layout (openaimodel.py:735-738): None = transformer at the
    # last level's depth (legacy presets); >=0 = [res, transformer(d), res];
    # -1 = [res] only (SSD-1B); <=-2 = no middle block at all.
    transformer_depth_middle: Optional[int] = None
    # Per-level res-block counts (KOALA prunes blocks); None = uniform
    num_res_blocks_per_level: Optional[Tuple[int, ...]] = None
    # Per-level disable_self_attentions (SD_X4Upscaler,
    # supported_models.py:308-322): attn1 cross-attends the text context
    # instead of self-attending
    disable_self_attn_levels: Optional[Tuple[bool, ...]] = None
    # Class-conditional label embedding (openaimodel num_classes=int path,
    # SD_X4Upscaler's noise-level conditioning): label_emb is an embedding
    # TABLE (num_classes, time_embed_dim) indexed by integer y, not the
    # SDXL-style ADM MLP
    num_classes: Optional[int] = None
    num_heads: int = 8
    # SDXL uses fixed head_dim=64 instead of fixed head count; set to override
    head_dim: Optional[int] = None
    context_dim: int = 768
    # SDXL ADM conditioning (pooled text + size embeddings) input width
    adm_in_channels: Optional[int] = None
    dtype: str = "float32"

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4

    def depth_at(self, level: int) -> int:
        if self.transformer_depth_per_level is not None:
            return self.transformer_depth_per_level[level]
        return self.transformer_depth

    def res_blocks_at(self, level: int) -> int:
        if self.num_res_blocks_per_level is not None:
            return self.num_res_blocks_per_level[level]
        return self.num_res_blocks

    def middle_depth(self) -> int:
        """Resolved middle-block transformer depth (see transformer_depth_middle)."""
        if self.transformer_depth_middle is not None:
            return self.transformer_depth_middle
        return max(self.depth_at(len(self.channel_mult) - 1), 1)

    def self_attn_disabled(self, level: int) -> bool:
        if self.disable_self_attn_levels is None:
            return False
        return bool(self.disable_self_attn_levels[level])

    def heads_for(self, channels: int) -> int:
        if self.head_dim is not None:
            return max(channels // self.head_dim, 1)
        return self.num_heads


SD15_UNET_CONFIG = UNetConfig()

SDXL_UNET_CONFIG = UNetConfig(
    model_channels=320,
    channel_mult=(1, 2, 4),
    attention_levels=(1, 2),
    transformer_depth_per_level=(0, 2, 10),
    head_dim=64,
    context_dim=2048,
    adm_in_channels=2816,
)
"""SDXL base topology (comfy/supported_models.py SDXL): attention at levels 1-2
with depths 2/10, 2048-dim dual-CLIP context, ADM pooled conditioning."""

TINY_UNET_CONFIG = UNetConfig(
    model_channels=32,
    num_res_blocks=1,
    channel_mult=(1, 2),
    attention_levels=(0, 1),
    num_heads=2,
    context_dim=64,
)
"""Small config for tests (same topology, tiny widths)."""

TINY_SDXL_UNET_CONFIG = UNetConfig(
    model_channels=32,
    num_res_blocks=1,
    channel_mult=(1, 2),
    attention_levels=(0, 1),
    num_heads=2,
    context_dim=128,        # concat(tiny clip_l 64, tiny clip_g 64)
    adm_in_channels=32 + 6 * 256,  # tiny clip_g projection + size fouriers
)
"""Tiny SDXL-family config for tests: ADM conditioning + dual-CLIP context."""


class AttnHooks(NamedTuple):
    """The Corresponder attention-injection points (corresponder.py:29-98),
    as traceable pure functions.

    pre:  (q_ctx, k_ctx, v_ctx, layer_idx) -> (q_ctx, k_ctx, v_ctx)
          called on the *contexts* before the q/k/v projections of self-attention
          (reference attention.py:565-587).
    post: (values, layer_idx) -> values
          called on the attention output of self-attention
          (reference attention.py:596-599; the reference applies it to
          positive-cond rows only — the caller slices).
    attn: (q, k, v, heads, layer_idx) -> values
          replaces the self-attention computation itself (post-projection) —
          the hook point for cross-frame / ring attention, where the frame
          batch is the sequence-parallel axis (SURVEY.md section 2.6). No
          reference analogue (the reference's optimized_attention is
          backend-selection only); on TPU this is where frame-sharded
          sequence parallelism plugs in.
    mid:  (x, layer_idx) -> x
          fires after the attn1 residual add, before cross-attention — the
          reference's "middle_patch" transformer-patch point where GLIGEN
          fusers attach (comfy/ldm/modules/attention.py BasicTransformerBlock
          middle_patch; gligen.py Gligen._set_position).

    Model-patch hook points (comfy ModelPatcher set_model_* API). Unlike the
    Corresponder hooks above, the CFG wrapper (cfg.py wrap_hooks) passes these
    through UNCHANGED — they apply to the full cond+uncond batch, matching the
    reference's model patches which are not cond-sliced:

    pre_all:   (q_ctx, k_ctx, v_ctx, layer_idx) -> (q_ctx, k_ctx, v_ctx)
               attn1 context patch on the full batch (set_model_attn1_patch,
               e.g. hypernetworks).
    pre_cross: (n, ctx_k, ctx_v, layer_idx) -> (n, ctx_k, ctx_v)
               attn2 (cross-attention) context patch (set_model_attn2_patch).
    attn_all:  (q, k, v, heads, layer_idx) -> values
               replaces self-attention on the full batch (set_model_attn1_replace
               semantics, e.g. HyperTile's tiled attention).
    out_block: (h, hsp, block_idx) -> (h, hsp)
               output-block patch before the skip concat
               (set_model_output_block_patch, e.g. FreeU).
    in_block:  (h, block_idx, t) -> h
               input-block patch applied after each input block BEFORE the
               activation is stored as a skip (set_model_input_block_patch,
               openaimodel.py forward input_block_patch). ``t`` is the (B,)
               timestep batch so sigma-gated patches (Kohya Deep Shrink)
               can gate per step under jit.
    in_block_after: (h, block_idx, t) -> h
               same, but applied AFTER the skip store — the skip keeps the
               unpatched activation (set_model_input_block_patch_after_skip).
    """

    pre: Optional[Callable] = None
    post: Optional[Callable] = None
    attn: Optional[Callable] = None
    mid: Optional[Callable] = None
    pre_all: Optional[Callable] = None
    pre_cross: Optional[Callable] = None
    attn_all: Optional[Callable] = None
    out_block: Optional[Callable] = None
    in_block: Optional[Callable] = None
    in_block_after: Optional[Callable] = None


# ---------------------------------------------------------------------------
# blocks


def res_block(p: dict, x: jax.Array, emb: jax.Array) -> jax.Array:
    """openaimodel ResBlock: GN-SiLU-conv + time-emb add + GN-SiLU-conv + skip.

    GN+SiLU run as one fused op (Pallas kernel on TPU — one HBM read/write
    instead of the XLA lowering's f32 double-materialization).

    eps=1e-5: ResBlock norms are plain ``operations.GroupNorm(32, ch)`` (torch
    default eps), unlike the transformer/VAE Normalize's explicit 1e-6 —
    numeric parity vs the reference is asserted in tests/test_torch_parity.py.
    """
    h = norm_act_conv(p["in_layers"]["0"], p["in_layers"]["2"], x, eps=1e-5)
    emb_out = linear(p["emb_layers"]["1"], silu(emb))
    h = h + emb_out[:, None, None, :].astype(h.dtype)
    h = norm_act_conv(p["out_layers"]["0"], p["out_layers"]["3"], h, eps=1e-5)
    if "skip_connection" in p:
        x = conv2d(p["skip_connection"], x)
    return x + h


def basic_transformer_block(
    p: dict,
    x: jax.Array,            # (B, L, C)
    context: jax.Array,      # (B, Lc, context_dim)
    heads: int,
    layer_idx: int,
    hooks: AttnHooks,
    disable_self_attn: bool = False,
) -> jax.Array:
    """attention.py BasicTransformerBlock._forward with the injection points.

    ``disable_self_attn`` (SD_X4Upscaler levels) makes attn1 cross-attend the
    text context instead of self-attending; the injection hooks (which patch
    SELF-attention K/V streams) are bypassed for such blocks."""
    # self-attention (attn1): context for q/k/v is the normed x
    n = layer_norm(p["norm1"], x)
    if disable_self_attn:
        q = linear(p["attn1"]["to_q"], n)
        k = linear(p["attn1"]["to_k"], context)
        v = linear(p["attn1"]["to_v"], context)
        x = x + linear(p["attn1"]["to_out"]["0"], attention(q, k, v, heads))
        n = layer_norm(p["norm2"], x)
        q = linear(p["attn2"]["to_q"], n)
        k = linear(p["attn2"]["to_k"], context)
        v = linear(p["attn2"]["to_v"], context)
        x = x + linear(p["attn2"]["to_out"]["0"], attention(q, k, v, heads))
        n = layer_norm(p["norm3"], x)
        return x + linear(p["ff"]["net"]["2"], geglu(p["ff"]["net"]["0"], n))
    q_ctx, k_ctx, v_ctx = n, n, n
    if hooks.pre is not None:
        q_ctx, k_ctx, v_ctx = hooks.pre(q_ctx, k_ctx, v_ctx, layer_idx)
    if hooks.pre_all is not None:  # model patches (full batch, e.g. hypernets)
        q_ctx, k_ctx, v_ctx = hooks.pre_all(q_ctx, k_ctx, v_ctx, layer_idx)
    if q_ctx is k_ctx and k_ctx is v_ctx:
        # fused QKV: one (L,C)@(C,3C) matmul instead of three — saves two
        # read passes of the normed activations per self-attention. The
        # weight concat is loop-invariant (params), so XLA hoists it out of
        # the denoise scan. Falls back to separate projections whenever a
        # pre-hook rewrote any of the three contexts.
        w_qkv = jnp.concatenate(
            [p["attn1"]["to_q"]["weight"], p["attn1"]["to_k"]["weight"],
             p["attn1"]["to_v"]["weight"]], axis=0)
        q, k, v = jnp.split(linear({"weight": w_qkv}, q_ctx), 3, axis=-1)
    else:
        q = linear(p["attn1"]["to_q"], q_ctx)
        k = linear(p["attn1"]["to_k"], k_ctx)
        v = linear(p["attn1"]["to_v"], v_ctx)
    if hooks.attn is not None:
        attn_out = hooks.attn(q, k, v, heads, layer_idx)
    elif hooks.attn_all is not None:  # full-batch replacement (e.g. HyperTile)
        attn_out = hooks.attn_all(q, k, v, heads, layer_idx)
    else:
        attn_out = attention(q, k, v, heads)
    if hooks.post is not None:
        attn_out = hooks.post(attn_out, layer_idx)
    x = x + linear(p["attn1"]["to_out"]["0"], attn_out)

    if hooks.mid is not None:  # GLIGEN fuser point (middle_patch)
        x = hooks.mid(x, layer_idx)

    # cross-attention (attn2) over the text context
    n = layer_norm(p["norm2"], x)
    ctx_k = ctx_v = context
    if hooks.pre_cross is not None:  # attn2 context patch (hypernetworks)
        n, ctx_k, ctx_v = hooks.pre_cross(n, ctx_k, ctx_v, layer_idx)
    q = linear(p["attn2"]["to_q"], n)
    if ctx_k is ctx_v:
        # fused KV over the (short) text context: one matmul instead of two
        w_kv = jnp.concatenate(
            [p["attn2"]["to_k"]["weight"], p["attn2"]["to_v"]["weight"]],
            axis=0)
        k, v = jnp.split(linear({"weight": w_kv}, ctx_k), 2, axis=-1)
    else:
        k = linear(p["attn2"]["to_k"], ctx_k)
        v = linear(p["attn2"]["to_v"], ctx_v)
    x = x + linear(p["attn2"]["to_out"]["0"], attention(q, k, v, heads))

    # feed-forward (GEGLU)
    n = layer_norm(p["norm3"], x)
    x = x + linear(p["ff"]["net"]["2"], geglu(p["ff"]["net"]["0"], n))
    return x


def spatial_transformer(
    p: dict,
    x: jax.Array,            # (B, H, W, C)
    context: jax.Array,
    heads: int,
    depth: int,
    layer_idx: int,
    hooks: AttnHooks,
    disable_self_attn: bool = False,
) -> Tuple[jax.Array, int]:
    """attention.py SpatialTransformer.forward (linear proj_in variant detection:
    conv 1x1 weights are (O, I, 1, 1); both layouts supported)."""
    b, h, w, c = x.shape
    x_in = x
    n = group_norm(p["norm"], x)
    # HWIO compute views store conv weights under w_hwio (weights.tree_to_hwio)
    use_conv_proj = ("w_hwio" in p["proj_in"]
                     or p["proj_in"]["weight"].ndim == 4)
    if use_conv_proj:
        n = conv2d(p["proj_in"], n)
        n = n.reshape(b, h * w, c)
    else:
        n = n.reshape(b, h * w, c)
        n = linear(p["proj_in"], n)
    for d in range(depth):
        n = basic_transformer_block(
            p["transformer_blocks"][str(d)], n, context, heads, layer_idx, hooks,
            disable_self_attn=disable_self_attn,
        )
    if use_conv_proj:
        n = n.reshape(b, h, w, c)
        n = conv2d(p["proj_out"], n)
    else:
        n = linear(p["proj_out"], n)
        n = n.reshape(b, h, w, c)
    return n + x_in, layer_idx + 1


def downsample(p: dict, x: jax.Array) -> jax.Array:
    return conv2d(p["op"], x, stride=2, padding=1)


def upsample(p: dict, x: jax.Array) -> jax.Array:
    # NOTE perf: a subpixel rewrite (4 folded 2x2 convs at low res, 2.25x
    # fewer MACs) was measured SLOWER inside the fused decoder (+2 ms @512²
    # VAE A/B) — XLA fuses the broadcast upsample into the producer and the
    # conv, while the 4-conv interleave breaks fusion. Keep the naive form.
    return conv2d(p["conv"], upsample_nearest_2x(x), padding=1)


# ---------------------------------------------------------------------------
# UNet


class UNetModel:
    """Functional UNet. ``apply(params, x, timesteps, context, ...)``.

    Params layout mirrors the torch module tree: input_blocks.N.M.*,
    middle_block.M.*, output_blocks.N.M.*, time_embed.*, out.* — exactly the
    checkpoint key structure under ``model.diffusion_model.`` in the reference
    (comfy/model_base.py BaseModel.diffusion_model).
    """

    def __init__(self, config: UNetConfig = SD15_UNET_CONFIG):
        self.config = config

    # --- structure helpers -------------------------------------------------

    def block_plan(self):
        """Static per-block plan: (kind tags for input/middle/output blocks).

        input_blocks[0] = conv_in; then per level: res_blocks_at(level) x
        (res [+ attn]) and a downsample between levels. Output mirrors with
        res_blocks_at(level)+1 blocks per level and upsample at level ends.

        Entry layouts carry the RESOLVED transformer depth per block
        (per-block lists when configured, else the per-level scheme):
          plan_in:  (kind, out_ch, depth, disable_self_attn)
          plan_out: (kind, out_ch, upsample, depth, disable_self_attn)
        """
        cfg = self.config
        ch = cfg.model_channels
        input_chs = [ch]
        plan_in = [("conv", None, 0, False)]
        blk = 0
        for level, mult in enumerate(cfg.channel_mult):
            out_ch = cfg.model_channels * mult
            dis = cfg.self_attn_disabled(level)
            for _ in range(cfg.res_blocks_at(level)):
                if cfg.transformer_depth_blocks is not None:
                    depth = cfg.transformer_depth_blocks[blk]
                else:
                    depth = cfg.depth_at(level) if level in cfg.attention_levels else 0
                blk += 1
                plan_in.append(("res_attn" if depth > 0 else "res", out_ch, depth, dis))
                ch = out_ch
                input_chs.append(ch)
            if level != len(cfg.channel_mult) - 1:
                plan_in.append(("down", ch, 0, False))
                input_chs.append(ch)
        plan_out = []
        blk = 0
        for level in reversed(range(len(cfg.channel_mult))):
            out_ch = cfg.model_channels * cfg.channel_mult[level]
            dis = cfg.self_attn_disabled(level)
            for i in range(cfg.res_blocks_at(level) + 1):
                if cfg.transformer_depth_blocks_out is not None:
                    depth = cfg.transformer_depth_blocks_out[blk]
                else:
                    depth = cfg.depth_at(level) if level in cfg.attention_levels else 0
                blk += 1
                tag = "res_attn" if depth > 0 else "res"
                up = level != 0 and i == cfg.res_blocks_at(level)
                plan_out.append((tag, out_ch, up, depth, dis))
        return plan_in, plan_out, input_chs

    def apply(
        self,
        params: dict,
        x: jax.Array,             # (B, H, W, in_channels) latent
        timesteps: jax.Array,     # (B,) float
        context: jax.Array,       # (B, L, context_dim) text conditioning
        y: Optional[jax.Array] = None,
        control: Optional[dict] = None,  # {'input': [...], 'middle': [...], 'output': [...]}
        hooks: AttnHooks = AttnHooks(),
    ) -> jax.Array:
        cfg = self.config
        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
        emb = linear(params["time_embed"]["0"], t_emb)
        emb = linear(params["time_embed"]["2"], silu(emb))
        if cfg.num_classes is not None and y is not None:
            # class-label embedding table (openaimodel num_classes path —
            # SD_X4Upscaler noise-level conditioning, model_base.py:478)
            emb = emb + params["label_emb"]["weight"][
                jnp.asarray(y, jnp.int32).reshape(-1)
            ].astype(emb.dtype)
        elif cfg.adm_in_channels is not None and y is not None:
            # SDXL label_emb: pooled-conditioning MLP added to the time embedding
            y_emb = linear(params["label_emb"]["0"]["0"], y.astype(x.dtype))
            emb = emb + linear(params["label_emb"]["0"]["2"], silu(y_emb))

        plan_in, plan_out, _ = self.block_plan()
        layer_idx = 0
        hs = []
        h = x
        # T2I-Adapter residuals: per-input-block list (None where no residual),
        # added to h after the block (apply_control(h, control, 'input'),
        # openaimodel.py:891)
        ctrl_in = control.get("input") if control is not None else None
        for i, (kind, _, depth, dis) in enumerate(plan_in):
            p = params["input_blocks"][str(i)]
            if kind == "conv":
                h = conv2d(p["0"], h, padding=1)
            elif kind == "down":
                h = downsample(p["0"], h)
            else:
                h = res_block(p["0"], h, emb)
                if kind == "res_attn":
                    h, layer_idx = spatial_transformer(
                        p["1"], h, context, cfg.heads_for(h.shape[-1]),
                        depth, layer_idx, hooks, disable_self_attn=dis,
                    )
            if ctrl_in is not None and i < len(ctrl_in) and ctrl_in[i] is not None:
                h = h + ctrl_in[i].astype(h.dtype)
            if hooks.in_block is not None:
                h = hooks.in_block(h, i, timesteps)
            hs.append(h)
            if hooks.in_block_after is not None:
                h = hooks.in_block_after(h, i, timesteps)

        md = cfg.middle_depth()
        if md >= -1:
            mp = params["middle_block"]
            h = res_block(mp["0"], h, emb)
            if md >= 0:
                h, layer_idx = spatial_transformer(
                    mp["1"], h, context, cfg.heads_for(h.shape[-1]),
                    md, layer_idx, hooks
                )
                h = res_block(mp["2"], h, emb)
        if control is not None and control.get("middle"):
            h = h + control["middle"][0].astype(h.dtype)

        ctrl_out = list(control.get("output", [])) if control is not None else []
        for i, (kind, _, up, depth, dis) in enumerate(plan_out):
            p = params["output_blocks"][str(i)]
            skip = hs.pop()
            if ctrl_out:
                skip = skip + ctrl_out.pop().astype(h.dtype)
            if hooks.out_block is not None:  # FreeU-style output-block patch
                h, skip = hooks.out_block(h, skip, i)
            h = jnp.concatenate([h, skip], axis=-1)
            h = res_block(p["0"], h, emb)
            if kind == "res_attn":
                h, layer_idx = spatial_transformer(
                    p["1"], h, context, cfg.heads_for(h.shape[-1]),
                    depth, layer_idx, hooks, disable_self_attn=dis,
                )
            if up:
                key = "2" if kind == "res_attn" else "1"
                h = upsample(p[key], h)

        # out.0 is openaimodel normalization() = GroupNorm(32, ch), torch
        # default eps 1e-5 (vs the transformer Normalize's 1e-6)
        h = group_norm(params["out"]["0"], h, eps=1e-5, act="silu")
        h = conv2d(params["out"]["2"], h, padding=1)
        return h

    # --- initialization ----------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        """Random init with the exact param tree/shapes of the checkpoint layout."""
        cfg = self.config
        keys = _KeyGen(key)

        def lin(i, o, zero=False):
            w = jnp.zeros((o, i), dtype) if zero else (
                jax.random.normal(keys(), (o, i), dtype) * (1.0 / jnp.sqrt(i))
            )
            return {"weight": w, "bias": jnp.zeros((o,), dtype)}

        def conv(i, o, k=3, zero=False):
            w = jnp.zeros((o, i, k, k), dtype) if zero else (
                jax.random.normal(keys(), (o, i, k, k), dtype) * (1.0 / jnp.sqrt(i * k * k))
            )
            return {"weight": w, "bias": jnp.zeros((o,), dtype)}

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        def resb(i, o):
            p = {
                "in_layers": {"0": norm(i), "2": conv(i, o)},
                "emb_layers": {"1": lin(cfg.time_embed_dim, o)},
                "out_layers": {"0": norm(o), "3": conv(o, o)},
            }
            if i != o:
                p["skip_connection"] = conv(i, o, k=1)
            return p

        def btb(c, self_ctx=None):
            d_ff = c * 4
            k_in = c if self_ctx is None else self_ctx
            return {
                "norm1": norm(c),
                "norm2": norm(c),
                "norm3": norm(c),
                "attn1": {
                    "to_q": {"weight": lin(c, c)["weight"]},
                    "to_k": {"weight": lin(k_in, c)["weight"]},
                    "to_v": {"weight": lin(k_in, c)["weight"]},
                    "to_out": {"0": lin(c, c)},
                },
                "attn2": {
                    "to_q": {"weight": lin(c, c)["weight"]},
                    "to_k": {"weight": lin(cfg.context_dim, c)["weight"]},
                    "to_v": {"weight": lin(cfg.context_dim, c)["weight"]},
                    "to_out": {"0": lin(c, c)},
                },
                "ff": {"net": {"0": {"proj": lin(c, d_ff * 2)}, "2": lin(d_ff, c)}},
            }

        def st(c, depth, dis=False):
            self_ctx = cfg.context_dim if dis else None
            return {
                "norm": norm(c),
                "proj_in": lin(c, c),
                "transformer_blocks": {str(d): btb(c, self_ctx) for d in range(depth)},
                "proj_out": lin(c, c),
            }

        plan_in, plan_out, input_chs = self.block_plan()
        params: dict = {
            "time_embed": {
                "0": lin(cfg.model_channels, cfg.time_embed_dim),
                "2": lin(cfg.time_embed_dim, cfg.time_embed_dim),
            },
            "input_blocks": {},
            "middle_block": {},
            "output_blocks": {},
            "out": {},
        }
        if cfg.num_classes is not None:
            params["label_emb"] = {
                "weight": jax.random.normal(
                    keys(), (cfg.num_classes, cfg.time_embed_dim), dtype
                )
            }
        elif cfg.adm_in_channels is not None:
            params["label_emb"] = {
                "0": {
                    "0": lin(cfg.adm_in_channels, cfg.time_embed_dim),
                    "2": lin(cfg.time_embed_dim, cfg.time_embed_dim),
                }
            }
        ch = cfg.model_channels
        chs = [ch]
        for i, (kind, out_ch, depth, dis) in enumerate(plan_in):
            if kind == "conv":
                params["input_blocks"][str(i)] = {"0": conv(cfg.in_channels, ch)}
            elif kind == "down":
                params["input_blocks"][str(i)] = {"0": {"op": conv(ch, ch, k=3)}}
            else:
                blk = {"0": resb(ch, out_ch)}
                ch = out_ch
                if kind == "res_attn":
                    blk["1"] = st(ch, depth, dis)
                params["input_blocks"][str(i)] = blk
            chs.append(ch)
        md = cfg.middle_depth()
        if md >= 0:
            params["middle_block"] = {
                "0": resb(ch, ch), "1": st(ch, md), "2": resb(ch, ch)
            }
        elif md == -1:
            params["middle_block"] = {"0": resb(ch, ch)}
        else:
            params.pop("middle_block")
        for i, (kind, out_ch, up, depth, dis) in enumerate(plan_out):
            skip_ch = chs.pop()
            blk = {"0": resb(ch + skip_ch, out_ch)}
            ch = out_ch
            if kind == "res_attn":
                blk["1"] = st(ch, depth, dis)
            if up:
                key_name = "2" if kind == "res_attn" else "1"
                blk[key_name] = {"conv": conv(ch, ch)}
            params["output_blocks"][str(i)] = blk
        params["out"] = {"0": norm(ch), "2": conv(ch, cfg.out_channels)}
        return params

    def num_transformer_layers(self) -> int:
        """Total SpatialTransformer count (16 for SD1.5) — the layer indices
        visible to the Corresponder hooks (the reference's transformer_index
        increments per SpatialTransformer, openaimodel.py)."""
        plan_in, plan_out, _ = self.block_plan()
        down = sum(1 for k in plan_in if k[0] == "res_attn")
        up = sum(1 for k in plan_out if k[0] == "res_attn")
        mid = 1 if self.config.middle_depth() >= 0 else 0
        return down + mid + up


class _KeyGen:
    def __init__(self, key: jax.Array):
        self._key = key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub
