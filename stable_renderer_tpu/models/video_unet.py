"""SVD img2vid temporal UNet — VideoResBlocks + temporal transformers.

Capability match for the reference's SVD model family
(reference: comfy/supported_models.py:257 SVD_img2vid unet_config,
comfy/ldm/modules/diffusionmodules/openaimodel.py:288-370 VideoResBlock,
comfy/ldm/modules/attention.py:729-880 SpatialVideoTransformer + AlphaBlender,
comfy/model_base.py SVD_img2vid extra_conds).

TPU-first design: the frame axis IS the batch axis (B = num_frames), exactly
like the engine's bake batching — so a video denoise is one batched UNet call
whose temporal blocks reduce across the batch:

  * VideoResBlock: the spatial ResBlock output is re-mixed by a temporal
    ResBlock whose 3x3x3 conv runs over (T, H, W) (NDHWC conv3d), blended by a
    learned AlphaBlender (sigmoid(mix_factor)).
  * SpatialVideoTransformer: after each spatial BasicTransformerBlock, tokens
    are transposed to (B*S, T, C) and run through a temporal transformer block
    (with ff_in) against the per-pixel broadcast context, then alpha-blended.

Param trees mirror the SVD checkpoint layout verbatim (time_stack.*,
time_pos_embed.*, time_mixer.mix_factor), so `model.diffusion_model.*` keys of
an SVD checkpoint re-nest directly (weights.py detection keys on time_stack).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import (
    conv2d,
    geglu,
    group_norm,
    layer_norm,
    linear,
    silu,
    timestep_embedding,
)
from stable_renderer_tpu.models.unet import (
    AttnHooks,
    UNetConfig,
    UNetModel,
    basic_transformer_block,
    downsample,
    res_block,
    upsample,
)


@dataclass(frozen=True)
class VideoUNetConfig(UNetConfig):
    """UNetConfig + the SVD temporal knobs (supported_models.py:257)."""

    video_kernel_size: int = 3
    max_time_embed_period: int = 10000


SVD_UNET_CONFIG = VideoUNetConfig(
    in_channels=8,            # 4 latent + 4 c_concat (encoded init image)
    model_channels=320,
    channel_mult=(1, 2, 4, 4),
    attention_levels=(0, 1, 2),
    transformer_depth=1,
    head_dim=64,
    context_dim=1024,         # CLIP-vision embed context
    adm_in_channels=768,      # fps + motion-bucket + augmentation embeddings
)

TINY_VIDEO_UNET_CONFIG = VideoUNetConfig(
    in_channels=8,
    model_channels=32,
    num_res_blocks=1,
    channel_mult=(1, 2),
    attention_levels=(0, 1),
    num_heads=2,
    context_dim=32,       # == TINY_VISION_CONFIG.projection_dim (as SVD's
    # context_dim 1024 == ViT-H projection_dim)
    adm_in_channels=768,  # real SVD ADM width: svd_adm_vector plugs in directly
)


def alpha_blend(p: dict, spatial: jax.Array, temporal: jax.Array) -> jax.Array:
    """AlphaBlender (learned): x = a * spatial + (1-a) * temporal with
    a = sigmoid(mix_factor) (attention.py AlphaBlender.get_alpha)."""
    a = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)).astype(spatial.dtype)
    return spatial * a + temporal * (1.0 - a)


def conv3d_video(p: dict, x: jax.Array, kernel: int) -> jax.Array:
    """torch Conv3d over (T, H, W) on NDHWC activations; weight
    (O, I, kT, kH, kW) as in the checkpoint."""
    w = p["weight"].astype(x.dtype)
    pad = kernel // 2
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1),
        [(pad, pad), (pad, pad), (pad, pad)],
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
    )
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def temporal_res_block(p: dict, x: jax.Array, emb: jax.Array,
                       kernel: int) -> jax.Array:
    """The time_stack ResBlock (dims=3, exchange_temb_dims): x is
    (nb, T, H, W, C); emb is (nb, T, emb_dim) added per frame."""
    h = group_norm(p["in_layers"]["0"], x)
    h = conv3d_video(p["in_layers"]["2"], silu(h), kernel)
    emb_out = linear(p["emb_layers"]["1"], silu(emb))  # (nb, T, C)
    h = h + emb_out[:, :, None, None, :].astype(h.dtype)
    h = group_norm(p["out_layers"]["0"], h)
    h = conv3d_video(p["out_layers"]["3"], silu(h), kernel)
    return x + h


def video_res_block(p: dict, x: jax.Array, emb: jax.Array,
                    kernel: int, num_frames: int) -> jax.Array:
    """VideoResBlock (openaimodel.py:288-370): spatial ResBlock, then a
    temporal 3D ResBlock over the frame axis, alpha-blended.

    x: (nb*T, H, W, C) — frames ride the batch axis; CFG batching stacks
    cond/uncond groups of T frames (the reference's rearrange '(b t) c h w')."""
    x = res_block(p, x, emb)
    nb = x.shape[0] // num_frames
    x5 = x.reshape(nb, num_frames, *x.shape[1:])  # (nb, T, H, W, C) NDHWC
    emb5 = emb.reshape(nb, num_frames, emb.shape[-1])
    mixed = temporal_res_block(p["time_stack"], x5, emb5, kernel)
    return alpha_blend(p["time_mixer"], x5, mixed).reshape(x.shape)


def temporal_transformer_block(p: dict, x: jax.Array, context: jax.Array,
                               heads: int) -> jax.Array:
    """time_stack BasicTransformerBlock with ff_in (attention.py:777-796):
    norm_in+ff_in residual, temporal self-attn, cross-attn, ff."""
    from stable_renderer_tpu.models.layers import attention

    n = layer_norm(p["norm_in"], x)
    x = x + linear(p["ff_in"]["net"]["2"], geglu(p["ff_in"]["net"]["0"], n))
    n = layer_norm(p["norm1"], x)
    q = linear(p["attn1"]["to_q"], n)
    k = linear(p["attn1"]["to_k"], n)
    v = linear(p["attn1"]["to_v"], n)
    x = x + linear(p["attn1"]["to_out"]["0"], attention(q, k, v, heads))
    if "attn2" in p:
        n = layer_norm(p["norm2"], x)
        q = linear(p["attn2"]["to_q"], n)
        k = linear(p["attn2"]["to_k"], context)
        v = linear(p["attn2"]["to_v"], context)
        x = x + linear(p["attn2"]["to_out"]["0"], attention(q, k, v, heads))
    n = layer_norm(p["norm3"], x)
    return x + linear(p["ff"]["net"]["2"], geglu(p["ff"]["net"]["0"], n))


def spatial_video_transformer(
    p: dict,
    x: jax.Array,           # (nb*T, H, W, C)
    context: jax.Array,     # (nb*T, Lc, context_dim)
    heads: int,
    depth: int,
    layer_idx: int,
    hooks: AttnHooks,
    max_period: int,
    num_frames: int,
) -> Tuple[jax.Array, int]:
    """SpatialVideoTransformer.forward (attention.py:812-880): spatial blocks
    interleaved with temporal mix blocks over the frame axis."""
    b, h, w, c = x.shape
    nb = b // num_frames
    s = h * w
    x_in = x
    n = group_norm(p["norm"], x)
    n = n.reshape(b, s, c)
    n = linear(p["proj_in"], n)  # SVD uses use_linear_in_transformer

    # temporal positional embedding over the frame index
    frame_idx = jnp.arange(num_frames, dtype=jnp.float32)
    t_emb = timestep_embedding(frame_idx, c, max_period=max_period).astype(n.dtype)
    emb = linear(p["time_pos_embed"]["2"],
                 silu(linear(p["time_pos_embed"]["0"], t_emb)))  # (T, C)
    emb = jnp.tile(emb, (nb, 1))  # (nb*T, C)

    # time context: each group's first frame's context, broadcast per pixel
    # (use_spatial_context: time_context_first_timestep repeated h*w rows)
    time_ctx = context[::num_frames]                      # (nb, Lc, D)
    time_ctx = jnp.broadcast_to(
        time_ctx[:, None], (nb, s, *time_ctx.shape[1:])
    ).reshape(nb * s, *time_ctx.shape[1:])

    for d in range(depth):
        n = basic_transformer_block(
            p["transformer_blocks"][str(d)], n, context, heads, layer_idx, hooks
        )
        x_mix = n + emb[:, None, :]
        # (nb*T, S, C) -> (nb*S, T, C): attend over frames per pixel
        x_mix = x_mix.reshape(nb, num_frames, s, c).transpose(0, 2, 1, 3)
        x_mix = x_mix.reshape(nb * s, num_frames, c)
        x_mix = temporal_transformer_block(
            p["time_stack"][str(d)], x_mix, time_ctx, heads)
        x_mix = x_mix.reshape(nb, s, num_frames, c).transpose(0, 2, 1, 3)
        x_mix = x_mix.reshape(nb * num_frames, s, c)
        n = alpha_blend(p["time_mixer"], n, x_mix)
    n = linear(p["proj_out"], n)
    return n.reshape(b, h, w, c) + x_in, layer_idx + 1


class VideoUNetModel(UNetModel):
    """SVD temporal UNet: frames ride the batch axis; every res block and
    transformer gains a temporal stage. ``apply(params, x, timesteps, context,
    y)`` where x is (T, H, W, in_channels)."""

    def __init__(self, config: VideoUNetConfig = SVD_UNET_CONFIG,
                 num_frames: Optional[int] = None):
        """``num_frames=None`` treats the whole batch as one frame sequence;
        CFG batching sets it to T so a 2T batch splits into [cond, uncond]
        groups (the reference's num_video_frames plumb,
        model_base.py SVD_img2vid / samplers.py calc_cond_uncond_batch)."""
        super().__init__(config)
        self.num_frames = num_frames

    def apply(
        self,
        params: dict,
        x: jax.Array,
        timesteps: jax.Array,
        context: jax.Array,
        y: Optional[jax.Array] = None,
        control: Optional[dict] = None,
        hooks: AttnHooks = AttnHooks(),
    ) -> jax.Array:
        cfg = self.config
        t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
        emb = linear(params["time_embed"]["0"], t_emb)
        emb = linear(params["time_embed"]["2"], silu(emb))
        if cfg.adm_in_channels is not None and y is not None:
            y_emb = linear(params["label_emb"]["0"]["0"], y.astype(x.dtype))
            emb = emb + linear(params["label_emb"]["0"]["2"], silu(y_emb))

        plan_in, plan_out, _ = self.block_plan()
        layer_idx = 0
        hs = []
        h = x
        kernel = cfg.video_kernel_size
        nf = self.num_frames or x.shape[0]
        ctrl_in = control.get("input") if control is not None else None
        for i, (kind, _, depth, _dis) in enumerate(plan_in):
            p = params["input_blocks"][str(i)]
            if kind == "conv":
                h = conv2d(p["0"], h, padding=1)
            elif kind == "down":
                h = downsample(p["0"], h)
            else:
                h = video_res_block(p["0"], h, emb, kernel, nf)
                if kind == "res_attn":
                    h, layer_idx = spatial_video_transformer(
                        p["1"], h, context, cfg.heads_for(h.shape[-1]),
                        depth, layer_idx, hooks,
                        cfg.max_time_embed_period, nf,
                    )
            if ctrl_in is not None and i < len(ctrl_in) and ctrl_in[i] is not None:
                h = h + ctrl_in[i].astype(h.dtype)
            hs.append(h)

        mp = params["middle_block"]
        h = video_res_block(mp["0"], h, emb, kernel, nf)
        h, layer_idx = spatial_video_transformer(
            mp["1"], h, context, cfg.heads_for(h.shape[-1]),
            max(cfg.middle_depth(), 1), layer_idx, hooks,
            cfg.max_time_embed_period, nf,
        )
        h = video_res_block(mp["2"], h, emb, kernel, nf)
        if control is not None and control.get("middle"):
            h = h + control["middle"][0].astype(h.dtype)

        ctrl_out = list(control.get("output", [])) if control is not None else []
        for i, (kind, _, up, depth, _dis) in enumerate(plan_out):
            p = params["output_blocks"][str(i)]
            skip = hs.pop()
            if ctrl_out:
                skip = skip + ctrl_out.pop().astype(h.dtype)
            if hooks.out_block is not None:
                h, skip = hooks.out_block(h, skip, i)
            h = jnp.concatenate([h, skip], axis=-1)
            h = video_res_block(p["0"], h, emb, kernel, nf)
            if kind == "res_attn":
                h, layer_idx = spatial_video_transformer(
                    p["1"], h, context, cfg.heads_for(h.shape[-1]),
                    depth, layer_idx, hooks,
                    cfg.max_time_embed_period, nf,
                )
            if up:
                key = "2" if kind == "res_attn" else "1"
                h = upsample(p[key], h)

        h = group_norm(params["out"]["0"], h)
        h = conv2d(params["out"]["2"], silu(h), padding=1)
        return h

    # --- init (checkpoint-layout param tree) -------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        """Base UNet tree + the SVD temporal parameters (time_stack /
        time_pos_embed / time_mixer) grafted onto every res/attn block."""
        cfg = self.config
        params = super().init(key, dtype=dtype)
        kg = _KeyGen(jax.random.fold_in(key, 17))

        def lin(i, o):
            w = jax.random.normal(kg(), (o, i), dtype) * (1.0 / jnp.sqrt(i))
            return {"weight": w, "bias": jnp.zeros((o,), dtype)}

        def conv3(i, o, k):
            w = jax.random.normal(kg(), (o, i, k, k, k), dtype) * (
                1.0 / jnp.sqrt(i * k * k * k))
            return {"weight": w, "bias": jnp.zeros((o,), dtype)}

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        k = cfg.video_kernel_size

        def time_res(c):
            return {
                "in_layers": {"0": norm(c), "2": conv3(c, c, k)},
                "emb_layers": {"1": lin(cfg.time_embed_dim, c)},
                "out_layers": {"0": norm(c), "3": conv3(c, c, k)},
            }

        def time_btb(c):
            d_ff = c * 4
            btb = {
                "norm_in": norm(c),
                "ff_in": {"net": {"0": {"proj": lin(c, d_ff * 2)}, "2": lin(d_ff, c)}},
                "norm1": norm(c),
                "norm2": norm(c),
                "norm3": norm(c),
                "attn1": {
                    "to_q": {"weight": lin(c, c)["weight"]},
                    "to_k": {"weight": lin(c, c)["weight"]},
                    "to_v": {"weight": lin(c, c)["weight"]},
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
            return btb

        mix = lambda: {"mix_factor": jnp.zeros((1,), dtype)}  # noqa: E731

        def graft_res(block: dict) -> None:
            c = block["out_layers"]["0"]["weight"].shape[0]
            block["time_stack"] = time_res(c)
            block["time_mixer"] = mix()

        def graft_st(block: dict) -> None:
            c = block["norm"]["weight"].shape[0]
            depth = len(block["transformer_blocks"])
            block["time_stack"] = {str(d): time_btb(c) for d in range(depth)}
            block["time_pos_embed"] = {"0": lin(c, c * 4), "2": lin(c * 4, c)}
            block["time_mixer"] = mix()

        for group in ("input_blocks", "output_blocks"):
            for blk in params[group].values():
                if "0" in blk and "in_layers" in blk.get("0", {}):
                    graft_res(blk["0"])
                if "1" in blk and "transformer_blocks" in blk.get("1", {}):
                    graft_st(blk["1"])
        graft_res(params["middle_block"]["0"])
        graft_st(params["middle_block"]["1"])
        graft_res(params["middle_block"]["2"])
        return params


class _KeyGen:
    def __init__(self, key: jax.Array):
        self._key = key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub


def svd_adm_vector(fps_id: float, motion_bucket_id: float,
                   augmentation_level: float, n: int = 1) -> jax.Array:
    """The SVD ADM conditioning: concat of three 256-wide Timestep embeddings
    of (fps_id, motion_bucket_id, augmentation) (model_base.py SVD_img2vid
    encode_adm)."""
    parts = [
        timestep_embedding(jnp.asarray([fps_id], jnp.float32), 256),
        timestep_embedding(jnp.asarray([motion_bucket_id], jnp.float32), 256),
        timestep_embedding(jnp.asarray([augmentation_level], jnp.float32), 256),
    ]
    y = jnp.concatenate(parts, axis=-1)  # (1, 768)
    return jnp.broadcast_to(y, (n, y.shape[-1]))
