"""T2I-Adapter — lightweight hint towers feeding input-block residuals.

Capability match for the reference's T2IAdapter path
(reference: comfy/controlnet.py:487-560 T2IAdapter/load_t2i_adapter,
comfy/t2i_adapter/adapter.py Adapter/Adapter_light). Unlike ControlNet, the
adapter sees only the hint image (no latent/timestep), so its features are
loop-invariant: inside the jitted denoise scan XLA hoists the tower out of the
loop — the TPU equivalent of the reference computing ``control_input`` once and
caching it (controlnet.py:524-528).

Residual placement matches apply_control(h, control, 'input')
(openaimodel.py:891): feature i is added after UNet input block i; the stage
outputs land after blocks 2/5/8/11 for SD1.x (channels 320/640/1280/1280 at
64/32/16/8 from a 512 hint through PixelUnshuffle(8) + three downsamples).

Param tree mirrors the checkpoint names (conv_in, body.N.{in_conv,block1,
block2,skep,down_opt.op}) so loading is pure re-nesting.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d


@dataclass(frozen=True)
class T2IAdapterConfig:
    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    nums_rb: int = 2
    cin: int = 192              # 64 * 3 (PixelUnshuffle(8) of RGB)
    ksize: int = 1
    sk: bool = True
    use_conv: bool = False
    xl: bool = False
    light: bool = False

    @property
    def unshuffle(self) -> int:
        return 16 if self.xl else 8

    @property
    def input_channels(self) -> int:
        return self.cin // (self.unshuffle * self.unshuffle)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC PixelUnshuffle: (B, H, W, C) -> (B, H/r, W/r, C*r*r).

    Channel order matches torch.nn.PixelUnshuffle on NCHW: out channel index
    = c * r * r + dy * r + dx."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/r, W/r, C, r, r)
    return x.reshape(b, h // r, w // r, c * r * r)


def _kw(p: dict) -> int:
    """Conv kernel width from either layout (OIHW weight / HWIO w_hwio)."""
    if "weight" in p:
        return p["weight"].shape[-1]
    return p["w_hwio"].shape[1]


class T2IAdapter:
    def __init__(self, config: T2IAdapterConfig = T2IAdapterConfig()):
        self.config = config

    # --- blocks ---------------------------------------------------------------

    def _resnet(self, p: dict, x: jax.Array, down: bool) -> jax.Array:
        cfg = self.config
        if down:
            if cfg.use_conv:
                x = conv2d(p["down_opt"]["op"], x, stride=2, padding=1)
            else:
                x = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                ) / 4.0
        if "in_conv" in p:
            x = conv2d(p["in_conv"], x, padding=_kw(p["in_conv"]) // 2)
        h = conv2d(p["block1"], x, padding=1)
        h = jax.nn.relu(h)
        h = conv2d(p["block2"], h, padding=_kw(p["block2"]) // 2)
        if "skep" in p:
            return h + conv2d(p["skep"], x, padding=_kw(p["skep"]) // 2)
        return h + x

    def _extractor(self, p: dict, x: jax.Array, down: bool) -> jax.Array:
        # Adapter_light stage: avg-pool down -> 1x1 in -> nums_rb light resnets -> 1x1 out
        if down:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        x = conv2d(p["in_conv"], x)
        for j in range(self.config.nums_rb):
            b = p["body"][str(j)]
            h = conv2d(b["block1"], x, padding=1)
            h = jax.nn.relu(h)
            h = conv2d(b["block2"], h, padding=1)
            x = x + h
        return conv2d(p["out_conv"], x)

    # --- forward ----------------------------------------------------------------

    def features(self, params: dict, hint: jax.Array) -> List[Optional[jax.Array]]:
        """hint (B, H, W, C) in [0,1] -> per-UNet-input-block residual list."""
        cfg = self.config
        if cfg.input_channels == 1 and hint.shape[-1] > 1:
            hint = jnp.mean(hint, axis=-1, keepdims=True)
        else:
            hint = hint[..., : cfg.input_channels]
        x = pixel_unshuffle(hint, cfg.unshuffle)
        feats: List[Optional[jax.Array]] = []
        if cfg.light:
            for i in range(len(cfg.channels)):
                x = self._extractor(params["body"][str(i)], x, down=i != 0)
                feats += [None, None, x]
            return feats
        x = conv2d(params["conv_in"], x, padding=1)
        if cfg.xl:
            down_stages = (2,)
            no_down_first = (1,)
        else:
            down_stages = (1, 2, 3)
            no_down_first = ()
        idx = 0
        for i in range(len(cfg.channels)):
            for j in range(cfg.nums_rb):
                down = i in down_stages and j == 0
                x = self._resnet(params["body"][str(idx)], x, down)
                idx += 1
            if cfg.xl:
                feats.append(None)
                if i == 0:
                    feats += [None, None]
                if i == 2:
                    feats.append(None)
            else:
                feats += [None, None]
            feats.append(x)
        return feats

    def apply(
        self,
        params: dict,
        x: jax.Array,          # (B, h, w, 4) scaled latent input (batched like UNet x)
        hint: jax.Array,       # (B, H, W, C) control image in [0, 1]
        timesteps: jax.Array,  # (B,)
        context: jax.Array,    # unused (signature-compatible with ControlNet.apply)
        strength: float = 1.0,
        percent_range: Tuple[float, float] = (0.0, 1.0),
        total_timesteps: int = 1000,
    ) -> dict:
        del context
        feats = self.features(params, hint.astype(x.dtype))
        pct = 1.0 - timesteps[0] / (total_timesteps - 1)
        on = jnp.logical_and(pct >= percent_range[0], pct <= percent_range[1] + 1e-6)
        gate = jnp.where(on, strength, 0.0).astype(x.dtype)
        return {"input": [None if f is None else f * gate for f in feats]}

    # --- init (tests) -----------------------------------------------------------

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        from stable_renderer_tpu.models.unet import _KeyGen

        keys = _KeyGen(key)

        def conv(i, o, k):
            return {
                "weight": jax.random.normal(keys(), (o, i, k, k), dtype) * 0.02,
                "bias": jnp.zeros((o,), dtype),
            }

        if cfg.light:
            body = {}
            prev = cfg.cin
            for i, ch in enumerate(cfg.channels):
                body[str(i)] = {
                    "in_conv": conv(prev, ch // 4, 1),
                    "body": {
                        str(j): {"block1": conv(ch // 4, ch // 4, 3), "block2": conv(ch // 4, ch // 4, 3)}
                        for j in range(cfg.nums_rb)
                    },
                    "out_conv": conv(ch // 4, ch, 1),
                }
                prev = ch
            return {"body": body}
        body = {}
        idx = 0
        down_stages = (2,) if cfg.xl else (1, 2, 3)
        for i, ch in enumerate(cfg.channels):
            for j in range(cfg.nums_rb):
                in_c = cfg.channels[i - 1] if (j == 0 and i > 0) else ch
                p: dict = {
                    "block1": conv(ch, ch, 3),
                    "block2": conv(ch, ch, cfg.ksize),
                }
                if in_c != ch or not cfg.sk:
                    p["in_conv"] = conv(in_c, ch, cfg.ksize)
                if not cfg.sk:
                    p["skep"] = conv(in_c, ch, cfg.ksize)
                if i in down_stages and j == 0 and cfg.use_conv:
                    p["down_opt"] = {"op": conv(in_c, in_c, 3)}
                body[str(idx)] = p
                idx += 1
        return {"conv_in": conv(cfg.cin, cfg.channels[0], 3), "body": body}


def load_t2i_adapter(flat: Dict[str, np.ndarray]) -> Tuple[T2IAdapter, dict]:
    """Reference-format t2i adapter state dict -> (T2IAdapter, params).

    Config detection mirrors comfy load_t2i_adapter (controlnet.py:541-560):
    Adapter_light when body.0.in_conv present without conv_in; full Adapter keyed
    off conv_in with ksize from body.0.block2, xl when cin is 256/768."""
    from stable_renderer_tpu.models.weights import nest

    if any(k.startswith("adapter.") for k in flat):
        # diffusers layout: adapter.body.i.resnets.j.* -> body.{i*2+j}.*
        remapped = {}
        for k, v in flat.items():
            parts = k.split(".")
            if k.startswith("adapter.body.") and "resnets" in parts:
                i, j = int(parts[2]), int(parts[4])
                remapped["body.%d.%s" % (i * 2 + j, ".".join(parts[5:]))] = v
            elif k.startswith("adapter.body."):
                i = int(parts[2])
                remapped["body.%d.%s" % (i * 2, ".".join(parts[3:]))] = v
            elif k.startswith("adapter."):
                remapped[k[len("adapter."):]] = v
        flat = remapped
    if "body.0.in_conv.weight" in flat and "conv_in.weight" not in flat:
        cin = flat["body.0.in_conv.weight"].shape[1]
        cfg = T2IAdapterConfig(cin=cin, light=True, nums_rb=4)
        # light layout: body.{stage} holds in_conv/out_conv + body.{j} resnets
        params: dict = {"body": {}}
        n_stage = len(cfg.channels)
        nested = nest(flat, "")
        for i in range(n_stage):
            stage = nested["body"][str(i)]
            params["body"][str(i)] = stage
        return T2IAdapter(cfg), params
    if "conv_in.weight" not in flat:
        raise ValueError("not a t2i adapter state dict")
    cin = flat["conv_in.weight"].shape[1]
    channel = flat["conv_in.weight"].shape[0]
    ksize = flat["body.0.block2.weight"].shape[2]
    use_conv = any(k.endswith("down_opt.op.weight") for k in flat)
    xl = cin in (256, 768)
    cfg = T2IAdapterConfig(
        channels=(channel, channel * 2, channel * 4, channel * 4),
        nums_rb=2, cin=cin, ksize=ksize, sk=True, use_conv=use_conv, xl=xl,
    )
    return T2IAdapter(cfg), nest(flat, "")


# ---------------------------------------------------------------------------
# StyleAdapter (T2I style transfer)


@dataclass
class StyleAdapterConfig:
    """reference comfy/t2i_adapter/adapter.py:199-212 StyleAdapter defaults
    (the released t2iadapter_style checkpoint: ViT-L vision width 1024,
    SD1 context 768, 3 residual attention layers, 8 style tokens)."""

    width: int = 1024
    context_dim: int = 768
    num_head: int = 8
    n_layers: int = 3
    num_token: int = 4


class StyleAdapter:
    """CLIP-style transformer mapping CLIP-vision tokens to ``num_token``
    style context tokens appended to the text conditioning
    (reference adapter.py:199-233 StyleAdapter.forward; wrapped as
    comfy/sd.py:383 StyleModel.get_cond, applied by nodes.py StyleModelApply).

    Input x is the vision tower's last_hidden_state (B, 1+P, width); the
    learned style tokens attend over it through ``n_layers`` pre-LN residual
    attention blocks (QuickGELU MLP, packed qkv in_proj), then the last
    ``num_token`` rows are layer-normed and projected to the text context
    dim."""

    def __init__(self, config: StyleAdapterConfig = StyleAdapterConfig()):
        self.config = config

    def _block(self, p: dict, x: jax.Array) -> jax.Array:
        from stable_renderer_tpu.models.layers import attention, layer_norm, linear

        cfg = self.config
        n = layer_norm(p["ln_1"], x)
        w = p["attn"]["in_proj_weight"].astype(x.dtype)
        b = p["attn"]["in_proj_bias"].astype(x.dtype)
        qkv = n @ w.T + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = attention(q, k, v, cfg.num_head)
        x = x + linear(p["attn"]["out_proj"], a)
        n = layer_norm(p["ln_2"], x)
        h = linear(p["mlp"]["c_fc"], n)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        return x + linear(p["mlp"]["c_proj"], h)

    def apply(self, params: dict, x: jax.Array) -> jax.Array:
        from stable_renderer_tpu.models.layers import layer_norm

        cfg = self.config
        style = params["style_embedding"].astype(x.dtype)
        style = jnp.broadcast_to(style, (x.shape[0], cfg.num_token, cfg.width))
        x = jnp.concatenate([x, style], axis=1)
        x = layer_norm(params["ln_pre"], x)
        for i in range(cfg.n_layers):
            x = self._block(params["layers"][str(i)], x)
        x = layer_norm(params["ln_post"], x[:, -cfg.num_token:, :])
        return x @ params["proj"].astype(x.dtype)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        ks = jax.random.split(key, cfg.n_layers + 2)

        def lin(k, i, o):
            return {"weight": jax.random.normal(k, (o, i), dtype) * 0.02,
                    "bias": jnp.zeros((o,), dtype)}

        def ln():
            return {"weight": jnp.ones((cfg.width,), dtype),
                    "bias": jnp.zeros((cfg.width,), dtype)}

        layers = {}
        for i in range(cfg.n_layers):
            sub = jax.random.split(ks[i], 4)
            layers[str(i)] = {
                "ln_1": ln(), "ln_2": ln(),
                "attn": {
                    "in_proj_weight": jax.random.normal(
                        sub[0], (3 * cfg.width, cfg.width), dtype) * 0.02,
                    "in_proj_bias": jnp.zeros((3 * cfg.width,), dtype),
                    "out_proj": lin(sub[1], cfg.width, cfg.width),
                },
                "mlp": {"c_fc": lin(sub[2], cfg.width, cfg.width * 4),
                        "c_proj": lin(sub[3], cfg.width * 4, cfg.width)},
            }
        return {
            "style_embedding": jax.random.normal(
                ks[-2], (1, cfg.num_token, cfg.width), dtype) * cfg.width**-0.5,
            "ln_pre": ln(), "ln_post": ln(),
            "proj": jax.random.normal(
                ks[-1], (cfg.width, cfg.context_dim), dtype) * cfg.width**-0.5,
            "layers": layers,
        }


def load_style_model(flat: Dict[str, np.ndarray]) -> Tuple[StyleAdapter, dict]:
    """Reference style-adapter state dict -> (StyleAdapter, params). Accepts
    both the upstream checkpoint's misspelled ``transformer_layes.*`` keys and
    the corrected ``transformer_layers.*`` (adapter.py:216-219)."""
    from stable_renderer_tpu.models.weights import nest

    if "style_embedding" not in flat:
        raise ValueError("not a style adapter state dict")
    width = flat["style_embedding"].shape[-1]
    num_token = flat["style_embedding"].shape[1]
    context_dim = flat["proj"].shape[-1]
    layer_prefix = ("transformer_layes" if any(
        k.startswith("transformer_layes.") for k in flat) else "transformer_layers")
    n_layers = 1 + max(int(k.split(".")[1]) for k in flat
                       if k.startswith(layer_prefix + "."))
    heads = 8 if width % 8 == 0 else 1
    cfg = StyleAdapterConfig(width=width, context_dim=context_dim,
                             num_head=heads, n_layers=n_layers,
                             num_token=num_token)
    nested = nest(flat, "")
    params = {
        "style_embedding": nested["style_embedding"],
        "ln_pre": nested["ln_pre"], "ln_post": nested["ln_post"],
        "proj": nested["proj"],
        "layers": nested[layer_prefix],
    }
    return StyleAdapter(cfg), params
