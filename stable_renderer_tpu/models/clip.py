"""CLIP text encoder (SD1.5's conditioner) + tokenizer.

Capability match for the reference's CLIP stack
(reference: comfy/sd.py:106-190 CLIP.tokenize/encode_from_tokens,
comfy/sd1_clip.py SDClipModel/SDTokenizer). Param tree mirrors the transformers
CLIPTextModel layout used by the checkpoints
(``cond_stage_model.transformer.text_model.*``).

Tokenizer: the BPE merges/vocab of openai/clip-vit-large-patch14. If the
transformers cache (or an explicit vocab path) is available we use the real
CLIPTokenizer; otherwise a deterministic hash fallback keeps the pipeline runnable
for shape-level work (documented — real text conditioning needs the vocab files,
which the reference also ships with its checkpoints).

clip_skip semantics match comfy CLIPTextEncode: ``clip_layer(-1)`` = final hidden
state, ``-2`` = penultimate, with the final LayerNorm applied after truncation
(sd1_clip.py layer="hidden" + layer_norm_hidden_state=True).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import attention, gelu_quick, layer_norm, linear
from stable_renderer_tpu.utils.log import get_logger

logger = get_logger("sr_tpu.clip")


@dataclass(frozen=True)
class CLIPConfig:
    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    bos_token: int = 49406
    eos_token: int = 49407


SD15_CLIP_CONFIG = CLIPConfig()
TINY_CLIP_CONFIG = CLIPConfig(
    vocab_size=1000, hidden_size=64, num_layers=2, num_heads=2, intermediate_size=128
)


class CLIPTextModel:
    def __init__(self, config: CLIPConfig = SD15_CLIP_CONFIG):
        self.config = config

    def apply(
        self,
        params: dict,
        tokens: jax.Array,  # (B, 77) int32; negative ids index custom_embeds
        clip_skip: int = -1,
        final_norm: bool = True,
        custom_embeds: Optional[jax.Array] = None,  # (K, hidden) textual inversion
    ) -> jax.Array:
        """tokens -> (B, 77, hidden) conditioning.

        Textual-inversion vectors ride in as negative token ids -(k+1) indexing
        ``custom_embeds`` (jit-friendly set_up_textual_embeddings,
        sd1_clip.py:125-162)."""
        cfg = self.config
        tm = params["text_model"]
        vocab = tm["embeddings"]["token_embedding"]["weight"]
        x = vocab[jnp.maximum(tokens, 0)]
        if custom_embeds is not None:
            cidx = jnp.maximum(-tokens - 1, 0)
            x = jnp.where((tokens < 0)[..., None], custom_embeds[cidx].astype(x.dtype), x)
        pos = tm["embeddings"]["position_embedding"]["weight"][: tokens.shape[1]]
        x = x + pos[None]

        # causal mask (CLIP text is causal)
        l = tokens.shape[1]
        causal = jnp.where(
            jnp.arange(l)[None, :] <= jnp.arange(l)[:, None], 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None]

        n_layers = cfg.num_layers if clip_skip == -1 else cfg.num_layers + 1 + clip_skip
        for i in range(n_layers):
            lp = tm["encoder"]["layers"][str(i)]
            h = layer_norm(lp["layer_norm1"], x)
            q = linear(lp["self_attn"]["q_proj"], h)
            k = linear(lp["self_attn"]["k_proj"], h)
            v = linear(lp["self_attn"]["v_proj"], h)
            h = attention(q, k, v, cfg.num_heads, mask=causal)
            x = x + linear(lp["self_attn"]["out_proj"], h)
            h = layer_norm(lp["layer_norm2"], x)
            h = linear(lp["mlp"]["fc1"], h)
            h = gelu_quick(h)
            x = x + linear(lp["mlp"]["fc2"], h)

        if not final_norm:
            # SDXL uses the raw penultimate hidden state for clip_l
            # (sdxl_clip.py layer_norm_hidden_state=False)
            return x
        return layer_norm(tm["final_layer_norm"], x)

    def pooled(self, params: dict, tokens: jax.Array, hidden: jax.Array) -> jax.Array:
        """EOS-token pooled embedding (used by SDXL; provided for parity)."""
        eos_pos = jnp.argmax((tokens == self.config.eos_token).astype(jnp.int32), axis=1)
        return hidden[jnp.arange(tokens.shape[0]), eos_pos]

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        from stable_renderer_tpu.models.unet import _KeyGen

        keys = _KeyGen(key)

        def lin(i, o):
            return {
                "weight": jax.random.normal(keys(), (o, i), dtype) * 0.02,
                "bias": jnp.zeros((o,), dtype),
            }

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        h = cfg.hidden_size
        layers = {
            str(i): {
                "layer_norm1": norm(h),
                "layer_norm2": norm(h),
                "self_attn": {
                    "q_proj": lin(h, h),
                    "k_proj": lin(h, h),
                    "v_proj": lin(h, h),
                    "out_proj": lin(h, h),
                },
                "mlp": {"fc1": lin(h, cfg.intermediate_size), "fc2": lin(cfg.intermediate_size, h)},
            }
            for i in range(cfg.num_layers)
        }
        return {
            "text_model": {
                "embeddings": {
                    "token_embedding": {
                        "weight": jax.random.normal(keys(), (cfg.vocab_size, h), dtype) * 0.02
                    },
                    "position_embedding": {
                        "weight": jax.random.normal(keys(), (cfg.max_length, h), dtype) * 0.02
                    },
                },
                "encoder": {"layers": layers},
                "final_layer_norm": norm(h),
            }
        }


@dataclass(frozen=True)
class OpenCLIPConfig:
    """OpenCLIP text tower (SDXL's second encoder, ViT-bigG)."""

    vocab_size: int = 49408
    max_length: int = 77
    width: int = 1280
    num_layers: int = 32
    num_heads: int = 20
    mlp_ratio: int = 4
    projection_dim: int = 1280


SDXL_CLIP_G_CONFIG = OpenCLIPConfig()
TINY_CLIP_G_CONFIG = OpenCLIPConfig(vocab_size=1000, width=64, num_layers=2, num_heads=2, projection_dim=32)


class OpenCLIPTextModel:
    """OpenCLIP text transformer in the SDXL checkpoint layout
    (``conditioner.embedders.1.model.*``: token_embedding, positional_embedding,
    transformer.resblocks.N.{ln_1,attn.in_proj_*,attn.out_proj,ln_2,mlp.c_fc,
    mlp.c_proj}, ln_final, text_projection). GELU (not quick-gelu); combined
    qkv in_proj split at apply time (comfy sdxl_clip.py semantics)."""

    def __init__(self, config: OpenCLIPConfig = SDXL_CLIP_G_CONFIG):
        self.config = config

    def apply(self, params: dict, tokens: jax.Array, clip_skip: int = -2):
        """tokens -> (hidden (B, L, width) at layer clip_skip, pooled (B, proj))."""
        import jax.numpy as jnp

        cfg = self.config
        m = params["model"] if "model" in params else params
        # negative ids mark textual-inversion slots of the L tower; the G tower
        # has no per-checkpoint custom table here -> clamp to a harmless 0
        tokens = jnp.maximum(tokens, 0)
        x = m["token_embedding"]["weight"][tokens]
        x = x + m["positional_embedding"][: tokens.shape[1]][None]
        l = tokens.shape[1]
        causal = jnp.where(
            jnp.arange(l)[None, :] <= jnp.arange(l)[:, None], 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None]
        n_layers = cfg.num_layers if clip_skip == -1 else cfg.num_layers + 1 + clip_skip
        hidden = x
        for i in range(cfg.num_layers):
            blk = m["transformer"]["resblocks"][str(i)]
            h = layer_norm(blk["ln_1"], x)
            w = blk["attn"]["in_proj_weight"]
            b = blk["attn"]["in_proj_bias"]
            qkv = h @ w.T + b
            q, k, v = jnp.split(qkv, 3, axis=-1)
            h = attention(q, k, v, cfg.num_heads, mask=causal)
            x = x + linear(blk["attn"]["out_proj"], h)
            h = layer_norm(blk["ln_2"], x)
            h = jax.nn.gelu(linear(blk["mlp"]["c_fc"], h), approximate=False)
            x = x + linear(blk["mlp"]["c_proj"], h)
            if i + 1 == n_layers:
                hidden = x
        final = layer_norm(m["ln_final"], x)
        eos_pos = jnp.argmax((tokens == 49407 % cfg.vocab_size).astype(jnp.int32), axis=1)
        pooled = final[jnp.arange(tokens.shape[0]), eos_pos] @ m["text_projection"]
        return hidden, pooled

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        from stable_renderer_tpu.models.unet import _KeyGen

        keys = _KeyGen(key)

        def lin(i, o):
            return {
                "weight": jax.random.normal(keys(), (o, i), dtype) * 0.02,
                "bias": jnp.zeros((o,), dtype),
            }

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        w = cfg.width
        blocks = {
            str(i): {
                "ln_1": norm(w),
                "ln_2": norm(w),
                "attn": {
                    "in_proj_weight": jax.random.normal(keys(), (3 * w, w), dtype) * 0.02,
                    "in_proj_bias": jnp.zeros((3 * w,), dtype),
                    "out_proj": lin(w, w),
                },
                "mlp": {
                    "c_fc": lin(w, w * cfg.mlp_ratio),
                    "c_proj": lin(w * cfg.mlp_ratio, w),
                },
            }
            for i in range(cfg.num_layers)
        }
        return {
            "model": {
                "token_embedding": {
                    "weight": jax.random.normal(keys(), (cfg.vocab_size, w), dtype) * 0.02
                },
                "positional_embedding": jax.random.normal(keys(), (cfg.max_length, w), dtype) * 0.01,
                "transformer": {"resblocks": blocks},
                "ln_final": norm(w),
                "text_projection": jax.random.normal(keys(), (w, cfg.projection_dim), dtype) * 0.02,
            }
        }


SD2_CLIP_H_CONFIG = OpenCLIPConfig(width=1024, num_layers=24, num_heads=16,
                                   projection_dim=1024)
TINY_CLIP_H_CONFIG = OpenCLIPConfig(vocab_size=1000, width=64, num_layers=3,
                                    num_heads=2, projection_dim=64)


class SD2ClipH:
    """SD2.x text tower: OpenCLIP-H in the checkpoint layout
    ``cond_stage_model.model.*``, adapted to the CLIPTextModel.apply interface
    (comfy sd2_clip.py SD2ClipHModel: penultimate hidden state with the final
    layer norm applied — layer='penultimate', layer_norm_hidden_state=True)."""

    def __init__(self, ocfg: OpenCLIPConfig = SD2_CLIP_H_CONFIG):
        self._inner = OpenCLIPTextModel(ocfg)
        self._ocfg = ocfg
        # CLIPTextModel-compatible config facade (tokenizer + bos/eos contract)
        self.config = CLIPConfig(
            vocab_size=ocfg.vocab_size, max_length=ocfg.max_length,
            hidden_size=ocfg.width, num_layers=ocfg.num_layers,
            num_heads=ocfg.num_heads,
            intermediate_size=ocfg.width * ocfg.mlp_ratio,
        )

    def apply(self, params: dict, tokens: jax.Array, clip_skip: int = -1,
              final_norm: bool = True,
              custom_embeds: Optional[jax.Array] = None) -> jax.Array:
        import jax.numpy as jnp

        skip = -2 if clip_skip == -1 else clip_skip  # penultimate default
        hidden, _ = self._inner.apply(params, jnp.maximum(tokens, 0),
                                      clip_skip=skip)
        if final_norm:
            m = params["model"] if "model" in params else params
            hidden = layer_norm(m["ln_final"], hidden)
        return hidden

    def pooled(self, params: dict, tokens: jax.Array,
               hidden: jax.Array) -> jax.Array:
        import jax.numpy as jnp

        _, p = self._inner.apply(params, jnp.maximum(tokens, 0), clip_skip=-1)
        return p

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        return self._inner.init(key, dtype)


class SDXLClip:
    """Dual-encoder SDXL conditioning (comfy sdxl_clip.py SDXLClipModel):
    context = concat(clip_l penultimate (768), clip_g penultimate (1280)) = 2048;
    pooled = clip_g text projection output."""

    def __init__(self, clip_l: "CLIPTextModel", clip_g: OpenCLIPTextModel):
        self.clip_l = clip_l
        self.clip_g = clip_g

    def apply(self, params_l: dict, params_g: dict, tokens: jax.Array):
        import jax.numpy as jnp

        hidden_l = self.clip_l.apply(params_l, tokens, clip_skip=-2, final_norm=False)
        hidden_g, pooled = self.clip_g.apply(params_g, tokens, clip_skip=-2)
        return jnp.concatenate([hidden_l, hidden_g], axis=-1), pooled


class Tokenizer:
    """Real CLIP BPE tokenizer over the bundled vocab (assets/clip_tokenizer),
    with `(word:1.2)` weighting and `embedding:name` textual inversion
    (sd1_clip.py:358-484 SDTokenizer semantics via models/tokenizer.py).

    For tiny test configs (vocab_size < 49408) a deterministic hash tokenizer
    keeps random-init pipelines runnable — real checkpoints always use the
    full vocab."""

    def __init__(
        self,
        config: CLIPConfig = SD15_CLIP_CONFIG,
        vocab_path: str | None = None,
        embedding_directory=None,
    ):
        self.config = config
        self._sd = None
        if config.vocab_size >= 49408:
            from stable_renderer_tpu.models.tokenizer import SDTokenizer

            self._sd = SDTokenizer(
                tokenizer_path=vocab_path,
                max_length=config.max_length,
                embedding_directory=embedding_directory,
                embedding_size=config.hidden_size,
            )
        else:
            logger.info("tiny CLIP config: using deterministic hash tokenizer")

    def encode(self, text: str) -> np.ndarray:
        """text -> (77,) int32 with BOS/EOS + EOS padding (first chunk only;
        use tokenize_weighted for >75-token prompts / weights / embeddings)."""
        cfg = self.config
        if self._sd is not None:
            chunk = self._sd.tokenize_with_weights(text)[0]
            return np.asarray([t for t, _ in chunk], np.int32)
        words = text.lower().split()
        body = [
            (hash(w) % (cfg.vocab_size - 2 - 1)) + 1  # avoid 0/bos/eos
            for w in words
        ][: cfg.max_length - 2]
        ids = [cfg.bos_token % cfg.vocab_size] + body + [cfg.eos_token % cfg.vocab_size]
        ids += [cfg.eos_token % cfg.vocab_size] * (cfg.max_length - len(ids))
        return np.asarray(ids, np.int32)

    def encode_batch(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([self.encode(t) for t in texts])

    def tokenize_weighted(self, text: str):
        """text -> (ids (n_chunks, 77) i32, weights (n_chunks, 77) f32,
        custom_embeds (K, hidden) f32 | None)."""
        from stable_renderer_tpu.models.tokenizer import pack_chunks

        if self._sd is not None:
            return pack_chunks(self._sd.tokenize_with_weights(text))
        ids = self.encode(text)[None]
        return ids, np.ones_like(ids, np.float32), None

    def tokenize_weighted_batch(self, texts: Sequence[str]):
        """texts -> (ids (B, C, 77), weights (B, C, 77), custom (K, hidden)|None).

        All prompts are padded to the same chunk count C with empty chunks;
        per-prompt textual-inversion vectors are concatenated into one global
        table with ids remapped (the host half of encode_token_weights_batch)."""
        cfg = self.config
        packed = [self.tokenize_weighted(t) for t in texts]
        c = max(p[0].shape[0] for p in packed)
        length = cfg.max_length
        eos = cfg.eos_token % cfg.vocab_size
        bos = cfg.bos_token % cfg.vocab_size
        ids = np.full((len(texts), c, length), eos, np.int32)
        ids[:, :, 0] = bos
        weights = np.ones((len(texts), c, length), np.float32)
        customs: list[np.ndarray] = []
        offset = 0
        for bi, (pid, pw, pc) in enumerate(packed):
            pid = pid.copy()
            if pc is not None:
                pid[pid < 0] -= offset  # -(k+1) -> -(offset+k+1)
                customs.append(pc)
                offset += pc.shape[0]
            ids[bi, : pid.shape[0]] = pid
            weights[bi, : pw.shape[0]] = pw
        custom = np.concatenate(customs, axis=0) if customs else None
        return ids, weights, custom


def encode_token_weights(
    model: CLIPTextModel,
    params: dict,
    ids: jax.Array,       # (n_chunks, L) int32, negative = custom embedding
    weights: jax.Array,   # (n_chunks, L) f32
    custom_embeds: Optional[jax.Array] = None,
    clip_skip: int = -1,
    final_norm: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Weighted multi-chunk encoding (ClipTokenWeightEncoder, sd1_clip.py:25-60).

    Encodes all chunks plus one empty chunk in a single batch; weighted tokens
    are interpolated against the empty-prompt encoding:
    ``z = (z - z_empty) * w + z_empty``. Chunks concatenate along the sequence
    axis. Returns (context (1, n_chunks*L, hidden), pooled (1, hidden))."""
    cfg = model.config
    n, length = ids.shape
    empty = jnp.full((1, length), cfg.eos_token % cfg.vocab_size, ids.dtype)
    empty = empty.at[0, 0].set(cfg.bos_token % cfg.vocab_size)
    batch = jnp.concatenate([ids, empty], axis=0)
    out = model.apply(params, batch, clip_skip=clip_skip, final_norm=final_norm,
                      custom_embeds=custom_embeds)
    z, z_empty = out[:n], out[n]
    z = (z - z_empty[None]) * weights[..., None] + z_empty[None]
    pooled = model.pooled(params, ids[:1], out[:1])
    return z.reshape(1, n * length, -1), pooled


def encode_token_weights_batch(
    model: CLIPTextModel,
    params: dict,
    ids: jax.Array,       # (B, C, L) int32; negative ids index custom_embeds globally
    weights: jax.Array,   # (B, C, L) f32
    custom_embeds: Optional[jax.Array] = None,  # (K, hidden)
    clip_skip: int = -1,
    final_norm: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Batched multi-prompt version of encode_token_weights: every prompt has C
    chunks (pad with empty chunks host-side); one extra empty chunk provides the
    z_empty reference. Returns (context (B, C*L, hidden), pooled (B, hidden))."""
    cfg = model.config
    b, c, length = ids.shape
    flat = ids.reshape(b * c, length)
    empty = jnp.full((1, length), cfg.eos_token % cfg.vocab_size, ids.dtype)
    empty = empty.at[0, 0].set(cfg.bos_token % cfg.vocab_size)
    out = model.apply(
        params,
        jnp.concatenate([flat, empty], axis=0),
        clip_skip=clip_skip,
        final_norm=final_norm,
        custom_embeds=custom_embeds,
    )
    z, z_empty = out[: b * c], out[b * c]
    z = (z - z_empty[None]) * weights.reshape(b * c, length)[..., None] + z_empty[None]
    pooled = model.pooled(params, flat[::c], out[:b * c:c])
    return z.reshape(b, c * length, -1), pooled


def clip_g_pad_ids(ids: jax.Array, eos: int = 49407) -> jax.Array:
    """SDXLClipGTokenizer pads with 0 after the first EOS (pad_with_end=False,
    comfy sdxl_clip.py) — derive the G-tower ids from the L-tower ids."""
    first_eos = jnp.argmax((ids == eos).astype(jnp.int32), axis=-1)
    after = jnp.arange(ids.shape[-1]) > first_eos[..., None]
    return jnp.where(after, 0, ids)


def encode_token_weights_batch_g(
    clip_g: "OpenCLIPTextModel",
    params_g: dict,
    ids: jax.Array,       # (B, C, L) int32 (L-tower padding; G ids derived)
    weights: jax.Array,   # (B, C, L) f32
    clip_skip: int = -2,
) -> tuple[jax.Array, jax.Array]:
    """SDXL-Refiner single-tower encoding (comfy sdxl_clip.py
    SDXLRefinerClipModel): the refiner checkpoint carries ONLY the CLIP-G
    tower, so context is the 1280-wide G penultimate hidden state and pooled
    is the G text projection — no CLIP-L concat."""
    b, c, length = ids.shape
    eos = 49407 % clip_g.config.vocab_size
    bos = 49406 % clip_g.config.vocab_size
    ids_g = clip_g_pad_ids(ids.reshape(b * c, length), eos)
    empty = jnp.zeros((1, length), ids.dtype)
    empty = empty.at[0, 0].set(bos)
    empty = empty.at[0, 1].set(eos)
    hidden, pooled = clip_g.apply(
        params_g, jnp.concatenate([ids_g, empty], axis=0), clip_skip=clip_skip
    )
    zg, zg_empty = hidden[: b * c], hidden[b * c]
    zg = (zg - zg_empty[None]) * weights.reshape(b * c, length)[..., None] + zg_empty[None]
    return zg.reshape(b, c * length, -1), pooled[: b * c : c]


def encode_token_weights_batch_xl(
    clip_l: CLIPTextModel,
    clip_g: "OpenCLIPTextModel",
    params_l: dict,
    params_g: dict,
    ids: jax.Array,       # (B, C, L) int32 (L-tower padding; G ids derived)
    weights: jax.Array,   # (B, C, L) f32
    custom_embeds: Optional[jax.Array] = None,
    clip_skip: int = -2,
) -> tuple[jax.Array, jax.Array]:
    """SDXL dual-tower weighted encoding (comfy sdxl_clip.py SDXLClipModel):
    context = concat(clip_l hidden no-final-norm, clip_g hidden) per chunk,
    pooled = clip_g text-projection of the first chunk. Both towers use the
    (z - z_empty) * w + z_empty weighting of ClipTokenWeightEncoder."""
    cfg_l = clip_l.config
    b, c, length = ids.shape
    z_l, _ = encode_token_weights_batch(
        clip_l, params_l, ids, weights,
        custom_embeds=custom_embeds, clip_skip=clip_skip, final_norm=False,
    )
    eos = cfg_l.eos_token % clip_g.config.vocab_size
    ids_g = clip_g_pad_ids(ids.reshape(b * c, length), eos)
    empty = jnp.zeros((1, length), ids.dtype)
    empty = empty.at[0, 0].set(cfg_l.bos_token % clip_g.config.vocab_size)
    empty = empty.at[0, 1].set(eos)
    hidden, pooled = clip_g.apply(
        params_g, jnp.concatenate([ids_g, empty], axis=0), clip_skip=clip_skip
    )
    zg, zg_empty = hidden[: b * c], hidden[b * c]
    zg = (zg - zg_empty[None]) * weights.reshape(b * c, length)[..., None] + zg_empty[None]
    z_g = zg.reshape(b, c * length, -1)
    pooled_first = pooled[: b * c : c]  # first chunk of each prompt
    return jnp.concatenate([z_l, z_g], axis=-1), pooled_first
