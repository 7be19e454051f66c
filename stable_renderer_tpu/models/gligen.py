"""GLIGEN — grounded (bounding-box) text-to-image conditioning.

Capability match for the reference's gligen
(reference: comfyUI/comfy/gligen.py — GatedSelfAttentionDense fuser modules
:87-124, FourierEmbedder :181-196, PositionNet :199-240, Gligen.set_position
:243-310, load_gligen :320-343). The fusers hook the UNet at the reference's
``transformer_index`` middle-patch point — here the ``mid`` attention hook
(models/unet.py AttnHooks.mid), which fires after the attn1 residual add in
every transformer block.

TPU shape notes: max_objs is static (30) so the grounding tokens concat to a
fixed sequence length — one compiled program regardless of how many boxes the
user supplies; empty slots carry the learned null embeddings exactly like the
reference's padding path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.models.layers import attention, layer_norm, linear

MAX_OBJS = 30  # gligen.py:248


def fourier_embed(x: jax.Array, num_freqs: int = 8,
                  temperature: float = 100.0) -> jax.Array:
    """FourierEmbedder (gligen.py:181-196): interleaved sin/cos bands,
    concatenated along the last axis. x: (..., 4) -> (..., num_freqs*2*4)."""
    freqs = temperature ** (jnp.arange(num_freqs) / num_freqs)
    out = []
    for f in freqs:
        out.append(jnp.sin(f * x))
        out.append(jnp.cos(f * x))
    return jnp.concatenate(out, axis=-1)


def position_net_apply(params: dict, boxes: jax.Array, masks: jax.Array,
                       positive_embeddings: jax.Array) -> jax.Array:
    """PositionNet (gligen.py:199-240): (B,N,4) boxes + (B,N) masks +
    (B,N,in_dim) text embeds -> (B,N,out_dim) grounding tokens; padded slots
    use the learned null features."""
    m = masks[..., None]
    xyxy = fourier_embed(boxes)  # (B,N,64)
    pos_null = params["null_positive_feature"][None, None]
    xyxy_null = params["null_position_feature"][None, None]
    pe = positive_embeddings * m + (1 - m) * pos_null
    xe = xyxy * m + (1 - m) * xyxy_null
    h = jnp.concatenate([pe, xe], axis=-1)
    h = jax.nn.silu(linear(params["linears"]["0"], h))
    h = jax.nn.silu(linear(params["linears"]["2"], h))
    return linear(params["linears"]["4"], h)


def _geglu_ff(p: dict, x: jax.Array) -> jax.Array:
    """FeedForward(glu=True) (gligen.py:23-50): GEGLU proj -> linear."""
    proj = linear(p["net"]["0"]["proj"], x)
    a, gate = jnp.split(proj, 2, axis=-1)
    return linear(p["net"]["2"], a * jax.nn.gelu(gate))


def gated_self_attention(p: dict, x: jax.Array, objs: jax.Array,
                         n_heads: int) -> jax.Array:
    """GatedSelfAttentionDense (gligen.py:87-124): self-attention over
    [visual tokens ++ projected grounding tokens], visual part kept, gated by
    tanh(alpha)."""
    n_visual = x.shape[1]
    objs_p = linear(p["linear"], objs)
    h = layer_norm(p["norm1"], jnp.concatenate([x, objs_p], axis=1))
    q = linear(p["attn"]["to_q"], h)
    k = linear(p["attn"]["to_k"], h)
    v = linear(p["attn"]["to_v"], h)
    att = attention(q, k, v, n_heads)
    att = linear(p["attn"]["to_out"]["0"], att)[:, :n_visual]
    x = x + jnp.tanh(p["alpha_attn"]) * att
    x = x + jnp.tanh(p["alpha_dense"]) * _geglu_ff(p["ff"], layer_norm(p["norm2"], x))
    return x


class Gligen:
    """Loaded GLIGEN patch: per-transformer-index fuser params + PositionNet
    (gligen.py:243-316)."""

    def __init__(self, fusers: List[dict], fuser_heads: List[int],
                 position_net: dict, key_dim: int):
        self.fusers = fusers          # ordered by transformer_index
        self.fuser_heads = fuser_heads
        self.position_net = position_net
        self.key_dim = key_dim
        self.max_objs = MAX_OBJS

    def grounding_tokens(self, batch: int,
                         position_params: Optional[List[Tuple]] = None,
                         latent_hw: Tuple[int, int] = (64, 64)) -> jax.Array:
        """Build the (B, max_objs, out_dim) grounding tokens.

        position_params entries are the reference's node tuples
        (cond_pooled, h, w, y, x) in latent cells (gligen.py:262-276);
        None/empty -> set_empty (gligen.py:297-310)."""
        h_lat, w_lat = latent_hw
        boxes = jnp.zeros((self.max_objs, 4))
        masks = jnp.zeros((self.max_objs,))
        conds = jnp.zeros((self.max_objs, self.key_dim))
        for i, p in enumerate(position_params or []):
            if i >= self.max_objs:
                break
            emb, bh, bw, by, bx = p
            x1, y1 = bx / w_lat, by / h_lat
            x2, y2 = (bx + bw) / w_lat, (by + bh) / h_lat
            boxes = boxes.at[i].set(jnp.asarray([x1, y1, x2, y2]))
            masks = masks.at[i].set(1.0)
            conds = conds.at[i].set(jnp.reshape(emb, (-1,))[: self.key_dim])
        rep = lambda a: jnp.broadcast_to(a[None], (batch, *a.shape))
        return position_net_apply(self.position_net, rep(boxes), rep(masks),
                                  rep(conds))

    def make_mid_hook(self, objs: jax.Array):
        """AttnHooks.mid-compatible fn: applies fuser[transformer_index]
        (Gligen._set_position, gligen.py:251-257)."""

        def mid(x: jax.Array, layer: int) -> jax.Array:
            if layer >= len(self.fusers):
                return x
            p = self.fusers[layer]
            # static trace-time guard: a fuser only applies at its own width
            # (real checkpoints always match; partial/test fixtures skip)
            if p["norm1"]["weight"].shape[0] != x.shape[-1]:
                return x
            return gated_self_attention(p, x, objs.astype(x.dtype),
                                        self.fuser_heads[layer])

        return mid


def load_gligen(sd: dict) -> Gligen:
    """Parse a GLIGEN checkpoint state dict (load_gligen, gligen.py:320-343):
    fusers keyed input_blocks/middle_block/output_blocks.<n>.fuser.*, ordered
    by scan order = transformer_index."""
    from stable_renderer_tpu.models.weights import nest

    fusers: List[dict] = []
    heads: List[int] = []
    key_dim = 768
    for a in ("input_blocks", "middle_block", "output_blocks"):
        for b in range(20):
            prefix = f"{a}.{b}."
            n_sd = {k.split(".fuser.")[-1]: v for k, v in sd.items()
                    if k.startswith(prefix) and ".fuser." in k}
            if not n_sd:
                continue
            query_dim = n_sd["linear.weight"].shape[0]
            key_dim = n_sd["linear.weight"].shape[1]
            if key_dim == 768:  # SD1.x head split (gligen.py:325-332)
                n_heads = 8
            else:
                n_heads = query_dim // 64
            fusers.append(nest({k: jnp.asarray(v) for k, v in n_sd.items()}))
            heads.append(n_heads)
    pn_sd = {k[len("position_net."):]: jnp.asarray(v) for k, v in sd.items()
             if k.startswith("position_net.")}
    position_net = nest(pn_sd)
    return Gligen(fusers, heads, position_net, key_dim)


def init_random_gligen(key: jax.Array, n_fusers: int = 16, query_dim: int = 64,
                       key_dim: int = 64, n_heads: int = 2) -> Gligen:
    """Random-weights Gligen for tests (mirrors tiny-UNet test fixtures)."""
    from stable_renderer_tpu.models.unet import _KeyGen

    keys = _KeyGen(key)

    def lin(i, o, bias=True):
        p = {"weight": jax.random.normal(keys(), (o, i)) * 0.02}
        if bias:
            p["bias"] = jnp.zeros((o,))
        return p

    def norm(c):
        return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def fuser():
        inner = query_dim * 4
        return {
            "linear": lin(key_dim, query_dim),
            "attn": {"to_q": lin(query_dim, query_dim, False),
                     "to_k": lin(query_dim, query_dim, False),
                     "to_v": lin(query_dim, query_dim, False),
                     "to_out": {"0": lin(query_dim, query_dim)}},
            "ff": {"net": {"0": {"proj": lin(query_dim, inner * 2)},
                           "2": lin(inner, query_dim)}},
            "norm1": norm(query_dim), "norm2": norm(query_dim),
            "alpha_attn": jnp.asarray(0.5), "alpha_dense": jnp.asarray(0.5),
        }

    # PositionNet emits key_dim-wide grounding tokens; each fuser's linear
    # projects key_dim -> its block's query_dim (gligen.py:91-93,320-335)
    in_dim, out_dim = key_dim, key_dim
    pos_dim = 8 * 2 * 4
    position_net = {
        "linears": {"0": lin(in_dim + pos_dim, 512), "2": lin(512, 512),
                    "4": lin(512, out_dim)},
        "null_positive_feature": jnp.zeros((in_dim,)),
        "null_position_feature": jnp.zeros((pos_dim,)),
    }
    return Gligen([fuser() for _ in range(n_fusers)], [n_heads] * n_fusers,
                  position_net, key_dim)
