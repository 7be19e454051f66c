"""CodeFormer — codebook-lookup transformer face restoration.

Capability match for the reference's second face-restore model
(reference: comfyUI/comfy_extras/chainner_models/architecture/face/
codeformer.py — VectorQuantizer :17-95, VQ encoder/generator :137-330,
TransformerSALayer :492-533, Fuse_sft_block :578-602, CodeFormer assembly +
forward :604-790). Functional JAX, NHWC, torch param layout (Sequential
block indices reproduced by building the same structural plan).

Flow: VQ-GAN encoder -> 9-layer transformer predicts codebook indices ->
quantized features -> VQ-GAN generator, with controllable fidelity (the
``weight`` knob) via SFT fusion of encoder features at the connect
resolutions."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.layers import conv2d, group_norm, linear


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _norm(p, x):
    return group_norm(p, x, num_groups=32, eps=1e-6)


@dataclass(frozen=True)
class CodeFormerConfig:
    img_size: int = 512
    nf: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    codebook_size: int = 1024
    emb_dim: int = 256
    dim_embd: int = 512
    n_head: int = 8
    n_layers: int = 9
    connect_list: Tuple[str, ...] = ("32", "64", "128", "256")

    @property
    def latent_res(self) -> int:
        return self.img_size // 2 ** (len(self.ch_mult) - 1)


TINY_CODEFORMER_CONFIG = CodeFormerConfig(
    img_size=16, nf=8, ch_mult=(1, 2), res_blocks=1, attn_resolutions=(8,),
    codebook_size=32, emb_dim=16, dim_embd=16, n_head=2, n_layers=2,
    connect_list=("16",))


def _res_block(p: dict, x: jax.Array) -> jax.Array:
    """VQGAN ResBlock (codeformer.py:546-575)."""
    h = conv2d(p["conv1"], _swish(_norm(p["norm1"], x)), padding=1)
    h = conv2d(p["conv2"], _swish(_norm(p["norm2"], h)), padding=1)
    if "conv_out" in p:
        x = conv2d(p["conv_out"], x)
    return x + h


def _attn_block(p: dict, x: jax.Array) -> jax.Array:
    """Single-head spatial attention (codeformer.py:165-208)."""
    b, h, w, c = x.shape
    n = _norm(p["norm"], x)
    q = conv2d(p["q"], n).reshape(b, h * w, c)
    k = conv2d(p["k"], n).reshape(b, h * w, c)
    v = conv2d(p["v"], n).reshape(b, h * w, c)
    attn = jax.nn.softmax(jnp.einsum("bnc,bmc->bnm", q, k) * (c ** -0.5), axis=-1)
    out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], out)


def _encoder_plan(cfg: CodeFormerConfig):
    """Ordered (kind,) plan matching the torch Sequential indices
    (codeformer.py:211-262) + per-resolution fuse positions (last ResBlock of
    each stage; CodeFormer.fuse_encoder_block)."""
    plan: List[Tuple[str, ...]] = [("conv_in",)]
    fuse: Dict[int, int] = {}
    curr = cfg.img_size
    for i in range(len(cfg.ch_mult)):
        for _ in range(cfg.res_blocks):
            plan.append(("res",))
            fuse[curr] = len(plan) - 1
            if curr in cfg.attn_resolutions:
                plan.append(("attn",))
                fuse[curr] = len(plan) - 2  # last res BEFORE its attn
        if i != len(cfg.ch_mult) - 1:
            plan.append(("down",))
            curr //= 2
    # re-walk for the 16-res rule: fuse at the LAST res block of the stage
    plan += [("res",), ("attn",), ("res",), ("norm",), ("conv_out",)]
    return plan, fuse


def _generator_plan(cfg: CodeFormerConfig):
    """(codeformer.py:269-317) + fuse positions: first ResBlock of each
    stage, or the last one for attention stages (fuse_generator_block)."""
    plan: List[Tuple[str, ...]] = [("conv_in",), ("res",), ("attn",), ("res",)]
    fuse: Dict[int, int] = {}
    curr = cfg.latent_res
    for i in reversed(range(len(cfg.ch_mult))):
        first_res_idx = None
        last_res_idx = None
        for _ in range(cfg.res_blocks):
            plan.append(("res",))
            last_res_idx = len(plan) - 1
            if first_res_idx is None:
                first_res_idx = last_res_idx
            if curr in cfg.attn_resolutions:
                plan.append(("attn",))
        fuse[curr] = (last_res_idx if curr in cfg.attn_resolutions
                      else first_res_idx)
        if i != 0:
            plan.append(("up",))
            curr *= 2
    plan += [("norm",), ("conv_out",)]
    return plan, fuse


def _run_plan(plan, params: dict, x: jax.Array,
              fuse_at: Optional[Dict[int, Tuple[dict, jax.Array, float]]] = None,
              collect: Optional[Dict[int, int]] = None):
    """Walk a block plan; optionally collect features at ``collect`` indices
    (returned keyed by resolution) and fuse at ``fuse_at`` indices."""
    collected: Dict[str, jax.Array] = {}
    collect_rev = {v: k for k, v in (collect or {}).items()}
    for i, (kind,) in enumerate(plan):
        p = params[str(i)]
        if kind in ("conv_in", "conv_out"):
            x = conv2d(p, x, padding=1)
        elif kind == "res":
            x = _res_block(p, x)
        elif kind == "attn":
            x = _attn_block(p, x)
        elif kind == "down":
            xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(p, xp, stride=2)
        elif kind == "up":
            x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
            x = conv2d(p, x, padding=1)
        elif kind == "norm":
            x = _swish(_norm(p, x))
        if collect_rev and i in collect_rev:
            collected[str(collect_rev[i])] = x
        if fuse_at and i in fuse_at:
            fp, enc_feat, w = fuse_at[i]
            x = _fuse_sft(fp, enc_feat, x, w)
    return x, collected


def _fuse_sft(p: dict, enc_feat: jax.Array, dec_feat: jax.Array,
              w: float) -> jax.Array:
    """Fuse_sft_block (codeformer.py:578-602)."""
    h = _res_block(p["encode_enc"], jnp.concatenate([enc_feat, dec_feat], -1))
    scale = conv2d(p["scale"]["2"],
                   jax.nn.leaky_relu(conv2d(p["scale"]["0"], h, padding=1), 0.2),
                   padding=1)
    shift = conv2d(p["shift"]["2"],
                   jax.nn.leaky_relu(conv2d(p["shift"]["0"], h, padding=1), 0.2),
                   padding=1)
    return dec_feat + w * (dec_feat * scale + shift)


def _transformer_layer(p: dict, x: jax.Array, pos: jax.Array,
                       heads: int) -> jax.Array:
    """TransformerSALayer (codeformer.py:492-533). x: (B, N, E)."""
    from stable_renderer_tpu.models.layers import layer_norm

    b, n, e = x.shape
    d = e // heads
    t2 = layer_norm(p["norm1"], x)
    qk = t2 + pos[None]
    w = p["self_attn"]["in_proj_weight"].astype(x.dtype)
    bqkv = p["self_attn"]["in_proj_bias"].astype(x.dtype)
    q = qk @ w[:e].T + bqkv[:e]
    k = qk @ w[e: 2 * e].T + bqkv[e: 2 * e]
    v = t2 @ w[2 * e:].T + bqkv[2 * e:]

    def heads_of(t):
        return t.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = heads_of(q) * (d ** -0.5), heads_of(k), heads_of(v)
    attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", qh, kh), axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, e)
    x = x + linear(p["self_attn"]["out_proj"], out)
    t2 = layer_norm(p["norm2"], x)
    t2 = linear(p["linear2"],
                jax.nn.gelu(linear(p["linear1"], t2), approximate=False))
    return x + t2


class CodeFormer:
    def __init__(self, config: CodeFormerConfig = CodeFormerConfig()):
        self.config = config
        self.enc_plan, self.enc_fuse = _encoder_plan(config)
        self.gen_plan, self.gen_fuse = _generator_plan(config)

    @property
    def scale(self) -> int:
        return 1

    def apply(self, params: dict, x: jax.Array, weight: float = 0.5) -> jax.Array:
        """x: (B, S, S, 3) in [-1, 1] face crops -> restored (B, S, S, 3).
        ``weight``: fidelity knob (0 = pure codebook prior, 1 = max input
        fidelity via SFT fusion)."""
        cfg = self.config
        b = x.shape[0]
        lr = cfg.latent_res

        collect = {int(s): self.enc_fuse[int(s)] for s in cfg.connect_list}
        lq, enc_feats = _run_plan(self.enc_plan, params["encoder"]["blocks"],
                                  x, collect=collect)

        # transformer over latent tokens (torch flattens channel-major)
        tokens = lq.transpose(0, 3, 1, 2).reshape(b, cfg.emb_dim, lr * lr)
        tokens = tokens.transpose(0, 2, 1)  # (B, N, emb)
        feat = linear(params["feat_emb"], tokens)
        pos = params["position_emb"].astype(feat.dtype)
        for i in range(cfg.n_layers):
            feat = _transformer_layer(params["ft_layers"][str(i)], feat, pos,
                                      cfg.n_head)
        from stable_renderer_tpu.models.layers import layer_norm

        logits = layer_norm(params["idx_pred_layer"]["0"], feat)
        logits = logits @ params["idx_pred_layer"]["1"]["weight"].astype(
            logits.dtype).T  # (B, N, codebook)

        top_idx = jnp.argmax(logits, axis=-1)  # (B, N)
        codebook = params["quantize"]["embedding"]["weight"]
        quant = codebook[top_idx]  # (B, N, emb)
        quant = quant.reshape(b, lr, lr, cfg.emb_dim)

        fuse_at = {}
        if weight > 0:
            for s in cfg.connect_list:
                gi = self.gen_fuse[int(s)]
                fuse_at[gi] = (params["fuse_convs_dict"][s], enc_feats[s],
                               weight)
        out, _ = _run_plan(self.gen_plan, params["generator"]["blocks"],
                           quant.astype(x.dtype), fuse_at=fuse_at)
        return out

    # --- random init (torch layout) for tests ---

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        cfg = self.config
        keys = iter(jax.random.split(key, 16384))

        def conv(i, o, k=3, bias=True):
            p = {"weight": jax.random.normal(next(keys), (o, i, k, k), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def lin(i, o, bias=True):
            p = {"weight": jax.random.normal(next(keys), (o, i), dtype) * 0.05}
            if bias:
                p["bias"] = jnp.zeros((o,), dtype)
            return p

        def norm(c):
            return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

        def res(i, o):
            p = {"norm1": norm(i), "conv1": conv(i, o), "norm2": norm(o),
                 "conv2": conv(o, o)}
            if i != o:
                p["conv_out"] = conv(i, o, 1)
            return p

        def attn(c):
            return {"norm": norm(c), "q": conv(c, c, 1), "k": conv(c, c, 1),
                    "v": conv(c, c, 1), "proj_out": conv(c, c, 1)}

        def build(plan, chan_walk):
            params = {}
            for i, (kind,) in enumerate(plan):
                cin, cout = chan_walk[i]
                if kind in ("conv_in", "conv_out", "up"):
                    params[str(i)] = conv(cin, cout)
                elif kind == "down":
                    params[str(i)] = conv(cin, cout)
                elif kind == "res":
                    params[str(i)] = res(cin, cout)
                elif kind == "attn":
                    params[str(i)] = attn(cin)
                elif kind == "norm":
                    params[str(i)] = norm(cin)
            return params

        # channel walks mirroring the torch constructors
        nf, cm = cfg.nf, cfg.ch_mult
        enc_ch = []
        c = 3
        cur = nf
        curr_res = cfg.img_size
        enc_ch.append((3, nf))
        cin = nf
        for i in range(len(cm)):
            cout = nf * cm[i]
            for _ in range(cfg.res_blocks):
                enc_ch.append((cin, cout))
                cin = cout
                if curr_res in cfg.attn_resolutions:
                    enc_ch.append((cin, cin))
            if i != len(cm) - 1:
                enc_ch.append((cin, cin))
                curr_res //= 2
        enc_ch += [(cin, cin), (cin, cin), (cin, cin), (cin, cin),
                   (cin, cfg.emb_dim)]

        gen_ch = []
        cin = nf * cm[-1]
        curr_res = cfg.latent_res
        gen_ch.append((cfg.emb_dim, cin))
        gen_ch += [(cin, cin), (cin, cin), (cin, cin)]
        for i in reversed(range(len(cm))):
            cout = nf * cm[i]
            for _ in range(cfg.res_blocks):
                gen_ch.append((cin, cout))
                cin = cout
                if curr_res in cfg.attn_resolutions:
                    gen_ch.append((cin, cin))
            if i != 0:
                gen_ch.append((cin, cin))
                curr_res *= 2
        gen_ch += [(cin, cin), (cin, 3)]

        def fuse_block(c):
            return {"encode_enc": res(2 * c, c),
                    "scale": {"0": conv(c, c), "2": conv(c, c)},
                    "shift": {"0": conv(c, c), "2": conv(c, c)}}

        # channel at each connect resolution (encoder feature width there)
        conn_ch = {}
        for s in cfg.connect_list:
            idx = self.enc_fuse[int(s)]
            conn_ch[s] = enc_ch[idx][1]

        e = cfg.dim_embd
        return {
            "encoder": {"blocks": build(self.enc_plan, enc_ch)},
            "generator": {"blocks": build(self.gen_plan, gen_ch)},
            "quantize": {"embedding": {"weight": jax.random.normal(
                next(keys), (cfg.codebook_size, cfg.emb_dim), dtype) * 0.05}},
            "position_emb": jnp.zeros((cfg.latent_res ** 2, e), dtype),
            "feat_emb": lin(cfg.emb_dim, e),
            "ft_layers": {
                str(i): {
                    "self_attn": {
                        "in_proj_weight": jax.random.normal(next(keys), (3 * e, e), dtype) * 0.05,
                        "in_proj_bias": jnp.zeros((3 * e,), dtype),
                        "out_proj": lin(e, e),
                    },
                    "linear1": lin(e, 2 * e), "linear2": lin(2 * e, e),
                    "norm1": norm(e), "norm2": norm(e),
                }
                for i in range(cfg.n_layers)},
            "idx_pred_layer": {"0": norm(e),
                               "1": lin(e, cfg.codebook_size, bias=False)},
            "fuse_convs_dict": {s: fuse_block(conn_ch[s])
                                for s in cfg.connect_list},
        }


def detect_codeformer_config(flat: Dict[str, np.ndarray]) -> Optional[CodeFormerConfig]:
    if "position_emb" not in flat or "quantize.embedding.weight" not in flat:
        return None
    dim_embd = flat["position_emb"].shape[1]
    codebook = flat["quantize.embedding.weight"].shape[0]
    emb_dim = flat["quantize.embedding.weight"].shape[1]
    n_layers = len({k.split(".")[1] for k in flat if k.startswith("ft_layers.")})
    n_head_exp = flat["ft_layers.0.self_attn.in_proj_weight"].shape[0] // dim_embd
    n_head = 2 ** n_head_exp  # the reference's guess (codeformer.py:630-633)
    return CodeFormerConfig(codebook_size=codebook, emb_dim=emb_dim,
                            dim_embd=dim_embd, n_head=n_head, n_layers=n_layers)


def load_codeformer(path: str):
    from stable_renderer_tpu.models.weights import load_state_dict, nest

    flat = load_state_dict(path)
    if any(k.startswith("params_ema.") for k in flat):
        flat = {k.split(".", 1)[1]: v for k, v in flat.items()
                if k.startswith("params_ema.")}
    cfg = detect_codeformer_config(flat)
    if cfg is None:
        raise ValueError(f"{path} is not a CodeFormer checkpoint")
    return CodeFormer(cfg), nest(flat)
