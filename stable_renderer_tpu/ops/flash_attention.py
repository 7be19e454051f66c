"""Pallas flash attention — the fused attention kernel for the UNet hot path.

Replaces the reference's xformers/pytorch attention backends
(reference: comfy/ldm/modules/attention.py optimized_attention dispatch). At
512x512 the UNet's first self-attention works on 4096 tokens x 8 heads: the XLA
fallback materializes (B*H, 4096, 4096) logits in HBM (~64MB fp32 per layer per
CFG half) — this kernel keeps the whole online-softmax in VMEM, reading each K/V
tile once.

Design (TPU-shaped):
  * grid = (batch*heads, q_blocks); each program owns one (Bq, D) query tile.
  * K/V are streamed in (Bk, D) tiles by the Pallas pipeline; running max/sum
    accumulators implement the online softmax in fp32.
  * head_dim is zero-padded to a multiple of 128 lanes by the wrapper (SD1.5
    d=40 -> 128; the MXU would pad to lanes anyway, so this costs nothing extra
    over XLA while saving the HBM logits round-trip).
  * Non-causal (diffusion attention is bidirectional); cross-attention (Lk != Lq,
    e.g. 77 text tokens) pads K/V to a tile and masks via additive -inf.

``attention_auto`` picks this kernel on TPU for big sequences and falls back to
the XLA einsum path elsewhere (CPU tests, tiny shapes).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, kv_len: int, sm_scale: float, need_mask: bool):
    """One (q_tile, k_tile) step of online-softmax attention.

    Grid: (bh, num_q_blocks, num_k_blocks); the k axis is the innermost
    (sequential) dimension, so acc/m/l scratch carries across k steps.
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (Bq, D)
    k = k_ref[0]  # (Bk, D)
    v = v_ref[0]  # (Bk, D)

    # sm_scale is pre-folded into q by the wrapper (scaling L*D once beats an
    # L*L fp32 multiply per tile here)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, Bk)

    if need_mask:
        # mask padded K rows (beyond the true kv_len). Statically skipped when
        # kv_len divides block_k: the iota+compare+select over the full logits
        # tile costs about as much VPU time as the exp itself, and the hot
        # L=4096 self-attention shape never needs it.
        bk = k.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + ki * bk
        logits = jnp.where(col < kv_len, logits, _NEG_INF)

    m_prev = m_ref[:]                       # (Bq, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)             # (Bq, Bk)
    correction = jnp.exp(m_prev - m_new)    # (Bq, 1)
    l_new = l_ref[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jax.Array,  # (BH, Lq, D)
    k: jax.Array,  # (BH, Lk, D)
    v: jax.Array,  # (BH, Lk, D)
    block_q: int = 512,
    block_k: Optional[int] = None,
    # defaults from the round-3 on-chip sweeps (scripts/sweep_attention.py):
    # at the SD1.5 hot shape (L=4096, D=40, bh=16) bq=512/bk=4096 runs 1.03 ms
    # (vs 1.14 at bk=1024, 2.22 at the round-2 256/512) — with the whole K/V
    # in one k-step the online-softmax corrections vanish entirely. Large bk
    # costs VMEM (bq*bk fp32 logits + 2*bk*d_pad bf16 tiles), so wide-head
    # attention (VAE's d=512) caps bk at 1024.
) -> jax.Array:
    """Non-causal flash attention over merged batch-head leading axis."""
    bh, lq, d = q.shape
    lk = k.shape[1]
    sm_scale = 1.0 / math.sqrt(d)

    d_pad = _round_up(d, 128)
    if block_k is None:
        block_k = 4096 if d_pad <= 128 else 1024
    bq = min(block_q, _round_up(lq, 128))
    bk = min(block_k, _round_up(lk, 128))
    lq_pad = _round_up(lq, bq)
    lk_pad = _round_up(lk, bk)

    qp = jnp.pad(q * jnp.asarray(sm_scale, q.dtype), ((0, 0), (0, lq_pad - lq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, d_pad - d)))

    grid = (bh, lq_pad // bq, lk_pad // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=lk, sm_scale=sm_scale,
                          need_mask=lk_pad != lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d_pad), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
    )(qp, kp, vp)
    return out[:, :lq, :d]


def attention_pallas(
    q: jax.Array,  # (B, Lq, H*D)
    k: jax.Array,
    v: jax.Array,
    heads: int,
) -> jax.Array:
    """Drop-in replacement for layers.attention using the flash kernel.

    Routing (round-3 sweep, scripts/sweep_attention.py + trace analysis): the
    flash kernel wins only when the HBM logits round-trip matters, i.e. when
    the K/V sequence is long (lk >= 2048: 1.21 vs 3.04 ms at L=4096 self-attn);
    for short K/V the logits tensor is small and XLA's fused einsum is faster —
    that covers both short self-attention (0.185 vs 0.280 ms at L=1024) and
    CROSS-attention against 77 text tokens (lq=4096, lk=77: the device trace
    showed the flash kernel costing 0.225 ms there vs ~0.08 for the einsum,
    ~0.7 ms/UNet-eval across the five level-0 cross attentions)."""
    b, lq, hd = q.shape
    d = hd // heads
    lk = k.shape[1]
    if lk < 2048:
        scale = 1.0 / math.sqrt(d)
        qh = q.reshape(b, lq, heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, lk, heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, lk, heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        return out.transpose(0, 2, 1, 3).reshape(b, lq, hd)
    qh = q.reshape(b, lq, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, lq, d)
    kh = k.reshape(b, lk, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, lk, d)
    vh = v.reshape(b, lk, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, lk, d)
    out = flash_attention(qh, kh, vh)
    return out.reshape(b, heads, lq, d).transpose(0, 2, 1, 3).reshape(b, lq, hd)


def use_pallas_attention(enable: bool = True) -> None:
    """Route models.layers.attention through the Pallas flash kernel (TPU
    only). NOTE: the Pallas fused GroupNorm (ops/group_norm_pallas.py) is
    deliberately NOT routed here — measured A/B, a custom-call GN is a fusion
    barrier that forces relayout copies around every conv and regressed the
    full UNet 17.2 -> 33.4 ms/eval even though the kernel matches XLA's GN
    in isolation (see PERF.md "Negative result: Pallas GroupNorm")."""
    from stable_renderer_tpu.models import layers

    layers._attention_impl = attention_pallas if enable else None
