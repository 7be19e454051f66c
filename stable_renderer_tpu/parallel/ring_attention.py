"""Ring attention over the frame-sharded mesh axis — sequence parallelism.

SURVEY.md section 2.6: the reference's OverlapCorresponder makes every frame
attend to selected frames' K/V (one broadcast); the scalable generalization —
every frame attending to ALL frames' K/V (sequence = frames x tokens) — needs
sequence parallelism when frames shard across chips. This module provides it as
a first-class component:

  * ``cross_frame_attention`` — single-device reference semantics: K/V of all N
    frames concatenated for every query frame.
  * ``ring_cross_frame_attention`` — the same math under ``shard_map`` over the
    'dp' (frame) axis: K/V blocks rotate around the ring via ``jax.lax.ppermute``
    while a running online-softmax accumulates, so no chip ever materializes the
    full K/V sequence. One round trip of the ring = N_dev - 1 permutes, fully
    overlapped by attention compute on each hop.

Numerically identical to the dense version (fp32 accumulators); tested on the
8-device virtual mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _mha(q, k, v, heads: int, scale: float):
    b, lq, hd = q.shape
    d = hd // heads
    qh = q.reshape(b, lq, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, hd)


def cross_frame_attention(
    q: jax.Array,  # (N, L, C) per-frame queries (token seq L per frame)
    k: jax.Array,  # (N, L, C)
    v: jax.Array,  # (N, L, C)
    heads: int,
) -> jax.Array:
    """Every frame attends to the concatenated K/V of ALL frames (dense)."""
    n, l, c = k.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(c // heads, jnp.float32))
    k_all = jnp.broadcast_to(k.reshape(1, n * l, c), (n, n * l, c))
    v_all = jnp.broadcast_to(v.reshape(1, n * l, c), (n, n * l, c))
    return _mha(q, k_all, v_all, heads, scale)


def ring_cross_frame_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    mesh: Mesh,
    axis: str = "dp",
) -> jax.Array:
    """cross_frame_attention with frames sharded over ``axis``: ring-rotated K/V
    with online softmax. q/k/v: (N, L, C) sharded on N."""
    c = q.shape[-1]
    d = c // heads
    scale = 1.0 / float(d**0.5)
    n_dev = mesh.shape[axis]

    def local_fn(q_loc, k_loc, v_loc):
        # q_loc: (n_local, L, C)
        nl, l, _ = q_loc.shape
        b = nl  # treat local frames as batch
        qh = q_loc.reshape(b, l, heads, d).transpose(0, 2, 1, 3)  # (b, H, L, d)

        def hop(carry, _):
            k_cur, v_cur, acc, m_run, l_run = carry
            kh = k_cur.reshape(-1, l, heads, d).transpose(0, 2, 1, 3)
            vh = v_cur.reshape(-1, l, heads, d).transpose(0, 2, 1, 3)
            # all local frames attend to every frame block in k_cur
            kh_all = kh.transpose(1, 0, 2, 3).reshape(1, heads, -1, d)
            vh_all = vh.transpose(1, 0, 2, 3).reshape(1, heads, -1, d)
            logits = (
                jnp.einsum("bhqd,xhkd->bhqk", qh, kh_all, preferred_element_type=jnp.float32)
                * scale
            )
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_run, m_cur)
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m_run - m_new)
            l_new = l_run * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.einsum(
                "bhqk,xhkd->bhqd", p.astype(vh_all.dtype), vh_all,
                preferred_element_type=jnp.float32,
            )
            # rotate K/V blocks around the ring
            k_next = jax.lax.ppermute(
                k_cur, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
            )
            v_next = jax.lax.ppermute(
                v_cur, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
            )
            return (k_next, v_next, acc_new, m_new, l_new), None

        acc0 = jnp.zeros((b, heads, l, d), jnp.float32)
        m0 = jnp.full((b, heads, l, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((b, heads, l, 1), jnp.float32)
        (k_fin, v_fin, acc, m_run, l_run), _ = jax.lax.scan(
            hop, (k_loc, v_loc, acc0, m0, l0), None, length=n_dev
        )
        out = (acc / jnp.maximum(l_run, 1e-30)).astype(q_loc.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, l, c)

    spec = P(axis, None, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)
