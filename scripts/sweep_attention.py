"""Flash-attention block-size / exp2 sweep at the SD1.5 hot shape (round-3).

Sweeps (block_q, block_k) x exp-vs-exp2 for ops/flash_attention.flash_attention
at L=4096 D=40 (the level-0 self-attention that dominates the UNet), plus the
official jax pallas TPU flash kernel and the XLA einsum for reference.
In-jit x40 iteration (profile_unet2 methodology: defeats the dispatch floor).
"""

from __future__ import annotations

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(r):
    import numpy as np

    return float(np.asarray(r.reshape(-1)[0]))


def timed(fn, *args, n=5, warmup=1):
    r = None
    for _ in range(warmup):
        r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0) / n


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 40
    b, heads, l, d = 2, 8, 4096, 40
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, l, heads * d), jnp.bfloat16)

    def loop(op):
        @jax.jit
        def run(x):
            def body(i, acc):
                return op(acc) + 0.0 * i
            return jax.lax.fori_loop(0, N, body, x)
        return run

    # ---- variant kernel with exp2 + configurable blocks -------------------
    _NEG_INF = -1e30
    LOG2E = 1.4426950408889634

    def kern(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, kv_len, sm_scale, use_exp2):
        ki = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ki == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

        qq = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        scale = sm_scale * (LOG2E if use_exp2 else 1.0)
        logits = jax.lax.dot_general(
            qq, kk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        bk = kk.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + ki * bk
        logits = jnp.where(col < kv_len, logits, _NEG_INF)
        m_prev = m_ref[:]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        if use_exp2:
            p = jnp.exp2(logits - m_new)
            corr = jnp.exp2(m_prev - m_new)
        else:
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m_prev - m_new)
        l_new = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new
        l_ref[:] = l_new

        @pl.when(ki == nk - 1)
        def _fin():
            o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)

    def variant(bq, bk, use_exp2, d_pad=128):
        def attn(x):
            qh = x.reshape(b, l, heads, d).transpose(0, 2, 1, 3).reshape(b * heads, l, d)
            qp = jnp.pad(qh, ((0, 0), (0, 0), (0, d_pad - d)))
            grid = (b * heads, l // bq, l // bk)
            out = pl.pallas_call(
                functools.partial(kern, kv_len=l, sm_scale=1 / math.sqrt(d),
                                  use_exp2=use_exp2),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, bq, d_pad), lambda bb, qi, ki: (bb, qi, 0)),
                    pl.BlockSpec((1, bk, d_pad), lambda bb, qi, ki: (bb, ki, 0)),
                    pl.BlockSpec((1, bk, d_pad), lambda bb, qi, ki: (bb, ki, 0)),
                ],
                out_specs=pl.BlockSpec((1, bq, d_pad), lambda bb, qi, ki: (bb, qi, 0)),
                out_shape=jax.ShapeDtypeStruct((b * heads, l, d_pad), x.dtype),
                scratch_shapes=[
                    pltpu.VMEM((bq, d_pad), jnp.float32),
                    pltpu.VMEM((bq, 1), jnp.float32),
                    pltpu.VMEM((bq, 1), jnp.float32),
                ],
            )(qp, qp, qp)
            out = out[:, :, :d].reshape(b, heads, l, d).transpose(0, 2, 1, 3)
            return out.reshape(b, l, heads * d)
        return attn

    flops = 4 * b * l * l * heads * d
    print(f"shape b={b} h={heads} L={l} D={d}; true-dim GFLOP={flops / 1e9:.1f}")
    for bq, bk in [(256, 512), (512, 512), (256, 1024), (512, 1024),
                   (128, 512), (1024, 512), (512, 2048)]:
        for use_exp2 in (False, True):
            try:
                t = timed(loop(variant(bq, bk, use_exp2)), q) / N
                print(f"  bq={bq:4d} bk={bk:4d} exp2={int(use_exp2)}: "
                      f"{t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")
            except Exception as e:  # noqa: BLE001
                print(f"  bq={bq:4d} bk={bk:4d} exp2={int(use_exp2)}: FAIL {str(e)[:80]}")

    # d_pad=64 probe: half the contraction padding, if mosaic allows it
    for bq, bk in [(256, 512), (512, 1024)]:
        try:
            t = timed(loop(variant(bq, bk, True, d_pad=64)), q) / N
            print(f"  bq={bq:4d} bk={bk:4d} exp2=1 dpad=64: {t * 1e3:7.3f} ms  "
                  f"{flops / t / 1e12:6.1f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"  dpad=64 bq={bq}: FAIL {str(e)[:80]}")

    # official jax pallas TPU flash attention
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as official_fa,
        )

        def off(x):
            qh = x.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
            o = official_fa(qh, qh, qh, sm_scale=1 / math.sqrt(d))
            return o.transpose(0, 2, 1, 3).reshape(b, l, heads * d)

        t = timed(loop(off), q) / N
        print(f"  official pallas fa: {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")
    except Exception as e:  # noqa: BLE001
        print(f"  official pallas fa: FAIL {str(e)[:120]}")

    # current repo kernel for reference
    from stable_renderer_tpu.ops.flash_attention import attention_pallas

    t = timed(loop(lambda x: attention_pallas(x, x, x, heads)), q) / N
    print(f"  repo attention_pallas: {t * 1e3:7.3f} ms  {flops / t / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
