"""Conv3x3 implementation sweep on TPU — hunting the UNet conv headroom.

profile_unet2.py shows lax.conv_general_dilated at 26-32% of bf16 peak on the
UNet's hot shapes (and 10% at 8x8). This sweeps alternative formulations of
the SAME math (in-jit x40, like profile_unet2):

  base     lax.conv NHWC/OIHW (current layers.conv2d)
  hwio     lax.conv with pre-transposed HWIO weights (no per-call transpose)
  shift9   sum of 9 shifted 1x1 matmuls (pad once, slice, (B*H*W,Ci)@(Ci,Co))
  im2col   explicit patch extraction -> one (B*H*W, 9*Ci)@(9*Ci, Co) matmul
  matmul   reference upper bound: the equivalent-FLOPs plain GEMM

Run: python scripts/sweep_conv.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12
N = 40


def _force(r):
    import numpy as np

    return float(np.asarray(r.reshape(-1)[0]))


def timed(fn, *args, n=5):
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

    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def loop(op):
        @jax.jit
        def run(x, *rest):
            def body(i, acc):
                return op(acc, *rest) * 0.5
            return jax.lax.fori_loop(0, N, body, x)
        return run

    for (b, h, c) in [(2, 64, 320), (2, 32, 640), (2, 16, 1280), (2, 8, 1280),
                      (8, 64, 320), (8, 16, 1280)]:
        x = jax.random.normal(key, (b, h, h, c), dt)
        w_oihw = jax.random.normal(key, (c, c, 3, 3), dt) * 0.02
        w_hwio = jnp.transpose(w_oihw, (2, 3, 1, 0))       # (kh,kw,I,O)
        w_flat = w_hwio.reshape(9 * c, c)                   # (9*Ci, Co)
        flops = 2 * b * h * h * 9 * c * c

        def base(a, w):
            return jax.lax.conv_general_dilated(
                a, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "OIHW", "NHWC"))

        def hwio(a, w):
            return jax.lax.conv_general_dilated(
                a, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def shift9(a, w):
            # pad once; each tap is a slice -> (B*H*W, Ci) @ (Ci, Co)
            ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = None
            for dy in range(3):
                for dx in range(3):
                    tap = jax.lax.dynamic_slice(
                        ap, (0, dy, dx, 0), (b, h, h, c))
                    o = tap.reshape(b * h * h, c) @ w[dy * 3 + dx]
                    out = o if out is None else out + o
            return out.reshape(b, h, h, c)

        w_taps = w_hwio.reshape(9, c, c)

        def im2col(a, w):
            ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [jax.lax.dynamic_slice(ap, (0, dy, dx, 0), (b, h, h, c))
                    for dy in range(3) for dx in range(3)]
            patches = jnp.concatenate(cols, axis=-1).reshape(b * h * h, 9 * c)
            return (patches @ w).reshape(b, h, h, c)

        def gemm(a, w):
            return (a.reshape(b * h * h, c) @ w[: c]).reshape(b, h, h, c)

        w_sq = w_flat[:c]  # (Ci, Co) for the GEMM bound (1/9 of flops)
        rows = [
            ("base", base, w_oihw, flops),
            ("hwio", hwio, w_hwio, flops),
            ("shift9", shift9, w_taps, flops),
            ("im2col", im2col, w_flat, flops),
            ("gemm1x1", gemm, w_sq, flops // 9),
        ]
        print(f"-- b={b} {h}x{h} c={c}")
        for name, fn, w, fl in rows:
            try:
                t = timed(loop(fn), x, w) / N
            except Exception as ex:  # pragma: no cover
                print(f"  {name:<8s} FAILED {type(ex).__name__}")
                continue
            print(f"  {name:<8s} {t * 1e3:8.3f} ms  {fl / t / 1e12:7.1f} TF/s "
                  f" {100 * fl / t / PEAK_BF16:5.1f}% peak")


if __name__ == "__main__":
    main()
