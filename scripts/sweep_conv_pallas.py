"""On-chip sweep: conv3x3_pallas vs XLA conv at the SD hot shapes.

Methodology (PERF.md measurement hygiene): per-op dispatches through the axon
tunnel cost ~1.4 ms, and block_until_ready returns early — so each measurement
jits a CHAIN of K dependent convs (alternating Cin->Cout->Cin weights so shapes
are preserved) and times the marginal cost between K and 2K chains, forcing a
scalar fetch. Run:  JAX_PLATFORMS=axon python scripts/sweep_conv_pallas.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from stable_renderer_tpu.ops.conv_pallas import conv3x3_pallas, conv3x3_reference

# (N, H, W, Cin, Cout) — UNet levels at 512^2 render (cfg batch 2) + VAE
# decoder levels (batch 1) + VAE encoder
SHAPES = [
    (2, 64, 64, 320, 320),
    (2, 32, 32, 640, 640),
    (2, 16, 16, 1280, 1280),
    (2, 8, 8, 1280, 1280),
    (1, 128, 128, 512, 512),
    (1, 256, 256, 512, 512),
    (1, 256, 256, 256, 256),
    (1, 512, 512, 256, 256),
    (1, 512, 512, 128, 128),
]


def _force(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0][(0,) * 4]))


def time_chain(make_step, x, k1=32, k2=96, reps=4, tag=""):
    """Marginal per-op seconds via in-jit fori_loop pair chains:
    ((t(k2) - t(k1)) / (k2 - k1)) / 2 ops per iteration. The big iteration
    counts push the signal far above the ~29 ms tunnel sync RT (unrolled
    4-vs-16 chains measured NEGATIVE marginals — pure tunnel noise; this is
    the PERF.md in-jit repetition methodology)."""

    def chain(k):
        @jax.jit
        def f(x):
            def body(_, h):
                return make_step(1)(make_step(0)(h))

            return jax.lax.fori_loop(0, k, body, x)

        return f

    f1, f2 = chain(k1), chain(k2)
    t0 = time.time(); _force(f1(x)); _force(f2(x))  # compile both
    print(f"    [{tag} compiled in {time.time()-t0:.0f}s]", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); _force(f1(x)); ta = time.time() - t0
        t0 = time.time(); _force(f2(x)); tb = time.time() - t0
        best = min(best, (tb - ta) / (k2 - k1) / 2)
    return best


def main():
    import os

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    shapes = SHAPES
    sel = os.environ.get("SR_SWEEP_SHAPES")  # e.g. "0,4,8"
    if sel:
        shapes = [SHAPES[int(i)] for i in sel.split(",")]
    rows = []
    for (n, h, w_img, ci, co) in shapes:
        x = jnp.asarray(rng.normal(size=(n, h, w_img, ci)), dt)
        wa = jnp.asarray(rng.normal(size=(3, 3, ci, co)) * 0.02, dt)
        wb = jnp.asarray(rng.normal(size=(3, 3, co, ci)) * 0.02, dt)
        ba = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
        bb = jnp.asarray(rng.normal(size=(ci,)), jnp.float32)
        gf = 2 * n * h * w_img * ci * co * 9 / 1e9

        def xla_step(i):
            w, b = (wa, ba) if i % 2 == 0 else (wb, bb)
            return lambda h_: conv3x3_reference(h_, w, b, act="silu")

        def pallas_step(i):
            w, b = (wa, ba) if i % 2 == 0 else (wb, bb)
            return lambda h_: conv3x3_pallas(h_, w, b, act="silu")

        # int8: quantize both chain weights, static act scale ~ running range
        wsa = np.abs(np.asarray(wa, np.float32)).max(axis=(0, 1, 2)) / 127.0
        wsb = np.abs(np.asarray(wb, np.float32)).max(axis=(0, 1, 2)) / 127.0
        wqa = jnp.asarray(np.round(np.asarray(wa, np.float32) / wsa).clip(-127, 127), jnp.int8)
        wqb = jnp.asarray(np.round(np.asarray(wb, np.float32) / wsb).clip(-127, 127), jnp.int8)
        a_s = float(np.abs(np.asarray(x, np.float32)).max() / 127.0)

        def int8_step(i):
            w, ws, b = (wqa, wsa, ba) if i % 2 == 0 else (wqb, wsb, bb)
            return lambda h_: conv3x3_pallas(
                h_, w, b, act="silu", a_scale=a_s, w_scale=jnp.asarray(ws))

        try:
            t_p = time_chain(pallas_step, x)
        except Exception as e:  # Mosaic lowering failure — report, keep going
            print(f"{(n,h,w_img,ci,co)}: PALLAS FAIL {type(e).__name__}: {str(e)[:120]}")
            t_p = float("nan")
        t_x = time_chain(xla_step, x)
        try:
            t_q = time_chain(int8_step, x)
        except Exception as e:
            print(f"{(n,h,w_img,ci,co)}: INT8 FAIL {type(e).__name__}: {str(e)[:120]}")
            t_q = float("nan")
        # exactness spot check on-chip
        err = float(jnp.max(jnp.abs(
            conv3x3_pallas(x, wa, ba).astype(jnp.float32)
            - conv3x3_reference(x, wa, ba).astype(jnp.float32))))
        rows.append((n, h, w_img, ci, co, t_x, t_p, t_q, err))
        print(f"{(n,h,w_img,ci,co)}: xla {t_x*1e3:7.3f} ms ({gf/t_x/1e3:6.1f} TF/s)"
              f" | pallas {t_p*1e3:7.3f} ms ({gf/t_p/1e3:6.1f} TF/s)"
              f" | int8 {t_q*1e3:7.3f} ms ({gf/t_q/1e3:6.1f} TF/s)"
              f" | err {err:.2e}", flush=True)

    print("\nshape, xla_ms, pallas_ms, int8_ms, pallas_speedup, int8_speedup")
    for (n, h, w_img, ci, co, t_x, t_p, t_q, err) in rows:
        print(f"{n}x{h}x{w_img}x{ci}->{co}, {t_x*1e3:.3f}, {t_p*1e3:.3f}, "
              f"{t_q*1e3:.3f}, {t_x/t_p:.2f}, {t_x/t_q:.2f}")


if __name__ == "__main__":
    main()
