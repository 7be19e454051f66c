"""VAE decode profiler — stage-level in-jit timing (round-3 perf push).

Times full decode at 512^2 output + per-resolution conv micro-benches to find
where the ~41 ms goes. In-jit iteration (dispatch-floor-free).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12


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

    from stable_renderer_tpu.models import layers
    from stable_renderer_tpu.models.vae import SD15_VAE_CONFIG, VAE
    from stable_renderer_tpu.ops.flash_attention import use_pallas_attention

    use_pallas_attention(True)
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    vae = VAE(SD15_VAE_CONFIG)
    params = jax.jit(vae.init, static_argnames="dtype")(key, dtype=dt)
    z = jax.random.normal(key, (1, 64, 64, 4), dt)

    dec = jax.jit(lambda p, z: vae.decode(p, z))
    t = timed(dec, params, z, n=8)
    print(f"VAE decode 512^2 (1 dispatch): {t * 1e3:.2f} ms")

    x = jax.random.normal(key, (1, 512, 512, 3), dt)
    enc = jax.jit(lambda p, x: vae.encode(p, x))
    t = timed(enc, params, x, n=8)
    print(f"VAE encode 512^2: {t * 1e3:.2f} ms")

    # decoder conv shapes in-jit
    N = 20

    def loop(op):
        @jax.jit
        def run(xx, *rest):
            def body(i, acc):
                return op(acc, *rest) + 0.0 * i
            return jax.lax.fori_loop(0, N, body, xx)
        return run

    print("decoder conv3x3 (in-jit x20, b=1):")
    for (h, c) in [(64, 512), (128, 512), (256, 512), (256, 256), (512, 256), (512, 128)]:
        xs = jax.random.normal(key, (1, h, h, c), dt)
        w = jax.random.normal(key, (c, c, 3, 3), dt) * 0.02
        p = {"weight": w, "bias": jnp.zeros((c,), dt)}
        fl = 2 * h * h * 9 * c * c
        t = timed(loop(lambda a, p: layers.conv2d(p, a, padding=1) * 0.5), xs, p) / N
        print(f"  conv {h}x{h} c={c}: {t * 1e3:7.3f} ms  {fl / t / 1e12:6.1f} TF/s "
              f"{100 * fl / t / PEAK:5.1f}%")

    # full UNet check with small-L attention routing
    from stable_renderer_tpu.models.unet import SD15_UNET_CONFIG, UNetModel

    unet = UNetModel(SD15_UNET_CONFIG)
    up = jax.jit(unet.init, static_argnames="dtype")(key, dtype=dt)
    xb = jax.random.normal(key, (2, 64, 64, 4), dt)
    tb = jnp.full((2,), 500.0)
    cb = jax.random.normal(key, (2, 77, 768), dt)

    @jax.jit
    def run4(p, x, t, c):
        def body(i, acc):
            return unet.apply(p, acc, t, c) * 0.05 + acc
        return jax.lax.fori_loop(0, 4, body, x)

    t = timed(run4, up, xb, tb, cb, n=5) / 4
    print(f"UNet full in-jit (routed attn): {t * 1e3:.2f} ms/eval")


if __name__ == "__main__":
    main()
