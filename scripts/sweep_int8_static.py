"""Static-calibrated int8 conv path vs bf16 — same-process A/B on the TPU.

Round-3's dynamic-quant int8 regressed end-to-end (the per-conv max-reduce
serializes, PERF.md "Negative result"). Round 4 adds STATIC calibrated
activation scales (models/quant.py calibrate_act_scales): the quantize is a
fusable elementwise op. This script measures the full SD1.5-size UNet eval
(cfg batch 2, 64x64) and VAE 512^2 decode both ways, plus an output-fidelity
cosine, in ONE process so the comparison is tunnel-noise-free.

Run on the TPU: python scripts/sweep_int8_static.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(r):
    import numpy as np

    return float(np.asarray(jax.device_get(r)).reshape(-1)[0])


def timeit(fn, *args, n=3, inner=4):
    import jax

    r = fn(*args)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _force(r)
    return (time.perf_counter() - t0) / n / inner


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def main() -> None:
    from stable_renderer_tpu.models.quant import (
        calibrate_act_scales, quantize_tree,
    )
    from stable_renderer_tpu.models.unet import SD15_UNET_CONFIG, UNetModel
    from stable_renderer_tpu.models.vae import SD15_VAE_CONFIG, VAE
    from stable_renderer_tpu.models.weights import tree_to_hwio
    from stable_renderer_tpu.ops.flash_attention import use_pallas_attention

    use_pallas_attention(True)
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # ---- UNet ----
    unet = UNetModel(SD15_UNET_CONFIG)
    params = jax.jit(unet.init, static_argnames="dtype")(key, dtype=dt)
    x = jax.random.normal(key, (2, 64, 64, 4), dt)
    t = jnp.full((2,), 500.0)
    c = jax.random.normal(jax.random.fold_in(key, 1), (2, 77, 768), dt) * 0.35

    def loop_unet(p):
        @jax.jit
        def run(p, x, t, c):
            def body(i, acc):
                return unet.apply(p, acc, t, c) * 0.05 + acc
            return jax.lax.fori_loop(0, 4, body, x)
        return lambda: run(p, x, t, c)

    p_bf16 = tree_to_hwio(params)
    # jit ONCE per variant — constructing a fresh jit inside the timed call
    # would measure persistent-compile-cache loads (~1.3 s), not the program
    run_bf16 = loop_unet(p_bf16)
    t_bf16 = timeit(run_bf16, n=3, inner=4)
    print(f"UNet bf16:        {t_bf16 * 1e3:7.2f} ms/eval")

    print("calibrating UNet act scales...")
    scales = calibrate_act_scales(
        lambda p, *a: unet.apply(p, *a), params, x, t, c)
    print(f"  {len(scales)} convs calibrated")
    p_q = quantize_tree(params, scales)
    run_q = loop_unet(p_q)
    t_q = timeit(run_q, n=3, inner=4)
    print(f"UNet int8-static: {t_q * 1e3:7.2f} ms/eval  ({t_bf16 / t_q:.2f}x)")

    out_ref = jax.jit(lambda p: unet.apply(p, x, t, c))(p_bf16)
    out_q = jax.jit(lambda p: unet.apply(p, x, t, c))(p_q)
    print(f"UNet fidelity: cosine={cos(out_q, out_ref):.5f} "
          f"maxerr={float(jnp.max(jnp.abs(out_q.astype(jnp.float32) - out_ref.astype(jnp.float32)))):.4f}")

    # ---- VAE decode ----
    vae = VAE(SD15_VAE_CONFIG)
    vp = jax.jit(vae.init, static_argnames="dtype")(key, dtype=dt)
    z = jax.random.normal(key, (1, 64, 64, 4), dt)

    def loop_vae(p):
        @jax.jit
        def run(p, z):
            def body(i, acc):
                img = vae.decode(p, acc)
                return acc + 0.0 * img[:, :64, :64, :1].astype(acc.dtype)
            return jax.lax.fori_loop(0, 2, body, z)
        return lambda: run(p, z)

    vp_bf16 = tree_to_hwio(vp)
    vrun_bf16 = loop_vae(vp_bf16)
    tv_bf16 = timeit(vrun_bf16, n=3, inner=2)
    print(f"VAE decode bf16:        {tv_bf16 * 1e3:7.2f} ms")

    vs = calibrate_act_scales(lambda p, zz: vae.decode(p, zz), vp, z)
    vp_q = quantize_tree(vp, vs, min_pixels=128 * 128)  # pipeline policy
    vrun_q = loop_vae(vp_q)
    tv_q = timeit(vrun_q, n=3, inner=2)
    print(f"VAE decode int8-static: {tv_q * 1e3:7.2f} ms  ({tv_bf16 / tv_q:.2f}x)")

    img_ref = jax.jit(lambda p: vae.decode(p, z))(vp_bf16)
    img_q = jax.jit(lambda p: vae.decode(p, z))(vp_q)
    print(f"VAE fidelity: cosine={cos(img_q, img_ref):.5f} "
          f"maxerr={float(jnp.max(jnp.abs(img_q.astype(jnp.float32) - img_ref.astype(jnp.float32)))):.4f}")


if __name__ == "__main__":
    main()
