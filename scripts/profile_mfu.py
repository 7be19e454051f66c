"""UNet MFU measurement — XLA-counted model flops / measured in-jit time.

VERDICT r2 asked for MEASURED MFU >= 35% on the realtime UNet eval. This
script computes it the defensible way: flops come from XLA's own
cost_analysis() of the compiled eval (algorithmic HLO flops, no padding
credit), time from an in-jit fori_loop (dispatch-floor-free through the axon
tunnel, PERF.md methodology), peak = 197 TF/s bf16 (TPU v5e).

Run on the TPU: `python scripts/profile_mfu.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12  # TPU v5e bf16


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stable_renderer_tpu.models.unet import SD15_UNET_CONFIG, UNetModel
    from stable_renderer_tpu.ops.flash_attention import use_pallas_attention

    use_pallas_attention(True)
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    unet = UNetModel(SD15_UNET_CONFIG)
    params = jax.jit(unet.init, static_argnames="dtype")(key, dtype=dt)
    # the realtime eval: cfg batch 2 (cond+uncond), 64x64 latent (512^2 px)
    x = jax.random.normal(key, (2, 64, 64, 4), dt)
    t = jnp.full((2,), 500.0)
    c = jax.random.normal(key, (2, 77, 768), dt)

    compiled = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c)).lower(
        params, x, t, c).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    print(f"XLA-counted flops per eval (batch 2): {flops / 1e12:.3f} TF")

    n = 4

    @jax.jit
    def run(p, x, t, c):
        def body(i, acc):
            return unet.apply(p, acc, t, c) * 0.05 + acc

        return jax.lax.fori_loop(0, n, body, x)

    r = run(params, x, t, c)
    np.asarray(r.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(3):
        r = run(params, x, t, c)
    np.asarray(r.reshape(-1)[0])
    dt_s = (time.perf_counter() - t0) / 3 / n
    print(f"UNet eval: {dt_s * 1e3:.2f} ms -> "
          f"MFU {flops / dt_s / PEAK * 100:.1f}% of 197 TF/s bf16 peak")


if __name__ == "__main__":
    main()
