"""A/B the Pallas conv routing inside the FULL fused programs (the round-3
lesson: isolated-op wins can vanish or invert end-to-end — HWIO and
Pallas-GroupNorm both did). Measures the real UNet eval (SD1.5-class, cfg
batch 2, 64^2 latents) and the real VAE decode/encode at 512^2 with
use_pallas_conv off vs on (same process, fori marginals), plus exactness.

Run: JAX_PLATFORMS=axon python scripts/ab_conv_pallas.py [--int8]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
from stable_renderer_tpu.ops.conv_pallas import use_pallas_conv
from stable_renderer_tpu.ops.flash_attention import use_pallas_attention
from stable_renderer_tpu.workflow.config import RenderConfig


def _force(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def time_fori(step, x, k1=8, k2=24, reps=4, tag=""):
    def chain(k):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(0, k, lambda _, h: step(h), x)

        return f

    f1, f2 = chain(k1), chain(k2)
    t0 = time.time(); _force(f1(x)); _force(f2(x))
    print(f"    [{tag} compiled in {time.time()-t0:.0f}s]", flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); _force(f1(x)); ta = time.time() - t0
        t0 = time.time(); _force(f2(x)); tb = time.time() - t0
        best = min(best, (tb - ta) / (k2 - k1))
    return best


def main():
    int8 = "--int8" in sys.argv
    use_pallas_attention(jax.devices()[0].platform != "cpu")
    cfg = RenderConfig(prompt="bench", steps=4, cfg_scale=2.0, sampler="lcm",
                       scheduler="sgm_uniform")
    pipe = DiffusionPipeline.from_random(cfg, tiny=False)
    if int8:
        pipe.quantize_convs(vae=True, calibrate=True)
    up, vp, _ = pipe.compute_params()
    ucfg = pipe.unet.config
    dt = jnp.bfloat16

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, ucfg.in_channels), dt)
    t = jnp.full((2,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, ucfg.context_dim), dt) * 0.3
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 4), dt)
    px = jnp.tanh(jax.random.normal(jax.random.PRNGKey(3), (1, 512, 512, 3), dt))

    unet_step = lambda h: pipe.unet.apply(up, h, t, ctx)  # noqa: E731
    dec_step = lambda h: pipe.vae.decode(vp, h)[..., :1].mean() + h  # noqa: E731
    enc_step = lambda h: pipe.vae.encode_moments(vp, h)[..., :1].mean() + h  # noqa: E731

    results = {}
    outs = {}
    for mode in ("xla", "pallas"):
        use_pallas_conv(mode == "pallas")
        outs[mode] = (
            np.asarray(pipe.unet.apply(up, x, t, ctx), np.float32),
            np.asarray(pipe.vae.decode(vp, z), np.float32),
        )
        results[mode] = dict(
            unet=time_fori(unet_step, x, tag=f"unet/{mode}"),
            dec=time_fori(dec_step, z, tag=f"dec/{mode}"),
            enc=time_fori(enc_step, px, k1=4, k2=12, tag=f"enc/{mode}"),
        )
    uerr = float(np.abs(outs["xla"][0] - outs["pallas"][0]).max())
    derr = float(np.abs(outs["xla"][1] - outs["pallas"][1]).max())
    tag = "int8" if int8 else "bf16"
    print(f"\n[{tag}] unet eval (cfg2, 64^2): xla {results['xla']['unet']*1e3:.2f} ms"
          f" -> pallas {results['pallas']['unet']*1e3:.2f} ms"
          f" ({results['xla']['unet']/results['pallas']['unet']:.2f}x), max_err {uerr:.2e}")
    print(f"[{tag}] vae decode 512^2: xla {results['xla']['dec']*1e3:.2f} ms"
          f" -> pallas {results['pallas']['dec']*1e3:.2f} ms"
          f" ({results['xla']['dec']/results['pallas']['dec']:.2f}x), max_err {derr:.2e}")
    print(f"[{tag}] vae encode 512^2: xla {results['xla']['enc']*1e3:.2f} ms"
          f" -> pallas {results['pallas']['enc']*1e3:.2f} ms"
          f" ({results['xla']['enc']/results['pallas']['enc']:.2f}x)")


if __name__ == "__main__":
    main()
