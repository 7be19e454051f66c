"""UNet micro-profiler v2 — in-jit repetition defeats the axon dispatch floor.

The v1 profiler (profile_unet.py) showed every per-op dispatch costs ~1.4 ms
through the tunnel, flooring all micro numbers. Here each op is iterated N
times INSIDE one jitted fori_loop (shape-preserving, data-dependent chain so
XLA cannot elide iterations), so per-op cost = (t_loop - t_overhead) / N.

Run: python scripts/profile_unet2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12


def _force(r):
    import numpy as np

    return float(np.asarray(r.reshape(-1)[0]))


def timed_call(fn, *args, n=5, warmup=1):
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
    from stable_renderer_tpu.models.unet import SD15_UNET_CONFIG, UNetModel
    from stable_renderer_tpu.ops.flash_attention import attention_pallas

    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    N = 40  # iterations inside the jit

    def loop(op):
        @jax.jit
        def run(x, *rest):
            def body(i, acc):
                return op(acc, *rest) + 0.0 * i  # data-dep chain
            return jax.lax.fori_loop(0, N, body, x)
        return run

    def report(name, t_loop, flops=None, bytes_=None):
        t = t_loop / N
        extra = ""
        if flops:
            extra += f"  {flops / t / 1e12:7.1f} TF/s  {100 * flops / t / PEAK_BF16:5.1f}% peak"
        if bytes_:
            extra += f"  {bytes_ / t / 1e9:7.0f} GB/s"
        print(f"{name:<40s} {t * 1e3:8.3f} ms{extra}")

    b = 2
    # ---- conv3x3 shape-preserving ----
    print("conv3x3 (in-jit x40):")
    for (h, c) in [(64, 320), (32, 640), (16, 1280), (8, 1280)]:
        xs = jax.random.normal(key, (b, h, h, c), dt)
        w = jax.random.normal(key, (c, c, 3, 3), dt) * 0.02
        p = {"weight": w, "bias": jnp.zeros((c,), dt)}
        f = loop(lambda a, p: layers.conv2d(p, a, padding=1) * 0.5)
        t = timed_call(f, xs, p)
        report(f"  conv {h}x{h} c={c}", t, flops=2 * b * h * h * 9 * c * c)

    # ---- attention shape-preserving (q=k=v=acc) ----
    print("self-attention (in-jit x40, b=2 heads=8):")
    for (l, c) in [(4096, 320), (1024, 640), (256, 1280)]:
        q = jax.random.normal(key, (b, l, c), dt)
        fp = loop(lambda a: attention_pallas(a, a, a, 8))
        t = timed_call(fp, q)
        # true-dim flops (the MXU pays padded: xD_pad/D per-head)
        report(f"  attn L={l} C={c} pallas", t, flops=4 * b * l * l * c)
        fx = loop(lambda a: layers.attention.__call__(a, a, a, 8)
                  if layers._attention_impl is None else None)

        def einsum_attn(a):
            d = c // 8
            qh = a.reshape(b, l, 8, d).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, qh,
                                preferred_element_type=jnp.float32) / (d ** 0.5)
            wt = jax.nn.softmax(logits, axis=-1).astype(a.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", wt, qh)
            return o.transpose(0, 2, 1, 3).reshape(b, l, c)

        fe = loop(einsum_attn)
        t = timed_call(fe, q)
        report(f"  attn L={l} C={c} xla", t, flops=4 * b * l * l * c)

    # ---- group norm ----
    print("group_norm (in-jit x40):")
    for (h, c) in [(64, 320), (32, 640), (16, 1280)]:
        xs = jax.random.normal(key, (b, h, h, c), dt)
        p = {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        f = loop(lambda a, p: layers.group_norm(p, a))
        t = timed_call(f, xs, p)
        report(f"  gn {h}x{h}x{c}", t, bytes_=b * h * h * c * 2 * 2)

    # ---- layer norm + linear (transformer guts) ----
    print("linear / layernorm (in-jit x40):")
    xs = jax.random.normal(key, (b, 4096, 320), dt)
    p = {"weight": jax.random.normal(key, (320, 320), dt) * 0.02,
         "bias": jnp.zeros((320,), dt)}
    f = loop(lambda a, p: layers.linear(p, a))
    report("  linear 4096x320->320", timed_call(f, xs, p),
           flops=2 * b * 4096 * 320 * 320)
    pn = {"weight": jnp.ones((320,)), "bias": jnp.zeros((320,))}
    f = loop(lambda a, p: layers.layer_norm(p, a))
    report("  layernorm 4096x320", timed_call(f, xs, pn),
           bytes_=b * 4096 * 320 * 2 * 2)

    # ---- full UNet (in-jit x4 chained via latent) ----
    unet = UNetModel(SD15_UNET_CONFIG)
    params = jax.jit(unet.init, static_argnames="dtype")(key, dtype=dt)
    ctx = jax.random.normal(key, (b, 77, 768), dt)
    t_arr = jnp.full((b,), 500.0)

    from stable_renderer_tpu.ops.flash_attention import use_pallas_attention

    for label, enable in (("pallas", True), ("xla", False)):
        use_pallas_attention(enable)

        @jax.jit
        def run4(p, x, t, c):
            def body(i, acc):
                return unet.apply(p, acc, t, c) * 0.05 + acc
            return jax.lax.fori_loop(0, 4, body, x)

        x = jax.random.normal(key, (b, 64, 64, 4), dt)
        t = timed_call(run4, params, x, t_arr, ctx, n=5) / 4
        print(f"UNet full in-jit ({label}): {t * 1e3:.2f} ms/eval")
    use_pallas_attention(True)


if __name__ == "__main__":
    main()
