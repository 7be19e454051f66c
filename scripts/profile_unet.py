"""UNet micro-profiler — find where the 30 ms/eval goes (round-3 perf push).

Times the full SD1.5-class UNet eval plus micro-benchmarks of its building
blocks (conv3x3 at each level's shape, self-attention at each sequence length,
group-norm, linear) against the v5e bf16 roofline, so the MFU gap can be
attributed to specific ops instead of guessed at.

Run: python scripts/profile_unet.py            (real TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12  # v5e per-chip peak


def _force(r) -> float:
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def timed(fn, n=20, warmup=3):
    r = None
    for _ in range(warmup):
        r = fn()
    _force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _force(r)
    return (time.perf_counter() - t0) / n, r


def row(name, t, flops=None):
    mfu = "" if not flops else f"  {flops / t / 1e12:7.1f} TF/s  {100 * flops / t / PEAK_BF16:5.1f}% peak"
    print(f"{name:<42s} {t * 1e3:8.3f} ms{mfu}")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.models import layers
    from stable_renderer_tpu.models.unet import AttnHooks, SD15_UNET_CONFIG, UNetModel
    from stable_renderer_tpu.ops.flash_attention import attention_pallas, use_pallas_attention

    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # ---- full UNet ----------------------------------------------------------
    unet = UNetModel(SD15_UNET_CONFIG)
    params = jax.jit(unet.init, static_argnames="dtype")(key, dtype=dt)
    b = 2
    x = jax.random.normal(key, (b, 64, 64, 4), dt)
    t_arr = jnp.full((b,), 500.0)
    ctx = jax.random.normal(key, (b, 77, 768), dt)

    use_pallas_attention(True)
    f = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
    t_full, _ = timed(lambda: f(params, x, t_arr, ctx))
    row("UNet full (pallas attn)", t_full)

    use_pallas_attention(False)
    f2 = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
    t_xla, _ = timed(lambda: f2(params, x, t_arr, ctx))
    row("UNet full (xla attn)", t_xla)

    use_pallas_attention(True)
    ident = AttnHooks(attn=lambda q, k, v, h, l: q)
    f3 = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c, hooks=ident))
    t_noattn, _ = timed(lambda: f3(params, x, t_arr, ctx))
    row("UNet self-attn==identity", t_noattn)
    print(f"  -> self-attention total ~ {(t_full - t_noattn) * 1e3:.2f} ms")

    # ---- conv micro ---------------------------------------------------------
    print("\nconv3x3 (NHWC, OIHW weights then HWIO):")
    for (h, c_in, c_out) in [(64, 320, 320), (32, 640, 640), (16, 1280, 1280), (8, 1280, 1280), (64, 640, 320)]:
        xs = jax.random.normal(key, (b, h, h, c_in), dt)
        w = jax.random.normal(key, (c_out, c_in, 3, 3), dt) * 0.02
        p = {"weight": w, "bias": jnp.zeros((c_out,), dt)}
        fl = 2 * b * h * h * 9 * c_in * c_out
        fc = jax.jit(lambda p, xs: layers.conv2d(p, xs, padding=1))
        t, _ = timed(lambda: fc(p, xs))
        row(f"  conv {h}x{h} {c_in}->{c_out} OIHW", t, fl)
        wh = jnp.transpose(w, (2, 3, 1, 0))  # HWIO

        def conv_hwio(wh, xs):
            out = jax.lax.conv_general_dilated(
                xs, wh, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out
        fh = jax.jit(conv_hwio)
        t2, _ = timed(lambda: fh(wh, xs))
        row(f"  conv {h}x{h} {c_in}->{c_out} HWIO", t2, fl)

    # ---- attention micro ----------------------------------------------------
    print("\nself-attention (b=2, heads=8):")
    for (l, c) in [(4096, 320), (1024, 640), (256, 1280)]:
        q = jax.random.normal(key, (b, l, c), dt)
        fl = 2 * 2 * b * l * l * c  # QK^T + PV, true head_dim
        fp = jax.jit(lambda q: attention_pallas(q, q, q, 8))
        t, _ = timed(lambda: fp(q))
        row(f"  attn L={l} C={c} pallas", t, fl)
        fx = jax.jit(lambda q: layers.attention.__wrapped__(q, q, q, 8)
                     if hasattr(layers.attention, "__wrapped__") else None)
        # call the einsum path directly (bypass _attention_impl)
        def einsum_attn(q):
            import jax.numpy as jnp
            bq, lq, hd = q.shape
            d = hd // 8
            qh = q.reshape(bq, lq, 8, d).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh, qh, preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits / (d ** 0.5), axis=-1).astype(q.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", w, qh)
            return o.transpose(0, 2, 1, 3).reshape(bq, lq, hd)
        fe = jax.jit(einsum_attn)
        t2, _ = timed(lambda: fe(q))
        row(f"  attn L={l} C={c} xla", t2, fl)

    # ---- group norm ---------------------------------------------------------
    print("\ngroup_norm (32 groups, fp32 stats):")
    for (h, c) in [(64, 320), (32, 640), (16, 1280)]:
        xs = jax.random.normal(key, (b, h, h, c), dt)
        p = {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        fg = jax.jit(lambda p, xs: layers.group_norm(p, xs))
        t, _ = timed(lambda: fg(p, xs))
        bytes_ = b * h * h * c * 2 * 2  # read+write bf16
        print(f"  gn {h}x{h}x{c}: {t * 1e3:7.3f} ms  ({bytes_ / t / 1e9:6.1f} GB/s eff)")

    # ---- linear micro -------------------------------------------------------
    print("\nlinear:")
    for (l, i, o) in [(4096, 320, 320), (4096, 320, 2560), (1024, 640, 5120), (256, 1280, 10240)]:
        xs = jax.random.normal(key, (b, l, i), dt)
        p = {"weight": jax.random.normal(key, (o, i), dt) * 0.02, "bias": jnp.zeros((o,), dt)}
        fl = 2 * b * l * i * o
        fn = jax.jit(lambda p, xs: layers.linear(p, xs))
        t, _ = timed(lambda: fn(p, xs))
        row(f"  linear L={l} {i}->{o}", t, fl)

    # ---- batch scaling ------------------------------------------------------
    print("\nUNet batch scaling (pallas attn):")
    use_pallas_attention(True)
    for bb in [1, 2, 4, 8]:
        xb = jax.random.normal(key, (bb, 64, 64, 4), dt)
        tb = jnp.full((bb,), 500.0)
        cb = jax.random.normal(key, (bb, 77, 768), dt)
        fb = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
        t, _ = timed(lambda: fb(params, xb, tb, cb), n=10)
        print(f"  b={bb}: {t * 1e3:7.2f} ms  ({t * 1e3 / bb:6.2f} ms/frame)")


if __name__ == "__main__":
    main()
