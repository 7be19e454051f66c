"""Ring cross-frame attention benchmark (VERDICT r2 weak #8).

Measures the all-frames cross-frame attention path — the long-context
mechanism behind OverlapCorresponder(all_frames=True) — in its two forms:

  * dense: every chip materializes the full (frames x tokens) K/V
    (the all-gather formulation);
  * ring:  K/V blocks rotate via ppermute, online-softmax accumulation —
    no chip ever holds the full sequence (parallel/ring_attention.py).

Run on the 8-device virtual CPU mesh by default (the same harness the
correctness tests use); on a real multi-chip TPU slice the same script
measures the ICI-backed path. Reports wall time and the per-chip K/V
working-set ratio (the reason the ring exists).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
       python scripts/bench_ring_attention.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def timed(fn, *args, n=5, warmup=2):
    import numpy as np

    for _ in range(warmup):
        r = fn(*args)
    np.asarray(r).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(r).ravel()[0]
    return (time.perf_counter() - t0) / n


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stable_renderer_tpu.parallel import create_mesh
    from stable_renderer_tpu.parallel.ring_attention import (
        cross_frame_attention,
        ring_cross_frame_attention,
    )

    n_dev = jax.device_count()
    mesh = create_mesh({"dp": n_dev})
    print(f"devices: {n_dev} ({jax.devices()[0].platform})")

    if jax.devices()[0].platform == "cpu":
        print("NOTE: on the virtual CPU mesh, wall times reflect the host "
              "emulation of shard_map collectives, NOT TPU behavior — the "
              "per-chip K/V working-set column is the transferable result; "
              "run on a real slice for ICI timings.")
    heads = 8
    results = {}
    for frames, tokens, c in [(8, 256, 320), (16, 256, 320), (8, 1024, 320)]:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (frames, tokens, c), jnp.float32)
        sh = NamedSharding(mesh, P("dp"))
        qs = jax.device_put(q, sh)

        dense = jax.jit(lambda a: cross_frame_attention(a, a, a, heads))
        t_dense = timed(dense, qs)

        ring = jax.jit(
            lambda a: ring_cross_frame_attention(a, a, a, heads, mesh, "dp"))
        t_ring = timed(ring, qs)

        # exactness check while we're here
        import numpy as np

        np.testing.assert_allclose(
            np.asarray(dense(qs)), np.asarray(ring(qs)), atol=2e-4)

        seq = frames * tokens
        kv_full = seq * c * 4 * 2 / 1e6       # dense per-chip K/V MB
        kv_ring = (seq // n_dev) * c * 4 * 2 / 1e6
        label = f"frames={frames} tokens={tokens}"
        results[label] = (t_dense, t_ring, kv_full, kv_ring)
        print(f"  {label}: dense {t_dense * 1e3:8.2f} ms | ring {t_ring * 1e3:8.2f} ms | "
              f"per-chip KV {kv_full:.0f} MB -> {kv_ring:.0f} MB "
              f"({n_dev}x smaller)")

    print("\nring holds 1/n_dev of the K/V per chip at equal math; on a real "
          "slice the ppermute rides ICI (collective-permute), so the ring is "
          "the scalable form when frames x tokens outgrows HBM.")


if __name__ == "__main__":
    main()
