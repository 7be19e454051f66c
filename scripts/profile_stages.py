"""Per-stage timing of the realtime frame on the real chip -> PERF.md numbers.

Times (post-warmup, median of N):
  unet_eval     one UNet forward at the CFG batch (the denoise inner step)
  denoise_4     the full 4-step LCM cfg2 denoise scan
  vae_decode    512x512 decode
  raster_pack   draw + G-buffer pack
  frame_total   the fused frame_step program end-to-end
Also derives achieved TFLOP/s + MFU for the UNet from an analytic FLOP count.

Run: python scripts/profile_stages.py           (real TPU)
     SR_PROF_QUICK=1 python scripts/profile_stages.py   (tiny, CPU ok)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(r) -> float:
    """Force completion with a 1-element D2H fetch (the axon tunnel's
    block_until_ready returns before remote execution finishes)."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def timed(fn, n=10, warmup=2):
    """Amortized timing: dispatch n async calls back-to-back, force once at the
    end — the device queue stays busy, so the tunnel round-trip (~29 ms on
    this axon link) amortizes to RT/n per op instead of biasing every sample."""
    r = None
    for _ in range(warmup):
        r = fn()
    _force(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _force(r)
    return (time.perf_counter() - t0) / n, r


def unet_flops(cfg, latent_hw: int, batch: int) -> float:
    """Analytic forward FLOPs for the SD1.5-class UNet (convs + attn matmuls),
    good to ~10% — enough for an MFU estimate."""
    import numpy as np

    total = 0.0
    ch = cfg.model_channels
    res = latent_hw
    # rough per-level accounting: res blocks (2 convs 3x3) + transformer
    levels = list(enumerate(cfg.channel_mult))
    for li, mult in levels:
        c = ch * mult
        hw = (res // (2 ** li)) ** 2
        n_res = cfg.num_res_blocks * 2  # down path + up path has more, approximate x2.5
        conv_flops = n_res * 2.5 * (2 * hw * (3 * 3 * c) * c)
        total += conv_flops
        if li in cfg.attention_levels:
            l = hw
            # attn: qkv + proj (4*c^2*l) + 2*l^2*c, x2 (self+cross approx), x depth
            total += cfg.depth_at(li) * 2.5 * (2 * (4 * l * c * c) + 2 * (2 * l * l * c))
    return float(total * batch * 2)  # x2: MAC->FLOP already in 2*; batch


def main() -> None:
    quick = os.environ.get("SR_PROF_QUICK") == "1"
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.workflow.config import RenderConfig

    platform = jax.devices()[0].platform
    if platform != "cpu" and os.environ.get("SR_NO_PALLAS") != "1":
        from stable_renderer_tpu.ops.flash_attention import use_pallas_attention

        use_pallas_attention(True)

    size = 64 if quick else 512
    lat = size // 8
    cfg = RenderConfig(prompt="a ball", steps=4, cfg_scale=2.0, sampler="lcm",
                       scheduler="sgm_uniform")
    pipe = DiffusionPipeline.from_random(cfg, tiny=quick)
    ucfg = pipe.unet.config
    key = jax.random.PRNGKey(0)

    results = {}

    # --- unet_eval: one forward at CFG batch 2 ---
    x = jax.random.normal(key, (2, lat, lat, 4), jnp.bfloat16)
    t = jnp.full((2,), 500, jnp.int32)
    ctx = jax.random.normal(key, (2, 77, ucfg.context_dim), jnp.bfloat16)

    @jax.jit
    def unet_once(p, x, t, c):
        return pipe.unet.apply(p, x, t, c)

    ms, _ = timed(lambda: unet_once(pipe.unet_params, x, t, ctx))
    results["unet_eval_cfg2"] = ms
    fl = unet_flops(ucfg, lat, 2)
    results["unet_tflops"] = fl / ms / 1e12
    peak = 197e12 if platform == "tpu" else 1e12
    results["unet_mfu_pct"] = 100.0 * fl / ms / peak

    # --- vae decode ---
    z = jax.random.normal(key, (1, lat, lat, 4), jnp.bfloat16)

    @jax.jit
    def dec(p, z):
        return pipe.vae.decode(p, z)  # decode() applies 1/scale_factor itself

    ms, _ = timed(lambda: dec(pipe.vae_params, z))
    results["vae_decode"] = ms

    # --- full denoise (pipeline._jit_render on one frame) ---
    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.ops.correspondence import OverlapCorresponder

    ed = EngineData(
        frame_indices=jnp.arange(1),
        color_maps=jax.random.uniform(key, (1, size, size, 3)),
        noise_maps=jax.random.normal(key, (1, lat, lat, 4)),
    )
    corr = OverlapCorresponder(vertex_segments=size * size, update_corrmap=False)

    def full():
        return pipe.render(ed, corresponder=corr, key=key)

    ms, _ = timed(full, n=5)
    results["frame_denoise_decode"] = ms

    # --- raster + pack ---
    from stable_renderer_tpu.data.framebuffers import GBuffer
    from stable_renderer_tpu.engine.mesh import Mesh
    from stable_renderer_tpu.engine.render_exec import (
        _draw_pass,
        mesh_device_buffers,
        pack_frame_data,
    )
    from stable_renderer_tpu.ops.gbuffer import RENDER_MODE_BAKING, DrawUniforms
    from stable_renderer_tpu.ops.transforms import look_at, perspective, translate

    mesh = Mesh.Sphere(1.0, 48)
    buffers = mesh_device_buffers(mesh)
    view = look_at(jnp.asarray([0.0, 0.5, 3.0]), jnp.zeros(3),
                   jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(45.0, 1.0, 0.1, 100.0)
    uniforms = DrawUniforms(sprite_id=1, material_id=1,
                            render_mode=RENDER_MODE_BAKING, corrmap_k=3)
    bg = jax.random.normal(jax.random.PRNGKey(7), (1, size, size, 4))
    noise_tex = jax.random.normal(jax.random.PRNGKey(3), (256, 256, 4))

    def raster():
        g, z2 = _draw_pass(GBuffer.empty(size, size), jnp.ones((size, size)),
                           buffers, view @ translate(jnp.zeros(3)), proj,
                           uniforms, size, size, noise=noise_tex)
        return pack_frame_data(g, bg, 0)["noise"]

    ms, _ = timed(raster)
    results["raster_pack"] = ms

    print(f"# platform={platform} size={size} steps=4 cfg=2 sampler=lcm")
    for k, v in results.items():
        if k.endswith("_pct") or k.endswith("_tflops"):
            print(f"{k}: {v:.1f}")
        else:
            print(f"{k}: {v * 1000:.2f} ms")


if __name__ == "__main__":
    main()
