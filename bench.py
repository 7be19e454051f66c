"""Headline benchmark: 512x512 img2img render-loop fps on TPU.

Reproduces the reference's realtime configuration (BASELINE.md: SD1.5-class UNet,
4 steps, cfg 2.0, lcm sampler + sgm_uniform scheduler, 512x512) as the full frame
step: rasterize scene -> pack EngineData (8x8 noise pooling + AdaIN) -> CLIP-
conditioned CFG denoise scan with cross-frame hooks -> VAE decode -> composite.
Weights are random (fps depends on architecture + shapes, not weight values).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = fps / 2.5 (the reference's published 2-3 fps midpoint,
reference README.md:45).

Env knobs: SR_BENCH_QUICK=1 -> tiny model + 64x64 (CI/debug); SR_BENCH_FRAMES.
--dp (or SR_BENCH_DP=1): bake-batched mode — 8 frames rendered as ONE dp-sharded
program over all local devices (the reference's baking_interval=8 batching,
renderManager.py:877-948); reports batched frames/s, so the v5e-8 projection is
(frames/s per chip) x 8 minus collective overhead, measured not extrapolated.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    quick = os.environ.get("SR_BENCH_QUICK") == "1"
    dp_mode = "--dp" in sys.argv or os.environ.get("SR_BENCH_DP") == "1"
    n_frames = int(os.environ.get("SR_BENCH_FRAMES", "8" if not quick else "4"))

    import jax

    # honor an explicit JAX_PLATFORMS=cpu (this image pins jax_platforms to
    # "axon,cpu" internally, swallowing the env var)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.engine.mesh import Mesh
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.engine.render_exec import _draw_pass, mesh_device_buffers, pack_frame_data
    from stable_renderer_tpu.data.framebuffers import GBuffer
    from stable_renderer_tpu.ops.correspondence import OverlapCorresponder
    from stable_renderer_tpu.ops.gbuffer import DrawUniforms, RENDER_MODE_BAKING
    from stable_renderer_tpu.ops.postprocess import PostProcessParams, post_process
    from stable_renderer_tpu.ops.transforms import look_at, perspective, translate
    from stable_renderer_tpu.workflow.config import RenderConfig

    if jax.devices()[0].platform != "cpu" and os.environ.get("SR_NO_PALLAS") != "1":
        from stable_renderer_tpu.ops.flash_attention import use_pallas_attention

        use_pallas_attention(True)

    size = 64 if quick else 512
    cfg = RenderConfig(
        prompt="a ball", steps=4, cfg_scale=2.0, sampler="lcm",
        scheduler="sgm_uniform", denoise=1.0,
    )
    pipe = DiffusionPipeline.from_random(cfg, tiny=quick)
    corresponder = OverlapCorresponder(
        vertex_segments=size * size, update_corrmap=False
    )

    mesh = Mesh.Sphere(1.0, 48)
    buffers = mesh_device_buffers(mesh)
    view = look_at(jnp.asarray([0.0, 0.5, 3.0]), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]))
    proj = perspective(45.0, 1.0, 0.1, 100.0)
    uniforms = DrawUniforms(sprite_id=1, material_id=1, render_mode=RENDER_MODE_BAKING, corrmap_k=3)
    bg_noise = jax.random.normal(jax.random.PRNGKey(7), (1, size, size, 4))
    noise_tex = jax.random.normal(jax.random.PRNGKey(3), (256, 256, 4))
    ctx, nctx = pipe.encode_prompts(["a ball"], [""])
    from stable_renderer_tpu.models.sampling import calculate_sigmas

    sigmas = jnp.asarray(
        calculate_sigmas(pipe.model_sampling, cfg.scheduler, cfg.steps, cfg.denoise)
    )

    if dp_mode:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from stable_renderer_tpu.data.engine_data import EngineData
        from stable_renderer_tpu.parallel import create_mesh

        n_dev = jax.device_count()
        batch = max(8, n_dev)  # the reference's baking_interval=8, >=1 frame/chip
        dmesh = create_mesh({"dp": n_dev, "tp": 1})

        # rasterize + pack `batch` frames once (the bake accumulation phase)
        packs = []
        for i in range(batch):
            model = translate(jnp.asarray([0.0, 0.0, 0.0]))
            gbuf, zbuf = GBuffer.empty(size, size), jnp.ones((size, size))
            gbuf, zbuf = _draw_pass(
                gbuf, zbuf, buffers, view @ model, proj, uniforms, size, size,
                noise=noise_tex,
            )
            packs.append(pack_frame_data(gbuf, bg_noise, i))
        ed = EngineData(
            frame_indices=jnp.arange(batch),
            color_maps=jnp.stack([p["color"] for p in packs]),
            id_maps=jnp.stack([p["id"] for p in packs]),
            noise_maps=jnp.stack([p["noise"] for p in packs]),
        )

        def submit(key):
            return pipe.render(ed, corresponder=corresponder, key=key, mesh=dmesh)

        t0 = time.time()
        out = submit(jax.random.PRNGKey(0))
        _ = np.asarray(out[0, 0, 0])
        compile_s = time.time() - t0
        iters = max(1, n_frames // batch) * 2
        t0 = time.time()
        for i in range(iters):
            out = submit(jax.random.PRNGKey(i))
            _ = np.asarray(out[0, 0, 0])
        dt = time.time() - t0
        fps = iters * batch / dt
        platform = jax.devices()[0].platform
        print(json.dumps({
            "metric": f"bake-batched img2img frames/s @ {size}x{size}, "
                      f"4-step LCM cfg2, batch={batch}, dp={n_dev} ({platform})",
            "value": round(fps, 3),
            "unit": "frames/s",
            "vs_baseline": round(fps / 2.5, 3),
        }))
        print(
            f"# compile {compile_s:.1f}s, {iters}x{batch} frames in {dt:.2f}s, "
            f"devices={n_dev}",
            file=sys.stderr,
        )
        return

    def frame(angle: float, key):
        model = translate(jnp.asarray([0.0, 0.0, 0.0]))
        gbuf, zbuf = GBuffer.empty(size, size), jnp.ones((size, size))
        gbuf, zbuf = _draw_pass(
            gbuf, zbuf, buffers, view @ model, proj, uniforms, size, size,
            noise=noise_tex,
        )
        pack = pack_frame_data(gbuf, bg_noise, 0)
        images = pipe._jit_render(
            corresponder,
            (),
            pipe.unet_params,
            pipe.vae_params,
            (),
            pack["color"][None],
            pack["noise"][None],
            pack["id"][None],
            (),
            ctx,
            nctx,
            sigmas,
            key,
        )
        out = post_process(
            jnp.concatenate([images[0], jnp.ones_like(images[0][..., :1])], -1),
            PostProcessParams(),
        )
        return out

    # warmup/compile
    t0 = time.time()
    out = frame(0.0, jax.random.PRNGKey(0))
    _ = np.asarray(out[0, 0])
    compile_s = time.time() - t0

    # Force a device->host readback of one pixel per frame: on this runtime
    # block_until_ready alone does not guarantee execution finished, and a real
    # render loop reads every frame out anyway (WindowManager.present).
    t0 = time.time()
    for i in range(n_frames):
        out = frame(float(i), jax.random.PRNGKey(i))
        _ = np.asarray(out[0, 0])
    dt = time.time() - t0
    fps = n_frames / dt

    platform = jax.devices()[0].platform
    result = {
        "metric": f"img2img render-loop fps @ {size}x{size}, 4-step LCM cfg2 ({platform})",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 2.5, 3),
    }
    print(json.dumps(result))
    print(
        f"# compile {compile_s:.1f}s, {n_frames} frames in {dt:.2f}s, device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
