"""Diffusion-mode temporal A/B (VERDICT r3 weak #5 / next #6).

Runs the SAME moving scene + seeds through the REAL img2img render program
twice — OverlapCorresponder ON vs OFF — and scores temporal stability of the
outputs. With identical weights/noise, any flicker delta is attributable to
the correspondence machinery (pre-attn broadcast-KV + step_finished vertex
averaging, reference corresponder.py:157-377) working through the actual
sampler. Weights are random (a RELATIVE delta needs no checkpoint; pass
--ckpt for real weights), noise is vertex-anchored (cfg.vertex_noise).

Writes the result into PARITY.json under "diffusion_ab".

Usage: JAX_PLATFORMS=cpu python scripts/diffusion_ab.py [--ckpt FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def moving_scene(n_frames: int, size: int):
    """A textured square translating 1 px/frame with PERSISTENT vertex ids —
    the same surface point keeps its id across frames, so vertex_flicker
    measures true per-surface-point color stability."""
    import jax.numpy as jnp
    import numpy as np

    w = (size * 3) // 4  # large object: interior >> VAE-boundary halo
    vid = np.arange(w * w, dtype=np.int32).reshape(w, w) + 1
    # deterministic per-vertex texture (what a stable render should produce)
    rng = np.random.default_rng(0)
    tex = rng.uniform(0.2, 0.8, (w * w + 1, 3)).astype(np.float32)

    ids = np.zeros((n_frames, size, size, 4), np.int32)
    color = np.zeros((n_frames, size, size, 3), np.float32)
    for f in range(n_frames):
        ox = 4 + f  # slides right
        oy = 4
        ids[f, oy : oy + w, ox : ox + w, 3] = vid
        ids[f, oy : oy + w, ox : ox + w, 0] = 1
        color[f, oy : oy + w, ox : ox + w] = tex[vid]
    return jnp.asarray(color), jnp.asarray(ids)


def run(pipe, corresponder, color, ids, seed: int):
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.data.engine_data import EngineData

    ed = EngineData(
        frame_indices=jnp.arange(color.shape[0]),
        color_maps=color,
        id_maps=ids,
    )
    return pipe.render(ed, corresponder=corresponder, key=jax.random.PRNGKey(seed))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="real checkpoint (optional)")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.ops.correspondence import (
        DefaultCorresponder,
        OverlapCorresponder,
    )
    from stable_renderer_tpu.ops.metrics import temporal_flicker_l1, vertex_flicker
    from stable_renderer_tpu.workflow.config import RenderConfig

    cfg = RenderConfig(
        prompt="a textured square", steps=args.steps, cfg_scale=2.0,
        sampler="ddim", scheduler="sgm_uniform", denoise=0.6,
        vertex_noise=True,
    )
    if args.ckpt:
        pipe = DiffusionPipeline.from_checkpoint(args.ckpt, cfg)
    else:
        pipe = DiffusionPipeline.from_random(cfg, tiny=True)

    color, ids = moving_scene(args.frames, args.size)

    off = DefaultCorresponder(update_corrmap=False)
    # injection strength is a user knob; with random weights the model can't
    # PRESERVE early-step consistency the way trained weights do, so the A/B
    # runs the injection throughout (stop_inject_timestep=0) — the delta then
    # isolates the machinery (vertex averaging + broadcast-KV through the
    # real sampler), not the weights' denoising prior
    on = OverlapCorresponder(
        update_corrmap=False, vertex_segments=4096,
        pre_attn_frames=(0,), layer_range=None,  # inject at every layer
        step_finished_inject_ratio=0.8,
        step_finished_stop_inject_timestep=0.0,
    )

    frames_off = np.asarray(run(pipe, off, color, ids, seed=7))
    frames_on = np.asarray(run(pipe, on, color, ids, seed=7))

    import jax.numpy as jnp

    result = {}
    for name, frames in (("overlap_off", frames_off), ("overlap_on", frames_on)):
        result[name] = {
            "flicker_l1": float(temporal_flicker_l1(jnp.asarray(frames))),
            "vertex_flicker": float(
                vertex_flicker(jnp.asarray(frames), jnp.asarray(ids),
                               num_segments=4096)
            ),
        }
    result["delta"] = {
        k: result["overlap_on"][k] - result["overlap_off"][k]
        for k in ("flicker_l1", "vertex_flicker")
    }
    # ---- latent-level A/B: the mechanism, isolated from the decode --------
    # With random weights the VAE decode is a position-dependent random map,
    # so image-level flicker saturates regardless of latent consistency (a
    # REAL checkpoint's local/smooth decoder preserves it — rerun with
    # --ckpt for image-level evidence). The latent-level numbers below show
    # the injection doing its job through the real sampler.
    import jax.numpy as jnp

    from stable_renderer_tpu.models.sampling import samplers
    from stable_renderer_tpu.models.sampling.cfg import make_denoiser
    from stable_renderer_tpu.ops.correspondence import vertex_noise

    log_sigmas = jnp.asarray(pipe.model_sampling.log_sigmas)
    sigmas = pipe.scheduler_sigmas()
    x0 = pipe.vae.encode(pipe.vae_params, color * 2.0 - 1.0)
    lh, lw = x0.shape[1], x0.shape[2]
    nz = vertex_noise(jax.random.PRNGKey(7), ids, lh, lw, x0.shape[-1])
    ctx = jnp.zeros((color.shape[0], 7, pipe.unet.config.context_dim))

    def latent_run(corr):
        hooks = corr.attn_hooks(None, key=jax.random.PRNGKey(9))
        cb = corr.make_step_callback(ids, log_sigmas)
        den = make_denoiser(pipe.unet, pipe.unet_params, ctx, ctx, log_sigmas,
                            cfg_scale=2.0, hooks=hooks)
        return samplers.sample(den, nz, sigmas, latent_image=x0,
                               sampler="ddim", step_callback=cb)

    ids_lat = np.asarray(ids)[:, :: args.size // lh, :: args.size // lw]
    lat_result = {}
    for name, corr in (("overlap_off", off), ("overlap_on", on)):
        lat = latent_run(corr)
        lat01 = (lat - lat.min()) / (lat.max() - lat.min() + 1e-8)
        lat_result[name] = {
            "vertex_flicker_latent": float(
                vertex_flicker(lat01[..., :3], jnp.asarray(ids_lat),
                               num_segments=4096)),
        }
    lat_result["delta"] = {
        "vertex_flicker_latent":
            lat_result["overlap_on"]["vertex_flicker_latent"]
            - lat_result["overlap_off"]["vertex_flicker_latent"],
    }
    result["latent_level"] = lat_result

    result["config"] = {
        "frames": args.frames, "size": args.size, "steps": args.steps,
        "sampler": cfg.sampler, "denoise": cfg.denoise,
        "weights": "checkpoint" if args.ckpt else "random-tiny",
        "note": "same scene/seeds/noise through the real img2img loop; "
                "the only difference is the corresponder injection. "
                "latent_level isolates the mechanism from the (random-weight) "
                "VAE decode.",
    }
    print(json.dumps(result, indent=2))

    parity_path = Path(__file__).resolve().parents[1] / "PARITY.json"
    data = json.loads(parity_path.read_text()) if parity_path.exists() else {}
    data["diffusion_ab"] = result
    parity_path.write_text(json.dumps(data, indent=2) + "\n")
    print(f"written to {parity_path}")

    improved = lat_result["delta"]["vertex_flicker_latent"] < 0
    print("overlap-on reduces latent vertex flicker:", improved,
          f"({lat_result['delta']['vertex_flicker_latent']:+.4f})")


if __name__ == "__main__":
    main()
