"""Render OUR sequence for the temporal-flicker parity report (VERDICT r2 #2).

Two modes:

  * --mode replay (default): the product's temporal-consistency path end to
    end — bake a CorrespondMap from the reference's own miku color dumps
    (the same fixtures the reference's corrmap update_test uses,
    corrmap.py:893-936), then REPLAY it through the real engine (GAME mode,
    disableComfyUI, CorrMapRenderer in BAKED mode, orbiting camera) at 512².
    This measures the correspondence machinery that exists to kill temporal
    flicker; it needs no SD weights. Also dumps per-frame id maps so
    vertex_flicker (the correspondence-aware metric) can be scored.

  * --mode diffusion [--ckpt PATH]: the realtime img2img path over the
    reference fixtures (VirtualEngineData). Without --ckpt the UNet/VAE are
    RANDOM — a random model's output is texture noise, so flicker numbers are
    meaningless; pass a real SD1.5 checkpoint for a faithful measurement
    (documented in PARITY.md).

Run: python scripts/render_parity_ours.py [--out outputs/parity_ours]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FIXTURES = "/root/reference/resources/example-map-outputs/miku-sphere"


def render_replay(out: Path, frames: int, size: int) -> None:
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from stable_renderer_tpu.data.corrmap import CorrespondMap
    from stable_renderer_tpu.data.idmap import id_masks
    from stable_renderer_tpu.data.loaders import load_image_sequence
    from stable_renderer_tpu.engine import (
        Camera,
        CircularOrbit,
        CorrMapRenderer,
        Engine,
        GameObject,
        Mesh,
        SpriteInfo,
    )

    # --- bake: project the reference color dumps onto the sphere through the
    # engine's OWN rasterized id maps (BAKE-mode pass: BAKING draws shade fully
    # and write real texcoord vertex ids; ops/gbuffer.py module docstring) -----
    colors = load_image_sequence(os.path.join(FIXTURES, "color"), num_frames=6)
    h = w = colors.shape[1]
    cmap = CorrespondMap(name="miku", k=2, height=h, width=w)

    class BakePass(Engine):
        def beforePrepare(self):
            cam = GameObject("cam")
            cam.addComponent(Camera)
            cam.transform.position = [0.0, 0.4, 2.6]
            cam.transform.lookAt([0.0, 0.0, 0.0])
            cam.addComponent(CircularOrbit, speed_deg=3.0)
            ball = GameObject("miku_sphere")
            ball.addComponent(SpriteInfo, prompt="baked miku")
            ball.addComponent(CorrMapRenderer, mesh=Mesh.Sphere(1.0, 48),
                              corrmaps=[cmap])

        def beforeFrameEnd(self):
            rm = self.RenderManager
            fc = self.RuntimeManager.FrameCount
            if rm.last_gbuffer is not None and fc < colors.shape[0]:
                ids_f = rm.last_gbuffer.id[None]
                cmap.update(
                    color_frames=jnp.asarray(colors[fc][None]),
                    id_maps=ids_f, mode="first", masks=id_masks(ids_f),
                    spriteID=1, materialID=1, ignore_obj_mat_id=True,
                    inverse_masks=True,
                )

    BakePass.Bake(winSize=(w, h), disableComfyUI=True,  # fixture resolution
                  max_frames=colors.shape[0])
    print(f"baked corrmap: {int(np.asarray(cmap.written).sum())} cells written")
    Engine._reset()  # clear the bake scene before the replay run

    # --- replay through the REAL engine loop ---------------------------------
    out.mkdir(parents=True, exist_ok=True)
    id_dir = out.parent / (out.name + "_ids")
    id_dir.mkdir(parents=True, exist_ok=True)
    engine_holder = {}

    class Replay(Engine):
        def beforePrepare(self):
            cam = GameObject("cam")
            cam.addComponent(Camera)
            cam.transform.position = [0.0, 0.4, 2.6]
            cam.transform.lookAt([0.0, 0.0, 0.0])
            cam.addComponent(CircularOrbit, speed_deg=3.0)
            ball = GameObject("miku_sphere")
            ball.addComponent(SpriteInfo, prompt="baked miku")
            # GAME mode -> CorrMapRenderer draws with renderMode=BAKED
            ball.addComponent(CorrMapRenderer, mesh=Mesh.Sphere(1.0, 48),
                              corrmaps=[cmap])

        def beforeFrameEnd(self):
            rm = self.RenderManager
            if rm.last_gbuffer is not None:
                fc = self.RuntimeManager.FrameCount
                np.save(id_dir / f"id_{fc}.npy", np.asarray(rm.last_gbuffer.id))

    def save_frame(frame, idx):
        img = frame[..., :3]
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(out / f"frame_{idx}.png")

    Replay.Run(winSize=(size, size), disableComfyUI=True, max_frames=frames,
               frame_callback=save_frame)
    print(f"wrote {frames} replay frames to {out} (+ ids in {id_dir})")


def render_diffusion(out: Path, frames: int, ckpt: str | None, tiny: bool) -> None:
    import jax
    import numpy as np
    from PIL import Image

    from stable_renderer_tpu.data.loaders import virtual_engine_data
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.ops.correspondence import OverlapCorresponder
    from stable_renderer_tpu.workflow.config import RenderConfig

    if jax.devices()[0].platform != "cpu":
        from stable_renderer_tpu.ops.flash_attention import use_pallas_attention

        use_pallas_attention(True)
    ed = virtual_engine_data(
        color_dir=os.path.join(FIXTURES, "color"),
        noise_dir=os.path.join(FIXTURES, "noise"),
        normal_dir=os.path.join(FIXTURES, "normal"),
        depth_dir=os.path.join(FIXTURES, "depth"),
        canny_dir=os.path.join(FIXTURES, "canny"),
        num_frames=frames,
        prompt="hatsune miku, high quality anime",
    )
    cfg = RenderConfig(prompt="hatsune miku, high quality anime", steps=4,
                       cfg_scale=2.0, sampler="lcm", scheduler="sgm_uniform",
                       denoise=1.0)
    if ckpt:
        pipe = DiffusionPipeline.from_checkpoint(ckpt, cfg)
    else:
        print("WARNING: no --ckpt; random weights produce texture noise — "
              "flicker numbers from this mode are NOT meaningful (PARITY.md)")
        pipe = DiffusionPipeline.from_random(cfg, tiny=tiny, seed=0)
    corr = OverlapCorresponder(update_corrmap=False, vertex_segments=256 * 256)
    images = np.asarray(pipe.render(ed, corresponder=corr,
                                    key=jax.random.PRNGKey(0)))
    out.mkdir(parents=True, exist_ok=True)
    for i in range(images.shape[0]):
        img = np.clip(images[i] * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(out / f"frame_{i}.png")
    print(f"wrote {images.shape[0]} frames to {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="outputs/parity_ours")
    ap.add_argument("--frames", type=int, default=18)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--mode", choices=("replay", "diffusion"), default="replay")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.mode == "replay":
        render_replay(Path(args.out), args.frames, args.size)
    else:
        render_diffusion(Path(args.out), args.frames, args.ckpt, args.tiny)


if __name__ == "__main__":
    main()
