"""Single-object img2img render loop — config 2 of BASELINE.md.

Mirrors the reference's scripts/boat_example.py: a textured OBJ (the reference
boat, if the reference resources are mounted; a sphere otherwise) rendered and
diffused every frame with an img2img workflow, overlap disabled.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from stable_renderer_tpu.engine import (
    AutoRotation,
    Camera,
    DiffusionPipeline,
    Engine,
    GameObject,
    Mesh,
    MeshRenderer,
    SpriteInfo,
)
from stable_renderer_tpu.utils.paths import new_run_dir
from stable_renderer_tpu.workflow.config import RenderConfig

BOAT_OBJ = "/root/reference/resources/example-3d-models/boat/boat.obj"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--denoise", type=float, default=0.6)
    args = ap.parse_args()
    out_dir = new_run_dir("boat")

    class Boat(Engine):
        def beforePrepare(self):
            cam = GameObject("camera")
            cam.addComponent(
                Camera
            ).env_prompt.prompt = "a boat on calm water, sunset, masterpiece"
            cam.transform.position = [0.0, 1.0, 4.0]
            cam.transform.lookAt([0.0, 0.0, 0.0])
            obj = GameObject("boat")
            if os.path.exists(BOAT_OBJ):
                mesh = Mesh.Load(BOAT_OBJ)
            else:
                mesh = Mesh.Sphere(1.0, 32)
            obj.addComponent(SpriteInfo, prompt="a wooden boat")
            obj.addComponent(MeshRenderer, mesh=mesh)
            obj.addComponent(AutoRotation, speed_deg=4.0)

    cfg = RenderConfig(
        steps=4, cfg_scale=2.0, sampler="lcm", scheduler="sgm_uniform",
        denoise=args.denoise,
    )
    if args.checkpoint:
        pipe = DiffusionPipeline.from_checkpoint(args.checkpoint, cfg)
    else:
        pipe = DiffusionPipeline.from_random(cfg, tiny=True)

    Boat.Run(
        winSize=(args.size, args.size),
        pipeline=pipe,
        max_frames=args.frames,
        output_dir=str(out_dir),
    )
    print(f"outputs in {out_dir}")


if __name__ == "__main__":
    main()
