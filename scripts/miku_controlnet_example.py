"""ControlNet-conditioned character render — config 4 of BASELINE.md.

Mirrors the reference's scripts/miku_controlnet_example.py + the miku-control
workflow (resources/example-workflows/miku-control.json): SD1.5 + LCM LoRA,
4 steps, cfg 2, lcm/sgm_uniform, with normal + depth ControlNets fed straight
from the G-buffer. Loads the reference's miku OBJ when mounted.
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
from stable_renderer_tpu.workflow import Workflow
from stable_renderer_tpu.workflow.config import ControlNetSpec, RenderConfig

MIKU_OBJ = "/root/reference/resources/example-3d-models/miku/miku.obj"
MIKU_WORKFLOW = "/root/reference/resources/example-workflows/miku-control.json"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--controlnet", type=str, default=None, help="controlnet safetensors")
    args = ap.parse_args()
    out_dir = new_run_dir("miku")

    # configuration from the reference workflow JSON when available
    if os.path.exists(MIKU_WORKFLOW):
        cfg = Workflow.Load(MIKU_WORKFLOW).build_config()
        cfg = RenderConfig(
            prompt="hatsune miku, masterpiece, best quality",
            steps=cfg.steps, cfg_scale=cfg.cfg_scale, sampler=cfg.sampler,
            scheduler=cfg.scheduler, denoise=cfg.denoise, controlnets=cfg.controlnets,
        )
    else:
        cfg = RenderConfig(
            prompt="hatsune miku, masterpiece, best quality",
            steps=4, cfg_scale=2.0, sampler="lcm", scheduler="sgm_uniform",
            controlnets=(
                ControlNetSpec(source="normal"), ControlNetSpec(source="depth"),
            ),
        )

    if args.checkpoint:
        pipe = DiffusionPipeline.from_checkpoint(args.checkpoint, cfg)
    else:
        pipe = DiffusionPipeline.from_random(cfg, tiny=True)
    for spec in cfg.controlnets:
        if args.controlnet and os.path.exists(args.controlnet):
            from stable_renderer_tpu.models.weights import load_state_dict, nest, to_device

            flat = load_state_dict(args.controlnet)
            pipe.add_controlnet(to_device(nest(flat, "control_model.")), spec)
        else:
            pipe.add_random_controlnet(spec)

    class Miku(Engine):
        def beforePrepare(self):
            cam = GameObject("camera")
            cam.addComponent(Camera)
            cam.transform.position = [0.0, 1.0, 3.0]
            cam.transform.lookAt([0.0, 0.8, 0.0])
            obj = GameObject("miku")
            if os.path.exists(MIKU_OBJ):
                mesh = Mesh.Load(MIKU_OBJ)
            else:
                mesh = Mesh.Sphere(1.0, 32)
            obj.addComponent(SpriteInfo, prompt="hatsune miku")
            obj.addComponent(MeshRenderer, mesh=mesh)
            obj.addComponent(AutoRotation, speed_deg=6.0)

    Miku.Run(
        winSize=(args.size, args.size),
        pipeline=pipe,
        max_frames=args.frames,
        output_dir=str(out_dir),
        output_maps=True,
        map_output_dir=str(out_dir / "maps"),
    )
    print(f"outputs in {out_dir}")


if __name__ == "__main__":
    main()
