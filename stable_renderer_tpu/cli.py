"""Command-line front end: ``python -m stable_renderer_tpu <cmd>``.

Capability match for the reference's CLI surface (reference: comfy/cli_args.py
~50 flags + the example scripts' argparse): one entry point exposing the
framework's modes without writing a script.

Subcommands:
  render   — run a scene (procedural or OBJ) through the full loop
  bake     — BAKE mode: accumulate a CorrespondMap, dump at exit
  replay   — render a baked CorrespondMap in BAKED mode (no diffusion)
  execute  — run a (reference-format) workflow JSON offline on dumped maps
  bench    — the headline benchmark (bench.py)
"""

from __future__ import annotations

import argparse
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out", type=str, default=None, help="output dir (default: outputs/<date>)")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--lora", action="append", default=[], help="path[:strength]")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--cfg", type=float, default=2.0)
    p.add_argument("--sampler", type=str, default="lcm")
    p.add_argument("--scheduler", type=str, default="sgm_uniform")
    p.add_argument("--denoise", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative", type=str, default="")
    p.add_argument("--obj", type=str, default=None, help="OBJ mesh (default: sphere)")
    p.add_argument("--no-diffusion", action="store_true")
    p.add_argument("--workflow", type=str, default=None, help="reference workflow JSON")
    p.add_argument("--gif", type=str, default=None, help="also write an animated gif")
    p.add_argument("--stream", action="store_true",
                   help="StreamDiffusion frame pipelining (one batched UNet "
                        "eval per frame; steps-1 frame output lag)")
    p.add_argument("--taesd", action="store_true",
                   help="realtime TAESD autoencoder swap")
    p.add_argument("--editor", action="store_true",
                   help="EDITOR mode: boot the live-view/graph-editor HTTP "
                        "server and stream frames to it")
    p.add_argument("--editor-port", type=int, default=8188)


def _build_pipeline(args):
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.workflow import Workflow
    from stable_renderer_tpu.workflow.config import RenderConfig

    if args.workflow:
        cfg = Workflow.Load(args.workflow).build_config()
    else:
        cfg = RenderConfig(
            prompt=args.prompt, negative_prompt=args.negative, steps=args.steps,
            cfg_scale=args.cfg, sampler=args.sampler, scheduler=args.scheduler,
            denoise=args.denoise, seed=args.seed,
            stream_pipeline=getattr(args, "stream", False),
            realtime_taesd=getattr(args, "taesd", False),
        )
    loras = []
    for spec in args.lora:
        path, _, s = spec.partition(":")
        loras.append((path, float(s) if s else 1.0))
    if args.checkpoint:
        return DiffusionPipeline.from_checkpoint(args.checkpoint, cfg, loras=loras)
    return DiffusionPipeline.from_random(cfg, tiny=args.size < 256)


def _scene(args, corrmaps=None):
    from stable_renderer_tpu.engine import (
        AutoRotation, Camera, CorrMapRenderer, GameObject, Mesh, MeshRenderer, SpriteInfo,
    )

    cam = GameObject("camera")
    cam.addComponent(Camera).env_prompt.prompt = args.prompt
    cam.transform.position = [0.0, 0.5, 3.0]
    cam.transform.lookAt([0.0, 0.0, 0.0])
    obj = GameObject("subject")
    mesh = Mesh.Load(args.obj) if args.obj else Mesh.Sphere(1.0, 48)
    obj.addComponent(SpriteInfo, prompt=args.prompt)
    if corrmaps:
        obj.addComponent(CorrMapRenderer, mesh=mesh, corrmaps=corrmaps)
    else:
        obj.addComponent(MeshRenderer, mesh=mesh)
    obj.addComponent(AutoRotation, speed_deg=360.0 / max(args.frames, 1))


def cmd_render(args) -> int:
    from stable_renderer_tpu.engine import Engine
    from stable_renderer_tpu.utils.paths import new_run_dir

    out = args.out or str(new_run_dir("render"))

    class App(Engine):
        def beforePrepare(self):
            _scene(args)

    run = App.RunEditor if getattr(args, "editor", False) else App.Run
    eng = run(
        winSize=(args.size, args.size),
        pipeline=None if args.no_diffusion else _build_pipeline(args),
        disableComfyUI=args.no_diffusion,
        max_frames=args.frames,
        output_dir=out,
        keep_frames_in_memory=bool(args.gif),
        editor_port=getattr(args, "editor_port", 8188),
    )
    if args.gif:
        from stable_renderer_tpu.utils.media import write_gif

        write_gif(eng.WindowManager.frames, args.gif)
    print(f"{args.frames} frames -> {out} (fps {eng.RuntimeManager.fps.fps:.2f})")
    return 0


def cmd_bake(args) -> int:
    from stable_renderer_tpu.data.corrmap import CorrespondMap
    from stable_renderer_tpu.engine import Engine
    from stable_renderer_tpu.ops.correspondence import DefaultCorresponder
    from stable_renderer_tpu.utils.paths import new_run_dir

    out = args.out or str(new_run_dir("bake"))
    cmap = CorrespondMap(name="bake", k=args.k, height=args.size, width=args.size)

    class App(Engine):
        def beforePrepare(self):
            _scene(args, corrmaps=[cmap])

        def beforeRelease(self):
            print("corrmap ->", cmap.dump(out, force=True))

    App.Bake(
        winSize=(args.size, args.size),
        pipeline=None if args.no_diffusion else _build_pipeline(args),
        disableComfyUI=args.no_diffusion,
        corresponder=DefaultCorresponder(update_corrmap_mode="first"),
        baking_interval=min(8, args.frames),
        max_frames=args.frames,
        output_dir=out + "/frames",
    )
    return 0


def cmd_replay(args) -> int:
    from stable_renderer_tpu.data.corrmap import CorrespondMap
    from stable_renderer_tpu.engine import Engine
    from stable_renderer_tpu.utils.paths import new_run_dir

    out = args.out or str(new_run_dir("replay"))
    cmap = CorrespondMap.Load(args.map)

    class App(Engine):
        def beforePrepare(self):
            _scene(args, corrmaps=[cmap])

    eng = App.Run(
        winSize=(args.size, args.size), disableComfyUI=True,
        max_frames=args.frames, output_dir=out,
    )
    print(f"replayed -> {out} (fps {eng.RuntimeManager.fps.fps:.2f})")
    return 0


def _model_dirs(args):
    """--model-dir dirs + extra_model_paths.yaml expansion (reference
    comfyUI/main.py:202-236 load_extra_path_config; auto-loads the file from
    the working directory like the reference does next to its entry point)."""
    from stable_renderer_tpu.utils.model_paths import (
        auto_extra_model_paths, load_extra_model_paths,
    )

    dirs = list(args.model_dir or ())
    if getattr(args, "extra_model_paths", None):
        dirs += list(load_extra_model_paths(args.extra_model_paths))
    else:
        dirs += list(auto_extra_model_paths())
    return tuple(dict.fromkeys(dirs))


def cmd_execute(args) -> int:
    from stable_renderer_tpu.data.loaders import virtual_engine_data
    from stable_renderer_tpu.utils.media import write_png_sequence
    from stable_renderer_tpu.utils.paths import new_run_dir
    from stable_renderer_tpu.workflow import Workflow
    from stable_renderer_tpu.workflow.executor import PromptExecutor

    import numpy as np

    ed = virtual_engine_data(
        color_dir=args.color_dir, id_dir=args.id_dir, noise_dir=args.noise_dir,
        normal_dir=args.normal_dir, depth_dir=args.depth_dir,
        prompt=args.prompt,
    )
    ex = PromptExecutor(
        Workflow.Load(args.workflow), model_dirs=_model_dirs(args)
    )
    ctx = ex.execute(engine_data=ed)
    out = args.out or str(new_run_dir("execute"))
    frames = np.asarray(ctx.final_output)
    paths = write_png_sequence(frames, out)
    print(f"{len(paths)} frames -> {out}")
    return 0


def cmd_serve(args) -> int:
    """HTTP server mode (the reference main.run() server + PySide6 viewer
    replacement): live MJPEG frame view + POST /prompt workflow execution."""
    from stable_renderer_tpu.data.loaders import virtual_engine_data
    from stable_renderer_tpu.server import FrameServer, serve_workflows

    server = FrameServer(host=args.host, port=args.port).start()
    print(f"viewer: http://{args.host}:{server.port}/  "
          f"(POST workflow JSON to /prompt; /history; /queue)")

    ed_fn = None
    if args.color_dir or args.id_dir:
        def ed_fn():
            return virtual_engine_data(
                color_dir=args.color_dir, id_dir=args.id_dir,
                noise_dir=args.noise_dir, normal_dir=args.normal_dir,
                depth_dir=args.depth_dir, prompt=args.prompt)

    try:
        serve_workflows(server, model_dirs=_model_dirs(args),
                        engine_data_fn=ed_fn, max_prompts=args.max_prompts)
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
    return 0


def cmd_upscale(args) -> int:
    """Run any zoo model (ESRGAN/SwinIR/Swin2SR/HAT/DAT/SRVGG/SwiftSRGAN/
    SCUNet/OmniSR/SPSR/GFPGAN/CodeFormer/LaMa) on an image — the chainner
    'load model and go' flow."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from stable_renderer_tpu.models.upscale import load_upscale_model

    model, params = load_upscale_model(args.model)
    arch = type(model).__name__
    img = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
    x = jnp.asarray(img[None])
    if arch in ("GFPGAN", "CodeFormer"):
        x = x * 2.0 - 1.0  # face models take [-1, 1] crops
        out = model.apply(params, x)
        out = (out + 1.0) / 2.0 if arch == "GFPGAN" else (out * 0.5 + 0.5)
    elif arch == "LaMa":
        if not args.mask:
            raise SystemExit("LaMa needs --mask (white = hole)")
        m = np.asarray(Image.open(args.mask).convert("L"), np.float32) / 255.0
        out = model.apply(params, x, jnp.asarray(m[None, ..., None]))
    else:
        out = model.apply(params, x)
    arr = np.clip(np.asarray(out[0]) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(args.out)
    print(f"{arch}: {img.shape[1]}x{img.shape[0]} -> "
          f"{arr.shape[1]}x{arr.shape[0]} -> {args.out}")
    return 0


def cmd_validate(args) -> int:
    """One-command real-checkpoint validation (VERDICT r4 next #7): run the 5
    BASELINE.md benchmark configs + the image-level correspondence A/B +
    temporal-flicker scoring against a real SD1.5 checkpoint, and append the
    results to PARITY.json. Skips cleanly with one line when no checkpoint is
    available (random weights make image-level numbers meaningless)."""
    import json
    import subprocess
    import time
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    if not args.ckpt or not Path(args.ckpt).exists():
        print("validate: SKIPPED — no SD checkpoint available "
              f"({args.ckpt or '--ckpt not given'}); image-level parity "
              "numbers need real weights (PARITY.md).")
        return 0

    py = sys.executable
    ck = str(Path(args.ckpt).resolve())
    # (name, argv, needs) — the 5 BASELINE.json configs map 1:1 onto the
    # reference's example scripts, plus the two parity harnesses
    steps = [
        ("bake_ball", [py, "scripts/bake_ball.py", "--no-diffusion",
                       "--frames", "4"], None),
        ("boat_img2img", [py, "scripts/boat_example.py", "--checkpoint", ck,
                          "--frames", "2"], None),
        ("corrmap_replay", [py, "scripts/corrmap_render_example.py",
                            "--frames", "4"], None),
        ("miku_controlnet", [py, "scripts/miku_controlnet_example.py",
                             "--checkpoint", ck, "--frames", "2"]
         + (["--controlnet", args.controlnet] if args.controlnet else []),
         None),
        ("multi_obj_stream", [py, "scripts/multi_obj_example.py",
                              "--frames", "4"], None),
        ("diffusion_ab", [py, "scripts/diffusion_ab.py", "--ckpt", ck], None),
        ("flicker_parity", [py, "scripts/flicker_parity.py"]
         + (["--lpips", args.lpips] if args.lpips else []), None),
    ]
    results = {}
    for name, argv_, _ in steps:
        t0 = time.time()
        r = subprocess.run(argv_, cwd=root, capture_output=True, text=True,
                           timeout=args.step_timeout)
        ok = r.returncode == 0
        results[name] = {"ok": ok, "seconds": round(time.time() - t0, 1)}
        print(f"validate[{name}]: {'ok' if ok else 'FAILED'} "
              f"({results[name]['seconds']}s)")
        if not ok:
            tail = "\n".join((r.stdout + r.stderr).splitlines()[-8:])
            print(tail)
    pj = root / "PARITY.json"
    data = json.loads(pj.read_text()) if pj.exists() else {}
    data["validate"] = {"ckpt": Path(ck).name, "steps": results,
                        "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    pj.write_text(json.dumps(data, indent=2) + "\n")
    print(f"validate: wrote PARITY.json 'validate' entry "
          f"({sum(v['ok'] for v in results.values())}/{len(results)} ok)")
    return 0 if all(v["ok"] for v in results.values()) else 1


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="stable_renderer_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="full render loop")
    _add_common(p)
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("bake", help="bake a CorrespondMap")
    _add_common(p)
    p.add_argument("--k", type=int, default=3)
    p.set_defaults(fn=cmd_bake)

    p = sub.add_parser("replay", help="replay a baked CorrespondMap")
    _add_common(p)
    p.add_argument("--map", type=str, required=True)
    p.set_defaults(fn=cmd_replay)

    p = sub.add_parser("execute", help="run a workflow JSON on dumped maps")
    _add_common(p)
    p.add_argument("--color-dir", type=str, default=None)
    p.add_argument("--id-dir", type=str, default=None)
    p.add_argument("--noise-dir", type=str, default=None)
    p.add_argument("--normal-dir", type=str, default=None)
    p.add_argument("--depth-dir", type=str, default=None)
    p.add_argument("--model-dir", action="append", default=[])
    p.add_argument("--extra-model-paths", type=str, default=None,
                   help="reference-format extra_model_paths.yaml (auto-loads "
                        "./extra_model_paths.yaml when present)")
    p.set_defaults(fn=cmd_execute)

    p = sub.add_parser("serve", help="HTTP viewer + prompt server")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8188)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--color-dir", type=str, default=None)
    p.add_argument("--id-dir", type=str, default=None)
    p.add_argument("--noise-dir", type=str, default=None)
    p.add_argument("--normal-dir", type=str, default=None)
    p.add_argument("--depth-dir", type=str, default=None)
    p.add_argument("--model-dir", action="append", default=[])
    p.add_argument("--extra-model-paths", type=str, default=None,
                   help="reference-format extra_model_paths.yaml (auto-loads "
                        "./extra_model_paths.yaml when present)")
    p.add_argument("--max-prompts", type=int, default=None,
                   help="exit after N prompts (default: run forever)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("upscale", help="run a zoo model on an image")
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--out", type=str, default="upscaled.png")
    p.add_argument("--mask", type=str, default=None, help="LaMa hole mask")
    p.set_defaults(fn=cmd_upscale)

    p = sub.add_parser("bench", help="headline benchmark")
    p.set_defaults(fn=lambda a: __import__("bench").main() or 0)

    p = sub.add_parser(
        "validate",
        help="run the 5 BASELINE configs + image A/B + flicker vs a real "
             "checkpoint, write PARITY.json entries (skips without --ckpt)")
    p.add_argument("--ckpt", type=str, default=None,
                   help="SD1.5 checkpoint (.safetensors)")
    p.add_argument("--controlnet", type=str, default=None,
                   help="optional controlnet .safetensors for config 4")
    p.add_argument("--lpips", type=str, default=None,
                   help="optional VGG16/LPIPS weights for the LPIPS metric")
    p.add_argument("--step-timeout", type=int, default=3600)
    p.set_defaults(fn=cmd_validate)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
