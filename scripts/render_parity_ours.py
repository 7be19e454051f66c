"""Render OUR miku sequence from the reference's own fixtures -> PARITY evidence.

VERDICT r2 #2: the parity report needs an "ours" section measured on the
framework's own rendered sequence. This renders the miku frames through the
real DiffusionPipeline using the reference's dumped maps as EngineData inputs
(data/loaders.virtual_engine_data — the VirtualEngineDataNode path), with the
realtime configuration (4-step LCM, cfg 2) and the OverlapCorresponder's
cross-frame attention + fixture noise (the reference's per-vertex-consistent
noise dumps), then writes the frames for scripts/flicker_parity.py --ours.

Weights are random (no SD checkpoints ship offline) — temporal flicker is
driven by the correspondence machinery (shared noise, broadcast-KV attention,
latent vertex averaging), which is exactly what the metric evaluates; PARITY.md
documents this.

Run: python scripts/render_parity_ours.py [--out outputs/parity_ours]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FIXTURES = "/root/reference/resources/example-map-outputs/miku-sphere"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="outputs/parity_ours")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU debug); default full-size bf16")
    args = ap.parse_args()

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
        num_frames=args.frames,
        prompt="hatsune miku, high quality anime",
    )
    print(f"engine data: {ed.frame_count} frames, "
          f"{ed.color_maps.shape[1]}x{ed.color_maps.shape[2]}")

    cfg = RenderConfig(
        prompt="hatsune miku, high quality anime",
        steps=4, cfg_scale=2.0, sampler="lcm", scheduler="sgm_uniform",
        denoise=1.0,
    )
    pipe = DiffusionPipeline.from_random(cfg, tiny=args.tiny, seed=0)
    corr = OverlapCorresponder(update_corrmap=False,
                               vertex_segments=256 * 256)
    images = pipe.render(ed, corresponder=corr, key=jax.random.PRNGKey(0))
    arr = np.asarray(images)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(arr.shape[0]):
        img = np.clip(arr[i] * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(out / f"frame_{i}.png")
    print(f"wrote {arr.shape[0]} frames to {out}")


if __name__ == "__main__":
    main()
