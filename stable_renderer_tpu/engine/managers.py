"""Engine managers — the per-frame orchestration layer.

Capability match for the reference's manager framework + the six managers
(reference: engine/managers/manager.py:40-212 lifecycle framework,
windowManager.py, inputManager.py, runtimeManager.py, renderManager.py,
diffusionManager.py, sceneManager.py, resourcesManager.py), re-designed headless:

  * WindowManager — no GLFW; owns the output size and a frame sink (PNG dir /
    callback / in-memory) since TPU hosts have no display (SURVEY.md section 7).
  * InputManager — programmable key/mouse state with the GetKey/GetKeyDown API.
  * RuntimeManager — frame clock + fixedUpdate pacing + GameObject phase driver.
  * RenderManager — owns the G-buffer arrays + sorted draw queue; executes the
    compiled draw passes, packs EngineData (incl. the 8x8 noise pooling + AdaIN
    renorm + global background noise, renderManager.py:877-948), accumulates the
    bake batch, triggers diffusion, composes defer + post-process.
  * DiffusionManager — owns the DiffusionPipeline + corresponder + bake pacing
    (ShouldSubmitBake every baking_interval frames) + async map dumping.
  * SceneManager / ResourcesManager — scene container + deferred resource load,
    matching the reference's thin versions.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from stable_renderer_tpu.data.engine_data import EngineData
from stable_renderer_tpu.data.sprite import EnvPrompt, Sprite
from stable_renderer_tpu.utils.events import AutoSortTask
from stable_renderer_tpu.utils.log import EngineLogger
from stable_renderer_tpu.utils.timer import FPSCounter, StageTimer


class Manager:
    """Lifecycle base (manager.py:40-212): ordered prepare/frame hooks."""

    PrepareFuncOrder = 0
    FrameBeginFuncOrder = 0
    FrameRunFuncOrder = 0
    FrameEndFuncOrder = 0
    ReleaseFuncOrder = 0

    def __init__(self, engine):
        self.engine = engine
        engine._managers.append(self)

    def prepare(self): ...
    def on_frame_begin(self): ...
    def on_frame_run(self): ...
    def on_frame_end(self): ...
    def release(self): ...


class WindowManager(Manager):
    def __init__(self, engine, window_size: Tuple[int, int] = (512, 512),
                 output_dir: Optional[str] = None,
                 frame_callback: Optional[Callable[[np.ndarray, int], None]] = None,
                 keep_frames_in_memory: bool = False):
        super().__init__(engine)
        self.WindowSize = window_size  # (W, H) like the reference
        self.output_dir = output_dir
        self.frame_callback = frame_callback
        self.keep_frames_in_memory = keep_frames_in_memory
        self.frames: List[np.ndarray] = []

    def present(self, frame: np.ndarray, frame_index: int) -> None:
        """The swap_buffers equivalent: deliver the final composited frame."""
        if self.frame_callback is not None:
            self.frame_callback(frame, frame_index)
        if self.keep_frames_in_memory:
            self.frames.append(frame)
        if self.output_dir:
            from PIL import Image

            os.makedirs(self.output_dir, exist_ok=True)
            img = np.clip(frame[..., :3] * 255.0, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(self.output_dir, f"frame_{frame_index}.png"))


class InputManager(Manager):
    """Headless key/mouse state with the reference's query API
    (inputManager.py:6-170). Feed events via press/release/move."""

    def __init__(self, engine):
        super().__init__(engine)
        self._down: set = set()
        self._pressed: set = set()
        self._released: set = set()
        self._mouse_btns: set = set()
        self._mouse_pos = (0.0, 0.0)
        self._mouse_delta = (0.0, 0.0)

    def press_key(self, key: str) -> None:
        key = key.lower()
        if key not in self._down:
            self._pressed.add(key)
        self._down.add(key)

    def release_key(self, key: str) -> None:
        # (named *_key: `release` is the Manager lifecycle hook)
        key = key.lower()
        self._down.discard(key)
        self._released.add(key)

    def move_mouse(self, x: float, y: float) -> None:
        self._mouse_delta = (x - self._mouse_pos[0], y - self._mouse_pos[1])
        self._mouse_pos = (x, y)

    def press_mouse(self, btn: int = 0) -> None:
        self._mouse_btns.add(btn)

    def release_mouse(self, btn: int = 0) -> None:
        self._mouse_btns.discard(btn)

    def GetKey(self, key: str) -> bool:
        return key.lower() in self._down

    def GetKeyDown(self, key: str) -> bool:
        return key.lower() in self._pressed

    def GetKeyUp(self, key: str) -> bool:
        return key.lower() in self._released

    def GetMouseBtn(self, btn: int = 0) -> bool:
        return btn in self._mouse_btns

    @property
    def MousePos(self) -> Tuple[float, float]:
        return self._mouse_pos

    @property
    def MouseDelta(self) -> Tuple[float, float]:
        return self._mouse_delta

    def on_frame_end(self):
        self._pressed.clear()
        self._released.clear()
        self._mouse_delta = (0.0, 0.0)


class RuntimeManager(Manager):
    """Frame clock + GameObject phase driver (runtimeManager.py:15-325)."""

    FrameRunFuncOrder = 0  # runs before RenderManager (order 100)

    def __init__(self, engine, fixed_delta_time: float = 1.0 / 60.0):
        super().__init__(engine)
        self.FrameCount = 0
        self.FixedDeltaTime = fixed_delta_time
        self.DeltaTime = fixed_delta_time
        self.Gravity = np.asarray([0.0, -9.8, 0.0], np.float32)
        self.fps = FPSCounter()

    def on_frame_run(self):
        from stable_renderer_tpu.engine.gameobj import GameObject

        for phase in ("fixedUpdate", "update", "lateUpdate"):
            for root in GameObject.roots():
                root._run_phase(phase)

    def on_frame_end(self):
        self.FrameCount += 1
        self.fps.tick()


class RenderManager(Manager):
    """The hot loop (renderManager.py:135-1047), TPU-shaped: draws execute as
    compiled passes over device arrays, frame packing is one jitted function,
    and nothing round-trips through the host between rasterize and diffusion."""

    FrameRunFuncOrder = 100

    def __init__(self, engine):
        super().__init__(engine)
        self.gbuffer_tasks = AutoSortTask()
        self._sprites: Dict[int, Sprite] = {}
        self._corrmaps: Dict[Tuple[int, int], object] = {}
        self._env_prompts: List[EnvPrompt] = []
        self._pending: List[dict] = []  # accumulated frame packs for bake batching
        self.timer = StageTimer()
        self._bg_noise = None
        self.last_gbuffer = None
        self.post_process_params = None  # set lazily; PostProcessParams
        self.defer_tasks = AutoSortTask()
        self.post_tasks = AutoSortTask()

    # --- submission API (renderManager.py:709-790, 678-706) ---

    def AddGBufferTask(self, draw_call) -> None:
        self.gbuffer_tasks.add_task(lambda dc=draw_call: dc, order=draw_call.order)

    def AddIdenticalGBufferTask(self, draw_call) -> None:
        """API parity with the reference's per-object isolated pre-pass
        (renderManager.py:709-756). In this build every draw already depth-merges
        through the explicit z-buffer compose and BAKING draws shade fully (see
        ops/gbuffer.py), so the isolated pre-pass is unnecessary — the task joins
        the ordinary queue."""
        self.AddGBufferTask(draw_call)

    def AddDeferRenderTask(self, task: Callable, order: float = 0.0) -> None:
        self.defer_tasks.add_task(task, order)

    def AddPostProcessTask(self, task: Callable, order: float = 0.0) -> None:
        self.post_tasks.add_task(task, order)

    def SubmitSprite(self, sprite: Sprite) -> None:
        self._sprites[sprite.spriteID] = sprite

    def SubmitCorrmap(self, sprite_id: int, material_id: int, corrmap) -> None:
        self._corrmaps[(sprite_id, material_id)] = corrmap

    def SubmitEnvPrompt(self, prompt: EnvPrompt) -> None:
        self._env_prompts.append(prompt)

    @property
    def GlobalBGNoise(self):
        """Fixed background latent noise (renderManager.py:869-875)."""
        import jax

        if self._bg_noise is None:
            w, h = self.engine.WindowManager.WindowSize
            self._bg_noise = jax.random.normal(jax.random.PRNGKey(7), (1, h, w, 4))
        return self._bg_noise

    # --- the frame ---

    def on_frame_run(self):
        import jax.numpy as jnp

        from stable_renderer_tpu.engine.render_exec import execute_draws, pack_frame_data
        from stable_renderer_tpu.ops.postprocess import PostProcessParams, defer_render, post_process

        engine = self.engine
        w, h = engine.WindowManager.WindowSize

        with self.timer.stage("gbuffer"):
            draws = [t() for t in [task.fn for task in sorted(self.gbuffer_tasks._tasks)]]
            cam = self._main_camera()
            gbuf = execute_draws(draws, cam, h, w)
            self.gbuffer_tasks.clear()
        self.last_gbuffer = gbuf

        diffusion_ran = False
        color_out = gbuf.color
        if not engine.disableComfyUI and engine.DiffusionManager.pipeline is not None:
            with self.timer.stage("pack_frame_data"):
                pack = pack_frame_data(gbuf, self.GlobalBGNoise, engine.RuntimeManager.FrameCount)
                self._pending.append(pack)
            dm = engine.DiffusionManager
            if engine.Mode.name != "BAKE" or dm.ShouldSubmitBake:
                with self.timer.stage("diffusion"):
                    engine_data = self._build_engine_data()
                    result = dm.SubmitPrompt(engine_data)
                    self._pending.clear()
                if result is not None:
                    diffusion_ran = True
                    # write the last frame's diffusion output back as the display
                    # color (renderManager.py:1017-1021)
                    rgb = result[-1]
                    color_out = jnp.concatenate(
                        [rgb, jnp.ones_like(rgb[..., :1])], axis=-1
                    )
                    self.last_diffusion_frames = result

        with self.timer.stage("compose"):
            is_baking = engine.Mode.name == "BAKE"
            color_out = defer_render(color_out, gbuf.id, is_baking=is_baking and not diffusion_ran)
            for task in self.defer_tasks.execute():
                if task is not None:
                    color_out = task if not callable(task) else color_out
            pp = self.post_process_params or PostProcessParams()
            color_out = post_process(color_out, pp)
            for task in self.post_tasks.execute():
                pass

        with self.timer.stage("present"):
            engine.WindowManager.present(
                np.asarray(color_out), engine.RuntimeManager.FrameCount
            )

    def _main_camera(self):
        from stable_renderer_tpu.engine.camera import Camera

        return Camera.MainCamera()

    def _build_engine_data(self) -> EngineData:
        import jax.numpy as jnp

        packs = self._pending
        cam = self._main_camera()
        env = (cam.env_prompt,) if cam is not None else ()
        return EngineData(
            frame_indices=jnp.asarray([p["frame_index"] for p in packs]),
            color_maps=jnp.stack([p["color"] for p in packs]),
            id_maps=jnp.stack([p["id"] for p in packs]),
            pos_maps=jnp.stack([p["pos"] for p in packs]),
            noise_maps=jnp.stack([p["noise"] for p in packs]),
            normal_maps=jnp.stack([p["normal"] for p in packs]),
            depth_maps=jnp.stack([p["depth"] for p in packs]),
            canny_maps=jnp.stack([p["canny"] for p in packs]),
            masks=jnp.stack([p["mask"] for p in packs]),
            sprite_infos=dict(self._sprites),
            env_prompts=env + tuple(self._env_prompts),
            correspond_maps=dict(self._corrmaps),
        )

    def on_frame_end(self):
        self._env_prompts.clear()


class DiffusionManager(Manager):
    """Engine <-> diffusion bridge (diffusionManager.py:24-352)."""

    def __init__(self, engine, pipeline=None, corresponder=None,
                 baking_interval: int = 8,
                 output_maps: bool = False,
                 map_output_dir: Optional[str] = None,
                 output_ai_canny: bool = False):
        super().__init__(engine)
        self.pipeline = pipeline
        self.corresponder = corresponder
        self.baking_interval = baking_interval
        self.output_maps = output_maps
        self.map_output_dir = map_output_dir
        self.output_ai_canny = output_ai_canny
        self._pool = ThreadPoolExecutor(max_workers=2)
        self._dump_futures: List = []

    @property
    def ShouldSubmitBake(self) -> bool:
        """True every baking_interval-th frame (diffusionManager.py:97-102)."""
        fc = self.engine.RuntimeManager.FrameCount
        return (fc + 1) % self.baking_interval == 0

    @property
    def ShouldOutputFrame(self) -> bool:
        return self.output_maps

    def SubmitPrompt(self, engine_data: EngineData):
        """Run the compiled render program on the packed frames
        (diffusionManager.py:289-352 -> the whole ComfyUI execute path)."""
        if self.pipeline is None:
            return None
        import jax

        key = jax.random.PRNGKey(
            self.pipeline.config.seed + self.engine.RuntimeManager.FrameCount
        )
        images = self.pipeline.render(engine_data, corresponder=self.corresponder, key=key)
        if self.output_maps and self.map_output_dir:
            self._dump_maps_async(engine_data, images)
        return images

    # --- map dumping (diffusionManager.py:160-285), async like the reference ---

    def _dump_maps_async(self, engine_data: EngineData, images) -> None:
        arrays = {
            "color": np.asarray(engine_data.color_maps),
            "normal": np.asarray(engine_data.normal_maps),
            "depth": np.asarray(engine_data.depth_maps),
            "canny": np.asarray(engine_data.canny_maps),
            "id": np.asarray(engine_data.id_maps),
            "pos": np.asarray(engine_data.pos_maps),
            "noise": np.asarray(engine_data.noise_maps),
            "result": np.asarray(images),
        }
        if self.output_ai_canny:
            from stable_renderer_tpu.ops.canny import canny

            arrays["ai_canny"] = np.asarray(canny(engine_data.color_maps))
        frames = [int(i) for i in np.asarray(engine_data.frame_indices)]
        self._dump_futures.append(
            self._pool.submit(self._dump_maps, arrays, frames, self.map_output_dir)
        )

    @staticmethod
    def _dump_maps(arrays: dict, frames: List[int], out_dir: str) -> None:
        from PIL import Image

        for name, arr in arrays.items():
            d = os.path.join(out_dir, name)
            os.makedirs(d, exist_ok=True)
            for i, f in enumerate(frames):
                a = arr[i]
                if name in ("id", "pos", "noise"):
                    np.save(os.path.join(d, f"{name}_{f}.npy"), a)
                else:
                    img = np.clip(a[..., :3] * 255, 0, 255).astype(np.uint8)
                    Image.fromarray(img).save(os.path.join(d, f"{name}_{f}.png"))

    def release(self):
        for fut in self._dump_futures:
            try:
                fut.result(timeout=8)  # reference drains with 8s timeout
            except Exception as e:  # noqa: BLE001
                EngineLogger.warning(f"map dump failed: {e}")
        self._pool.shutdown(wait=False)


class SceneManager(Manager):
    """Scene container (sceneManager.py:3-26) + scene save/load, which the
    reference left TODO (scene.py:8) — here implemented via scene.py."""

    def __init__(self, engine):
        super().__init__(engine)
        from stable_renderer_tpu.engine.scene import Scene

        self.MainScene = Scene("main")

    def prepare(self):
        pass


class ResourcesManager(Manager):
    """Deferred resource preparation (resourcesManager.py:12-45). Device arrays
    are materialized lazily by jax, so 'loading' = warming mesh buffers."""

    PrepareFuncOrder = 100

    def prepare(self):
        pass
