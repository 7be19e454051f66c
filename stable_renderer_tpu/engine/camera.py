"""Camera component.

Capability match for the reference's Camera
(reference: engine/runtime/components/camera/camera.py:14-130): fov/near/far/
ortho, main-camera registry, per-camera background EnvPrompt; instead of pushing
matrices into a GL UBO each lateUpdate, view/projection are produced as arrays on
demand for the compiled frame step.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from stable_renderer_tpu.data.sprite import EnvPrompt
from stable_renderer_tpu.engine.gameobj import Component


class Camera(Component):
    _cameras: List["Camera"] = []

    def __init__(
        self,
        game_object,
        fov: float = 45.0,
        near: float = 0.1,
        far: float = 100.0,
        ortho: bool = False,
        ortho_size: float = 1.0,
        main: bool = True,
        env_prompt: Optional[EnvPrompt] = None,
    ):
        super().__init__(game_object)
        self.fov = fov
        self.near = near
        self.far = far
        self.ortho = ortho
        self.ortho_size = ortho_size
        self.env_prompt = env_prompt or EnvPrompt()
        self._is_main = main
        Camera._cameras.append(self)

    def onDestroy(self):
        if self in Camera._cameras:
            Camera._cameras.remove(self)

    @classmethod
    def MainCamera(cls) -> Optional["Camera"]:
        for cam in cls._cameras:
            if cam._is_main and cam.gameObj.is_active:
                return cam
        return cls._cameras[0] if cls._cameras else None

    @classmethod
    def _clear(cls) -> None:
        cls._cameras.clear()

    @property
    def viewMatrix(self) -> np.ndarray:
        """World -> view (inverse of the camera's global transform)."""
        return np.linalg.inv(self.transform.globalTransformMatrix).astype(np.float32)

    def projectionMatrix(self, aspect: float) -> np.ndarray:
        import jax.numpy as jnp

        from stable_renderer_tpu.ops.transforms import orthographic, perspective

        if self.ortho:
            return np.asarray(orthographic(self.ortho_size, aspect, self.near, self.far))
        return np.asarray(perspective(self.fov, aspect, self.near, self.far))
