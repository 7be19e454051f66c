from stable_renderer_tpu.engine.mesh import Mesh
from stable_renderer_tpu.engine.gameobj import GameObject, Component
from stable_renderer_tpu.engine.transform import Transform
from stable_renderer_tpu.engine.camera import Camera
from stable_renderer_tpu.engine.texture import Texture
from stable_renderer_tpu.engine.material import Material, DefaultTextureType, RenderOrder
from stable_renderer_tpu.engine.renderers import (
    MeshRenderer,
    CorrMapRenderer,
    SpriteInfo,
    Light,
    DirectionalLight,
    PointLight,
    SpotLight,
    DrawCall,
)
from stable_renderer_tpu.engine.controls import (
    AutoRotation,
    CameraController,
    CircularOrbit,
    EqualIntervalRotation,
    HelicalOrbit,
    RigidBody,
    RigidController,
)
from stable_renderer_tpu.engine.scene import Scene
from stable_renderer_tpu.engine.engine import Engine, EngineMode
from stable_renderer_tpu.engine.pipeline import DiffusionPipeline

__all__ = [
    "Mesh",
    "GameObject",
    "Component",
    "Transform",
    "Camera",
    "Texture",
    "Material",
    "DefaultTextureType",
    "RenderOrder",
    "MeshRenderer",
    "CorrMapRenderer",
    "SpriteInfo",
    "Light",
    "DirectionalLight",
    "PointLight",
    "SpotLight",
    "DrawCall",
    "AutoRotation",
    "CameraController",
    "CircularOrbit",
    "EqualIntervalRotation",
    "HelicalOrbit",
    "RigidBody",
    "RigidController",
    "Scene",
    "Engine",
    "EngineMode",
    "DiffusionPipeline",
]
