from stable_renderer_tpu.engine.mesh import Mesh

__all__ = ["Mesh"]
