from stable_renderer_tpu.workflow.config import RenderConfig, ControlNetSpec
from stable_renderer_tpu.workflow.loader import Workflow

__all__ = ["RenderConfig", "ControlNetSpec", "Workflow"]
