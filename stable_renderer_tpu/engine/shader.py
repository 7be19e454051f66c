"""Programmable shader system — user shading functions compiled into the draw.

Capability match for the reference's GLSL shader framework
(reference: engine/static/shader.py — Shader program objects :391-570 with a
named registry and default shaders, ShaderStruct UBO reflection :247-389).

The TPU redesign: a "shader" is a pair of jittable Python functions instead
of GLSL source. They trace into the same compiled draw pass as the fixed
pipeline (ops/gbuffer.py shade_draw) — XLA fuses user shading into the
rasterizer program, so a custom shader costs no extra dispatch:

  * ``vertex_fn(positions, normals, mv, proj) -> (clip, view_pos,
    view_normal)`` replaces the vertex stage (optional);
  * ``fragment_fn(frag: FragmentInputs, uniforms: dict) -> (H, W, 4) color``
    replaces the fixed color stage (optional). ``frag`` carries the
    interpolated attributes the GLSL fragment shader would see.

``ShaderStruct`` replaces the UBO reflection machinery: a declarative bundle
of uniform arrays handed to ``fragment_fn``; binding points are obsolete —
pytree args replace buffer binding.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


class FragmentInputs(NamedTuple):
    """What the GLSL fragment stage would see (gbuffer.frag in-attributes)."""

    view_pos: jax.Array      # (H, W, 3) view-space position
    normal: jax.Array        # (H, W, 3) unit view-space normal
    uv: jax.Array            # (H, W, 2)
    vertex_color: jax.Array  # (H, W, 3)
    color: jax.Array         # (H, W, 4) fixed-pipeline color (texture/vcol)
    covered: jax.Array       # (H, W) bool — fragment covered by this draw


class ShaderStruct:
    """Uniform bundle (reference ShaderStruct, shader.py:247-389). Subclass
    with class-level defaults or pass kwargs; ``uniforms()`` returns the
    jnp-converted dict fed to fragment_fn. Binding-point bookkeeping from the
    GL version is obsolete (pytree args replace UBOs)."""

    def __init__(self, **kwargs):
        fields = {
            k: v for k, v in vars(type(self)).items()
            if not k.startswith("_") and not callable(v)
        }
        fields.update(kwargs)
        self._fields = fields
        for k, v in fields.items():
            setattr(self, k, v)

    def uniforms(self) -> Dict[str, jax.Array]:
        return {k: jnp.asarray(v) for k, v in self._fields.items()}


_SHADERS: Dict[str, "Shader"] = {}


class Shader:
    """Named shader program (reference Shader, shader.py:391-570)."""

    def __init__(self, name: str,
                 fragment_fn: Optional[Callable] = None,
                 vertex_fn: Optional[Callable] = None,
                 uniforms: Optional[ShaderStruct] = None):
        self.name = name
        self.fragment_fn = fragment_fn
        self.vertex_fn = vertex_fn
        self.uniform_struct = uniforms
        _SHADERS[name] = self

    # --- registry (reference Shader.Find / all shader programs) ---

    @classmethod
    def Find(cls, name: str) -> Optional["Shader"]:
        return _SHADERS.get(name)

    @classmethod
    def AllShaders(cls) -> Dict[str, "Shader"]:
        return dict(_SHADERS)

    # --- defaults (reference Shader.Default* lazy singletons) ---

    @classmethod
    def Default(cls) -> "Shader":
        """Fixed pipeline: both stages None -> shade_draw's builtin path."""
        return _SHADERS.get("default") or cls("default")

    @classmethod
    def DefaultDebug(cls) -> "Shader":
        """Visualize normals (the reference's debug shader)."""
        if "debug_normals" in _SHADERS:
            return _SHADERS["debug_normals"]

        def frag(f: FragmentInputs, uniforms: dict) -> jax.Array:
            rgb = f.normal * 0.5 + 0.5
            return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], -1)

        return cls("debug_normals", fragment_fn=frag)

    def bound_fragment(self) -> Optional[Callable]:
        """Close the uniform struct over fragment_fn -> shade_draw's hook
        signature (frag_inputs) -> color. Memoized: the hook is a static jit
        arg, so identity stability prevents per-frame retraces."""
        if self.fragment_fn is None:
            return None
        if getattr(self, "_bound", None) is None:
            fn = self.fragment_fn
            uni = ({} if self.uniform_struct is None
                   else self.uniform_struct.uniforms())

            def bound(frag: FragmentInputs) -> jax.Array:
                return fn(frag, uni)

            self._bound = bound
        return self._bound

    def __repr__(self) -> str:
        stages = [s for s, f in (("vert", self.vertex_fn), ("frag", self.fragment_fn)) if f]
        return f"<Shader {self.name} [{'+'.join(stages) or 'fixed'}]>"
