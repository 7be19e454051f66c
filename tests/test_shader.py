"""Programmable shader system tests (VERDICT r1 §2.1 'Shader system: partial';
reference shader.py:247-570 ShaderStruct + Shader programs)."""

import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.engine.shader import FragmentInputs, Shader, ShaderStruct


def setup_function(_fn):
    Shader.AllShaders().clear()


def test_shader_registry_and_defaults():
    s = Shader("mine")
    assert Shader.Find("mine") is s
    d = Shader.Default()
    assert d.fragment_fn is None and d.vertex_fn is None
    dbg = Shader.DefaultDebug()
    assert dbg.fragment_fn is not None
    assert Shader.Find("debug_normals") is dbg


def test_shader_struct_uniforms():
    class Tint(ShaderStruct):
        tint = (1.0, 0.5, 0.0)
        strength = 2.0

    t = Tint(strength=3.0)
    uni = t.uniforms()
    np.testing.assert_allclose(np.asarray(uni["tint"]), [1.0, 0.5, 0.0])
    assert float(uni["strength"]) == 3.0


def test_bound_fragment_is_memoized():
    def frag(f, uni):
        return f.color

    s = Shader("memo", fragment_fn=frag)
    assert s.bound_fragment() is s.bound_fragment()  # jit static-arg stability


def test_custom_fragment_shader_in_engine_render():
    """A user fragment shader compiled into the real draw pass changes the
    rendered frame (the reference's custom-GLSL capability, shader.py:391)."""
    from stable_renderer_tpu.engine.camera import Camera
    from stable_renderer_tpu.engine.engine import Engine
    from stable_renderer_tpu.engine.gameobj import GameObject
    from stable_renderer_tpu.engine.material import Material
    from stable_renderer_tpu.engine.mesh import Mesh
    from stable_renderer_tpu.engine.renderers import MeshRenderer

    class Tint(ShaderStruct):
        tint = (1.0, 0.0, 0.0)

    def red_frag(f: FragmentInputs, uni) -> jnp.ndarray:
        rgb = jnp.broadcast_to(uni["tint"], f.color[..., :3].shape)
        return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], -1)

    def run(shader):
        Engine._reset()

        class App(Engine):
            def beforePrepare(self):
                mat = Material.DefaultOpaqueMaterial()
                mat.shader = shader
                go = GameObject("ball")
                go.addComponent(MeshRenderer, mesh=Mesh.Sphere(segments=12),
                                materials=[mat])
                cam = GameObject("cam")
                cam.addComponent(Camera)
                cam.transform.position = [0.0, 0.5, 3.0]
                cam.transform.lookAt([0.0, 0.0, 0.0])

        eng = App.Run(winSize=(48, 48), disableComfyUI=True, max_frames=1,
                      keep_frames_in_memory=True)
        return np.asarray(eng.WindowManager.frames[0]).astype(np.float32) / 255.0

    plain = run(None)
    red = run(Shader("red", fragment_fn=red_frag, uniforms=Tint()))
    assert not np.allclose(plain, red, atol=1e-2)
    # covered pixels are pure red
    covered = red[..., 0] > 0.5
    assert covered.sum() > 50
    assert red[covered][:, 1].max() < 0.1 and red[covered][:, 2].max() < 0.1
    Engine._reset()
