"""ResourcesObj / ResourcesManager tests (VERDICT r1 §2.1 ResourcesManager +
ResourcesObj partials; reference resources_obj.py:30-213,
resourcesManager.py:12-60)."""

import numpy as np

from stable_renderer_tpu.engine.resources import (
    MeshResource,
    ResourcesObj,
    TextureResource,
    _clear_all,
    drain_destroy_queue,
    drain_load_queue,
)


def setup_function(_fn):
    _clear_all()


class _Probe(ResourcesObj):
    BaseClsName = "Probe"
    LoadOrder = 50
    loads = []

    def _load(self):
        _Probe.loads.append(self.alias)


class _EarlyProbe(_Probe):
    LoadOrder = 1


class _ProbeFmtA(_Probe):
    Format = ".foo"


def test_load_order_and_deferred_queue():
    _Probe.loads = []
    a = _Probe(alias="late")
    b = _EarlyProbe(alias="early")
    assert not a.loaded and not b.loaded
    n = drain_load_queue()
    assert n == 2
    assert _Probe.loads == ["early", "late"]  # LoadOrder sorted
    assert a.loaded and b.loaded
    # idempotent: nothing left
    assert drain_load_queue() == 0


def test_named_registry_and_format_dispatch():
    _Probe.loads = []
    obj = _Probe(name="hero", immediate_load=True)
    assert _Probe.Find("hero") is obj
    assert ResourcesObj.Find("hero") is obj          # cross-class lookup
    assert _Probe.Find("nope") is None
    assert _Probe.FindFormatCls("foo") is _ProbeFmtA  # '.foo' normalized
    assert _Probe.FindFormatCls(".FOO") is _ProbeFmtA
    assert _Probe.FindFormatCls("bar") is None
    obj.destroy()
    assert _Probe.Find("hero") is None  # destroyed objects unregister


def test_destroy_queue():
    _Probe.loads = []
    obj = _Probe(alias="x", immediate_load=True)
    obj.defer_destroy()
    assert not obj._destroyed
    assert drain_destroy_queue() == 1
    assert obj._destroyed and not obj.loaded
    # destroying again is a no-op
    obj.defer_destroy()
    assert drain_destroy_queue() == 0


def test_mesh_resource_uploads_buffers():
    from stable_renderer_tpu.engine.mesh import Mesh

    mesh = Mesh.Plane()
    res = MeshResource(mesh, name="plane0")
    assert res.buffers is None
    drain_load_queue()
    assert res.buffers is not None
    assert res.buffers["positions"].shape == mesh.positions.shape
    assert MeshResource.Find("plane0") is res


def test_texture_resource_roundtrip():
    img = np.random.rand(8, 8, 3).astype(np.float32)
    t = TextureResource(img, immediate_load=True)
    np.testing.assert_allclose(np.asarray(t.device), img)
    t.destroy()
    assert t.device is None


def test_engine_prepare_drains_resource_queue():
    """MeshRenderer registers its mesh; ResourcesManager.prepare uploads it
    before the first frame (the reference's batched sendToGPU pass)."""
    from stable_renderer_tpu.engine.camera import Camera
    from stable_renderer_tpu.engine.engine import Engine
    from stable_renderer_tpu.engine.gameobj import GameObject
    from stable_renderer_tpu.engine.mesh import Mesh
    from stable_renderer_tpu.engine.renderers import MeshRenderer

    Engine._reset()
    uploaded = {}

    class App(Engine):
        def beforePrepare(self):
            go = GameObject("ball")
            go.addComponent(MeshRenderer, mesh=Mesh.Sphere(segments=8))
            cam = GameObject("cam")
            cam.addComponent(Camera)
            cam.transform.position = [0, 0, 3]

        def afterPrepare(self):
            rend = GameObject.find_by_name("ball").getComponent(MeshRenderer)
            uploaded["buffers"] = rend._mesh_resource.buffers

    App.Run(winSize=(32, 32), disableComfyUI=True, max_frames=1)
    assert uploaded["buffers"] is not None  # uploaded during prepare, pre-loop
    Engine._reset()
