"""Engine checkpoint/resume round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.data.corrmap import CorrespondMap
from stable_renderer_tpu.data.sprite import Sprite
from stable_renderer_tpu.engine import Camera, Engine, GameObject, Mesh, MeshRenderer
from stable_renderer_tpu.engine.checkpoint import load_engine_state, save_engine_state


@pytest.fixture(autouse=True)
def clean():
    Engine._reset()
    yield
    Engine._reset()


def test_checkpoint_roundtrip(tmp_path):
    eng = Engine(winSize=(32, 32), disableComfyUI=True)
    cam = GameObject("cam")
    cam.addComponent(Camera)
    obj = GameObject("thing")
    obj.transform.localPosition = [1.0, 2.0, 3.0]
    eng.RuntimeManager.FrameCount = 17
    eng.RenderManager._sprites[4] = Sprite(spriteID=4, prompt="a thing")
    cmap = CorrespondMap(k=2, height=8, width=8)
    cmap.written = cmap.written.at[1, 3].set(True)
    cmap.values = cmap.values.at[1, 3].set(jnp.asarray([0.1, 0.2, 0.3, 1.0]))
    eng.RenderManager._corrmaps[(4, 2)] = cmap

    ckpt = save_engine_state(eng, tmp_path / "ck")

    Engine._reset()
    eng2 = Engine(winSize=(32, 32), disableComfyUI=True)
    state = load_engine_state(eng2, ckpt)
    assert eng2.RuntimeManager.FrameCount == 17
    assert eng2.RenderManager._sprites[4].prompt == "a thing"
    cm2 = eng2.RenderManager._corrmaps[(4, 2)]
    assert bool(cm2.written[1, 3])
    np.testing.assert_allclose(
        np.asarray(cm2.values[1, 3]), [0.1, 0.2, 0.3, 1.0], atol=1 / 254
    )
    # scene restored
    assert GameObject.find_by_name("thing") is not None
    np.testing.assert_allclose(
        GameObject.find_by_name("thing").transform.localPosition, [1, 2, 3]
    )
