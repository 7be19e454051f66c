"""Sequence loaders + media utilities + scene conditioning tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from stable_renderer_tpu.data.loaders import (
    load_image_sequence,
    load_noise_sequence,
    virtual_engine_data,
)
from stable_renderer_tpu.utils.media import (
    rgba_threshold,
    rgba_to_rgb,
    text_concat,
    text_replace,
    write_gif,
)


def _make_dumps(tmp_path, n=3, h=16, w=16):
    (tmp_path / "color").mkdir()
    (tmp_path / "id").mkdir()
    (tmp_path / "noise").mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "color" / f"color_{i}.png")
        ids = np.zeros((h, w, 4), np.int32)
        ids[4:12, 4:12] = [1, 1, 2, 5]
        np.save(tmp_path / "id" / f"id_{i}.npy", ids)
        np.save(tmp_path / "noise" / f"noise_{i}.npy", rng.standard_normal((h, w, 4)).astype(np.float32))
    return tmp_path


def test_image_sequence_order_and_range(tmp_path):
    _make_dumps(tmp_path)
    seq = load_image_sequence(tmp_path / "color")
    assert seq.shape == (3, 16, 16, 3)
    assert seq.min() >= 0 and seq.max() <= 1
    seq2 = load_image_sequence(tmp_path / "color", frame_start=1, num_frames=1)
    assert seq2.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(seq2[0], seq[1])


def test_noise_sequence_pooled_and_renormed(tmp_path):
    _make_dumps(tmp_path)
    noise = load_noise_sequence(tmp_path / "noise", pool=8)
    assert noise.shape == (3, 2, 2, 4)
    assert np.isfinite(noise).all()


def test_virtual_engine_data(tmp_path):
    _make_dumps(tmp_path)
    ed = virtual_engine_data(
        color_dir=tmp_path / "color",
        id_dir=tmp_path / "id",
        noise_dir=tmp_path / "noise",
        prompt="bg",
    )
    assert ed.frame_count == 3
    assert ed.color_maps.shape == (3, 16, 16, 3)
    assert ed.id_maps.shape == (3, 16, 16, 4)
    assert ed.masks.shape == (3, 16, 16)
    assert float(ed.masks[0, 0, 0]) == 1.0  # background
    assert float(ed.masks[0, 8, 8]) == 0.0  # sprite
    assert ed.env_prompts[0].prompt == "bg"


def test_media_utils(tmp_path):
    rgba = np.zeros((4, 4, 4), np.float32)
    rgba[..., 0] = 1.0
    rgba[..., 3] = 0.5
    rgb = rgba_to_rgb(rgba, background=(0, 0, 1))
    np.testing.assert_allclose(rgb[0, 0], [0.5, 0.0, 0.5])
    th = rgba_threshold(rgba, 0.4)
    assert (th[..., 3] == 1.0).all()
    assert text_concat("a", "", "b") == "a, b"
    assert text_replace("a cat", "cat", "dog") == "a dog"
    frames = [np.full((8, 8, 3), v, np.float32) for v in (0.1, 0.9)]
    path = write_gif(frames, tmp_path / "out.gif", fps=4)
    img = Image.open(path)
    assert img.n_frames == 2


def test_scene_conditioning_masks_and_denoiser():
    from stable_renderer_tpu.models import TINY_UNET_CONFIG, UNetModel
    from stable_renderer_tpu.models.sampling import ModelSampling
    from stable_renderer_tpu.models.sampling.scene_cond import (
        make_scene_denoiser,
        sprite_masks,
    )

    ids = np.zeros((1, 16, 16, 4), np.int32)
    ids[0, :8, :8] = [3, 1, 0, 1]   # sprite 3 top-left
    ids[0, 8:, 8:] = [5, 1, 0, 2]   # sprite 5 bottom-right
    masks = sprite_masks(jnp.asarray(ids), (3, 5), 8, 8)
    assert masks.shape == (3, 1, 8, 8)
    np.testing.assert_allclose(np.asarray(masks).sum(0), 1.0)  # partition of unity
    assert float(masks[0, 0, 0, 0]) == 1.0  # sprite 3 region
    assert float(masks[1, 0, 7, 7]) == 1.0  # sprite 5 region
    assert float(masks[2, 0, 0, 7]) == 1.0  # background

    unet = UNetModel(TINY_UNET_CONFIG)
    params = unet.init(jax.random.PRNGKey(0))
    ms = ModelSampling()
    ctxs = jnp.stack(
        [jnp.full((1, 77, TINY_UNET_CONFIG.context_dim), v) for v in (0.1, -0.1, 0.0)]
    )
    uncond = jnp.zeros((1, 77, TINY_UNET_CONFIG.context_dim))
    den = make_scene_denoiser(
        unet, params, ctxs, masks, uncond, jnp.asarray(ms.log_sigmas), cfg_scale=2.0
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    out = jax.jit(den)(x, jnp.asarray(5.0))
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_scene_conditioning_in_pipeline():
    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.data.sprite import Sprite
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.workflow.config import RenderConfig

    pipe = DiffusionPipeline.from_random(
        RenderConfig(steps=2, cfg_scale=2.0, sampler="euler", scheduler="normal"),
        tiny=True,
    )
    ids = np.zeros((1, 32, 32, 4), np.int32)
    ids[0, :16, :16] = [1, 1, 0, 1]
    ids[0, 16:, 16:] = [2, 1, 0, 2]
    ed = EngineData(
        frame_indices=jnp.asarray([0]),
        color_maps=jnp.full((1, 32, 32, 3), 0.5),
        id_maps=jnp.asarray(ids),
        sprite_infos={
            1: Sprite(spriteID=1, prompt="a red ball"),
            2: Sprite(spriteID=2, prompt="a blue cube"),
        },
    )
    out = pipe.render(ed)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_keep_background_inpaint_mode():
    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.workflow.config import RenderConfig

    import numpy as _np

    pipe = DiffusionPipeline.from_random(
        RenderConfig(steps=2, cfg_scale=1.0, sampler="euler", scheduler="normal",
                     keep_background=True, vertex_noise=False),
        tiny=True,
    )
    ids = _np.zeros((1, 32, 32, 4), _np.int32)
    ids[0, 8:24, 8:24] = [1, 1, 0, 5]
    ed = EngineData(
        frame_indices=jnp.asarray([0]),
        color_maps=jnp.full((1, 32, 32, 3), 0.5),
        id_maps=jnp.asarray(ids),
    )
    out = pipe.render(ed)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
