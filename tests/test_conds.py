"""General conditioning semantics tests (area / mask / timestep-range blending,
comfy samplers.py:50-327) + executor wiring of clip_skip and masked prompts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models import TINY_UNET_CONFIG, UNetModel
from stable_renderer_tpu.models.sampling import ModelSampling
from stable_renderer_tpu.models.sampling.cfg import make_denoiser
from stable_renderer_tpu.models.sampling.conds import CondSpec, make_cond_denoiser


@pytest.fixture(scope="module")
def setup():
    unet = UNetModel(TINY_UNET_CONFIG)
    params = unet.init(jax.random.PRNGKey(0))
    ms = ModelSampling()
    log_sigmas = jnp.asarray(ms.log_sigmas)
    ctx_a = jnp.ones((1, 77, TINY_UNET_CONFIG.context_dim)) * 0.1
    ctx_b = jnp.full((1, 77, TINY_UNET_CONFIG.context_dim), -0.2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    return unet, params, ms, log_sigmas, ctx_a, ctx_b, x


def test_masked_conds_spatially_distinct(setup):
    """Left half conditioned by A, right half by B: each half must equal the
    corresponding single-cond denoiser output exactly."""
    unet, params, ms, log_sigmas, ctx_a, ctx_b, x = setup
    h = w = 16
    mask_l = jnp.zeros((1, h, w)).at[:, :, : w // 2].set(1.0)
    mask_r = 1.0 - mask_l
    den = make_cond_denoiser(
        unet, params, [ctx_a, ctx_b],
        [CondSpec(has_mask=True), CondSpec(has_mask=True)],
        [mask_l, mask_r], None, log_sigmas, cfg_scale=1.0,
    )
    out = den(x, jnp.asarray(5.0))
    den_a = make_denoiser(unet, params, ctx_a, None, log_sigmas)
    den_b = make_denoiser(unet, params, ctx_b, None, log_sigmas)
    out_a = den_a(x, jnp.asarray(5.0))
    out_b = den_b(x, jnp.asarray(5.0))
    np.testing.assert_allclose(
        np.asarray(out[:, :, : w // 2]), np.asarray(out_a[:, :, : w // 2]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :, w // 2 :]), np.asarray(out_b[:, :, w // 2 :]), atol=1e-4
    )
    # and the two halves genuinely differ (distinct conditioning)
    assert float(jnp.abs(out_a - out_b).mean()) > 1e-4


def test_timestep_range_gating(setup):
    """Cond B active only at high sigma: at low sigma output == pure-A."""
    unet, params, ms, log_sigmas, ctx_a, ctx_b, x = setup
    den = make_cond_denoiser(
        unet, params, [ctx_a, ctx_b],
        [CondSpec(), CondSpec(sigma_start=float("inf"), sigma_end=10.0)],
        [None, None], None, log_sigmas, cfg_scale=1.0,
    )
    den_a = make_denoiser(unet, params, ctx_a, None, log_sigmas)
    low = den(x, jnp.asarray(2.0))
    np.testing.assert_allclose(np.asarray(low), np.asarray(den_a(x, jnp.asarray(2.0))), atol=1e-4)
    high = den(x, jnp.asarray(13.0))
    # at high sigma B contributes: differs from pure A
    assert float(jnp.abs(high - den_a(x, jnp.asarray(13.0))).mean()) > 1e-5


def test_area_cond_outside_matches_base(setup):
    """An area cond must leave pixels outside its rectangle untouched."""
    unet, params, ms, log_sigmas, ctx_a, ctx_b, x = setup
    area = (8, 8, 0, 0)  # top-left 8x8
    den = make_cond_denoiser(
        unet, params, [ctx_a, ctx_b],
        [CondSpec(), CondSpec(area=area)],
        [None, None], None, log_sigmas, cfg_scale=1.0,
    )
    den_a = make_denoiser(unet, params, ctx_a, None, log_sigmas)
    out = den(x, jnp.asarray(5.0))
    base = den_a(x, jnp.asarray(5.0))
    np.testing.assert_allclose(np.asarray(out[:, 8:]), np.asarray(base[:, 8:]), atol=1e-4)
    assert float(jnp.abs(out[:, :8, :8] - base[:, :8, :8]).mean()) > 1e-6


def test_cfg_path_runs(setup):
    unet, params, ms, log_sigmas, ctx_a, ctx_b, x = setup
    den = make_cond_denoiser(
        unet, params, [ctx_a], [CondSpec()], [None],
        jnp.zeros_like(ctx_a), log_sigmas, cfg_scale=3.0,
    )
    out = jax.jit(den)(x, jnp.asarray(5.0))
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


# --- executor wiring ---------------------------------------------------------

def _node(id, type, widgets=None, inputs=None):
    from stable_renderer_tpu.workflow.loader import WorkflowNode

    return WorkflowNode(id=id, type=type, widgets=widgets or [],
                        inputs=inputs or {}, output_names=[])


def _wf(nodes):
    from stable_renderer_tpu.workflow import Workflow

    return Workflow(nodes={n.id: n for n in nodes}, unknown_types=[], path=None)


def _run(nodes, **kw):
    from stable_renderer_tpu.workflow.executor import PromptExecutor

    return PromptExecutor(_wf(nodes)).execute(**kw)


def test_clip_skip_changes_output():
    nodes = [
        _node(1, "CheckpointLoaderSimple", widgets=["none.safetensors"]),
        _node(2, "CLIPTextEncode", widgets=["a prompt"], inputs={"clip": (1, 1)}),
        _node(3, "CLIPSetLastLayer", widgets=[-2], inputs={"clip": (1, 1)}),
        _node(4, "CLIPTextEncode", widgets=["a prompt"], inputs={"clip": (3, 0)}),
    ]
    ctx = _run(nodes)
    base = np.asarray(ctx.outputs[2][0]["context"])
    skipped = np.asarray(ctx.outputs[4][0]["context"])
    assert base.shape == skipped.shape
    assert np.abs(base - skipped).mean() > 1e-6


def test_masked_text_encode_flows_to_sampler():
    import jax.numpy as jnp

    h = w = 16
    nodes = [
        _node(1, "CheckpointLoaderSimple", widgets=["none.safetensors"]),
        _node(8, "SolidMask", widgets=[0.0, w * 8, h * 8]),
        _node(9, "SolidMask", widgets=[1.0, w * 4, h * 8]),
        _node(10, "MaskComposite", widgets=[0, 0, "add"],  # left half = 1
              inputs={"destination": (8, 0), "source": (9, 0)}),
        _node(2, "MaskedTextEncode", widgets=["left thing"],
              inputs={"clip": (1, 1), "mask": (10, 0)}),
        _node(3, "CLIPTextEncode", widgets=["right thing"], inputs={"clip": (1, 1)}),
        _node(4, "ConditioningCombine",
              inputs={"conditioning_1": (2, 0), "conditioning_2": (3, 0)}),
        _node(5, "CLIPTextEncode", widgets=["bad"], inputs={"clip": (1, 1)}),
        _node(6, "EmptyLatentImage", widgets=[w * 8, h * 8, 1]),
        _node(7, "KSampler", widgets=[0, "fixed", 2, 2.0, "euler", "normal", 1.0],
              inputs={"model": (1, 0), "positive": (4, 0), "negative": (5, 0),
                      "latent_image": (6, 0)}),
    ]
    ctx = _run(nodes)
    cond = ctx.outputs[4][0]
    assert cond.get("mask") is not None  # mask survived the combine
    out = ctx.outputs[7][0]["samples"]
    assert out.shape == (1, h, w, 4)
    assert bool(jnp.isfinite(out).all())


def test_scene_text_encode_uses_sprite_masks():
    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.data.sprite import EnvPrompt, Sprite

    n, h, w = 1, 32, 32
    ids = np.zeros((n, h, w, 4), np.int32)
    ids[:, :, :16] = [1, 1, 4, 7]
    ids[:, :, 16:] = [2, 1, 4, 9]
    ed = EngineData(
        frame_indices=jnp.arange(n),
        color_maps=jnp.full((n, h, w, 3), 0.5),
        id_maps=jnp.asarray(ids),
        noise_maps=jnp.zeros((n, h // 8, w // 8, 4)),
        sprite_infos={1: Sprite(spriteID=1, prompt="red robot"),
                      2: Sprite(spriteID=2, prompt="blue tree")},
        env_prompts=(EnvPrompt(prompt="night sky"),),
    )
    nodes = [
        _node(1, "CheckpointLoaderSimple", widgets=["none.safetensors"]),
        _node(2, "SceneTextEncode", inputs={"clip": (1, 1)}),
        _node(3, "CLIPTextEncode", widgets=["bad"], inputs={"clip": (1, 1)}),
        _node(4, "EmptyLatentImage", widgets=[w, h, 1]),
        _node(5, "KSampler", widgets=[0, "fixed", 2, 2.0, "euler", "normal", 1.0],
              inputs={"model": (1, 0), "positive": (2, 0), "negative": (3, 0),
                      "latent_image": (4, 0)}),
    ]
    ctx = _run(nodes, engine_data=ed)
    cond = ctx.outputs[2][0]
    assert cond.get("scene_contexts") is not None
    assert cond["scene_contexts"].shape[0] == 3  # 2 sprites + env
    assert cond["sprite_ids"] == (1, 2)
    out = ctx.outputs[5][0]["samples"]
    assert bool(jnp.isfinite(out).all())
