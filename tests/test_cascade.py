"""Stable Cascade (Würstchen v3) tests: Stage C prior + Stage B decoder,
cosine sampling, nodes — tiny configs, end-to-end C -> B (VERDICT r2 gap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.cascade import (
    CascadeStageB,
    CascadeStageC,
    STAGE_B_CONFIG,
    STAGE_C_CONFIG,
    TINY_CASCADE_B_CONFIG,
    TINY_CASCADE_C_CONFIG,
)
from stable_renderer_tpu.workflow.executor import NODE_REGISTRY, InferenceContext


class _N:
    def __init__(self, type, widgets=None, id=1):
        self.type = type
        self.widgets = widgets or []
        self.id = id


def test_stage_c_forward_shapes():
    m = CascadeStageC(TINY_CASCADE_C_CONFIG)
    p = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    r = jnp.asarray([0.9, 0.5])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (2, 7, TINY_CASCADE_C_CONFIG.c_clip_text))
    y = jax.random.normal(jax.random.PRNGKey(3),
                          (2, TINY_CASCADE_C_CONFIG.c_clip_text_pooled))
    out = m.apply(p, x, r, ctx, y=y)
    assert out.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()
    # conditioning matters: a different text sequence changes the output
    out2 = m.apply(p, x, r, ctx + 1.0, y=y)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_stage_b_forward_with_effnet_prior():
    m = CascadeStageB(TINY_CASCADE_B_CONFIG)
    p = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    r = jnp.asarray([0.8, 0.3])
    clip = jax.random.normal(jax.random.PRNGKey(2),
                             (2, 1, TINY_CASCADE_B_CONFIG.c_clip))
    effnet = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 16))
    out = m.apply(p, x, r, clip, effnet=effnet)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # the Stage-C prior steers the decode
    out2 = m.apply(p, x, r, clip, effnet=effnet * 2.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_full_config_param_keys_exist():
    """The FULL Stage C/B trees carry the expected checkpoint key roots (the
    layout real cascade checkpoints re-nest into) without materializing the
    multi-GB weights (eval_shape only)."""
    from stable_renderer_tpu.models.weights import flatten

    tree_c = jax.eval_shape(
        lambda: CascadeStageC(STAGE_C_CONFIG).init(jax.random.PRNGKey(0)))
    keys_c = set(flatten(tree_c))
    for k in ("clip_txt_mapper.weight", "clip_txt_pooled_mapper.weight",
              "clip_img_mapper.weight", "embedding.1.weight", "clf.1.weight",
              "down_blocks.0.0.depthwise.weight",
              "down_blocks.0.0.channelwise.0.weight",
              "down_blocks.0.0.channelwise.2.gamma",
              "down_blocks.0.1.mapper.weight",
              "down_blocks.0.1.mapper_sca.weight",
              "down_blocks.0.1.mapper_crp.weight",
              "down_blocks.0.2.attention.attn.to_q.weight",
              "down_blocks.0.2.kv_mapper.1.weight",
              "down_downscalers.1.1.blocks.0.weight",
              "up_upscalers.0.1.blocks.1.weight"):
        assert k in keys_c, k
    # the outer up level's first block takes the level skip (c + c_skip);
    # the innermost (first traversed) takes none (stage_c.py c_skip rule)
    flat_c = dict(flatten(tree_c))
    assert flat_c["up_blocks.1.0.channelwise.0.weight"].shape[1] == \
        STAGE_C_CONFIG.c_hidden[0] * 2
    assert flat_c["up_blocks.0.0.channelwise.0.weight"].shape[1] == \
        STAGE_C_CONFIG.c_hidden[1]

    tree_b = jax.eval_shape(
        lambda: CascadeStageB(STAGE_B_CONFIG).init(jax.random.PRNGKey(0)))
    keys_b = set(flatten(tree_b))
    for k in ("effnet_mapper.0.weight", "effnet_mapper.2.weight",
              "pixels_mapper.0.weight", "clip_mapper.weight",
              "embedding.1.weight", "down_downscalers.1.1.weight",
              "up_upscalers.0.1.weight", "up_repeat_mappers.0.1.weight"):
        assert k in keys_b, k


def test_cascade_end_to_end_c_then_b():
    """The full two-stage pipeline through the executor: Stage C prior
    sampling -> StageB_Conditioning -> Stage B decode sampling
    (nodes_stable_cascade.py graph shape)."""
    ictx = InferenceContext(model_dirs=(), jit_cache={})
    (model_c,) = NODE_REGISTRY["CascadeStageLoader"](
        ictx, _N("CascadeStageLoader", ["stage_c.safetensors"]))
    (model_b,) = NODE_REGISTRY["CascadeStageLoader"](
        ictx, _N("CascadeStageLoader", ["stage_b.safetensors"], id=2))
    assert model_c["sampling"].shift == 2.0
    assert model_b["sampling"].shift == 1.0

    lat_c, lat_b = NODE_REGISTRY["StableCascade_EmptyLatentImage"](
        ictx, _N("StableCascade_EmptyLatentImage", [256, 256, 32, 1]))
    assert lat_c["samples"].shape == (1, 8, 8, 16)
    assert lat_b["samples"].shape == (1, 64, 64, 4)

    cfg_c = TINY_CASCADE_C_CONFIG
    pos_c = {"context": jax.random.normal(jax.random.PRNGKey(1),
                                          (1, 7, cfg_c.c_clip_text)),
             "y": jax.random.normal(jax.random.PRNGKey(2),
                                    (1, cfg_c.c_clip_text_pooled))}
    neg_c = {"context": jnp.zeros((1, 7, cfg_c.c_clip_text)),
             "y": jnp.zeros((1, cfg_c.c_clip_text_pooled))}
    (prior_out,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", [0, "fixed", 3, 2.0, "euler", "simple", 1.0], id=10),
        model=model_c, positive=pos_c, negative=neg_c, latent_image=lat_c)
    prior = np.asarray(prior_out["samples"])
    assert prior.shape == (1, 8, 8, 16) and np.isfinite(prior).all()

    pos_b = {"context": jax.random.normal(jax.random.PRNGKey(3),
                                          (1, 1, TINY_CASCADE_B_CONFIG.c_clip))}
    (pos_b2,) = NODE_REGISTRY["StableCascade_StageB_Conditioning"](
        ictx, _N("StableCascade_StageB_Conditioning"),
        conditioning=pos_b, stage_c=prior_out)
    assert "stable_cascade_prior" in pos_b2
    (out_b,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", [0, "fixed", 3, 1.5, "euler", "simple", 1.0], id=11),
        model=model_b, positive=pos_b2, negative={"context": jnp.zeros_like(pos_b["context"])},
        latent_image=lat_b)
    img_latent = np.asarray(out_b["samples"])
    assert img_latent.shape == (1, 64, 64, 4) and np.isfinite(img_latent).all()

    # the prior steers stage B: a different prior gives a different decode
    (pos_b3,) = NODE_REGISTRY["StableCascade_StageB_Conditioning"](
        ictx, _N("StableCascade_StageB_Conditioning"),
        conditioning=pos_b, stage_c={"samples": prior_out["samples"] + 3.0})
    (out_b2,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", [0, "fixed", 3, 1.5, "euler", "simple", 1.0], id=11),
        model=model_b, positive=pos_b3, negative={"context": jnp.zeros_like(pos_b["context"])},
        latent_image=lat_b)
    assert not np.allclose(img_latent, np.asarray(out_b2["samples"]))


def test_cascade_sampling_schedule():
    from stable_renderer_tpu.models.sampling import calculate_sigmas
    from stable_renderer_tpu.models.sampling.schedules import ModelSamplingCascade

    ms = ModelSamplingCascade(shift=2.0)
    sig = calculate_sigmas(ms, "simple", 8)
    assert sig[0] > sig[-2] > sig[-1] == 0.0
    # t_of_sigma inverts sigma_of_t (shift=1 closed form)
    ms1 = ModelSamplingCascade(shift=1.0)
    t = np.asarray([0.9, 0.5, 0.1])
    np.testing.assert_allclose(ms1.t_of_sigma(ms1.sigma_of_t(t)), t, atol=1e-4)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
