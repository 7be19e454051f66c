"""SVD img2vid family tests (VERDICT r2 #7): temporal UNet, EDM sampling,
video nodes — tiny configs, end-to-end frame sequences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models.video_unet import (
    TINY_VIDEO_UNET_CONFIG,
    VideoUNetModel,
    svd_adm_vector,
)
from stable_renderer_tpu.workflow.executor import NODE_REGISTRY, InferenceContext


class _N:
    def __init__(self, type, widgets=None, id=1):
        self.type = type
        self.widgets = widgets or []
        self.id = id


def test_video_unet_forward_shapes_and_temporal_mixing():
    """The temporal stages mix information ACROSS frames: changing frame 0's
    input changes frame 1's output (a spatial-only UNet cannot do that)."""
    unet = VideoUNetModel(TINY_VIDEO_UNET_CONFIG)
    params = unet.init(jax.random.PRNGKey(0))
    t_frames = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (t_frames, 8, 8, 8))
    ts = jnp.full((t_frames,), 0.5)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (t_frames, 1, TINY_VIDEO_UNET_CONFIG.context_dim))
    y = jnp.zeros((t_frames, TINY_VIDEO_UNET_CONFIG.adm_in_channels))
    out = unet.apply(params, x, ts, ctx, y=y)
    assert out.shape == (t_frames, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()

    x2 = x.at[0].add(1.0)  # perturb only frame 0
    out2 = unet.apply(params, x2, ts, ctx, y=y)
    assert not np.allclose(np.asarray(out[1]), np.asarray(out2[1])), (
        "temporal blocks did not propagate frame-0 information to frame 1")


def test_video_unet_cfg_batch_groups():
    """With num_frames=T a 2T batch is processed as [cond, uncond] groups:
    the uncond half equals a separate T-batch run (no cross-group leakage)."""
    cfg = TINY_VIDEO_UNET_CONFIG
    t_frames = 3
    unet_t = VideoUNetModel(cfg, num_frames=t_frames)
    params = unet_t.init(jax.random.PRNGKey(0))
    xa = jax.random.normal(jax.random.PRNGKey(1), (t_frames, 8, 8, 8))
    xb = jax.random.normal(jax.random.PRNGKey(2), (t_frames, 8, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (t_frames, 1, TINY_VIDEO_UNET_CONFIG.context_dim))
    y = jnp.zeros((t_frames, cfg.adm_in_channels))
    ts = jnp.full((t_frames,), 0.5)
    both = unet_t.apply(
        params, jnp.concatenate([xa, xb]), jnp.concatenate([ts, ts]),
        jnp.concatenate([ctx, ctx]), y=jnp.concatenate([y, y]))
    solo_b = unet_t.apply(params, xb, ts, ctx, y=y)
    np.testing.assert_allclose(np.asarray(both[t_frames:]), np.asarray(solo_b),
                               atol=1e-4)


def test_svd_checkpoint_detection():
    from stable_renderer_tpu.models.weights import detect_unet_config, flatten
    from stable_renderer_tpu.models.video_unet import VideoUNetConfig

    unet = VideoUNetModel(TINY_VIDEO_UNET_CONFIG)
    params = unet.init(jax.random.PRNGKey(0))
    flat = {f"model.diffusion_model.{k}": np.asarray(v)
            for k, v in flatten(params).items()}
    cfg = detect_unet_config(flat)
    assert isinstance(cfg, VideoUNetConfig)
    assert cfg.in_channels == 8


def test_svd_adm_vector_layout():
    y = svd_adm_vector(5.0, 127.0, 0.0, n=4)
    assert y.shape == (4, 768)  # 3 x 256-wide Timestep embeddings


def test_svd_img2vid_end_to_end_graph():
    """ImageOnlyCheckpointLoader -> SVD_img2vid_Conditioning ->
    VideoLinearCFGGuidance -> KSampler -> VAEDecode produces a frame
    sequence (nodes_video_model.py graph, tiny models)."""
    ictx = InferenceContext(model_dirs=(), jit_cache={})
    model, clip_vision, vae = NODE_REGISTRY["ImageOnlyCheckpointLoader"](
        ictx, _N("ImageOnlyCheckpointLoader", ["none.safetensors"]))
    init_image = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 32, 3))
    pos, neg, latent = NODE_REGISTRY["SVD_img2vid_Conditioning"](
        ictx, _N("SVD_img2vid_Conditioning", [32, 32, 4, 127, 6, 0.0]),
        clip_vision=clip_vision, init_image=init_image, vae=vae)
    assert latent["samples"].shape[0] == 4
    assert pos["concat_latent_image"].shape[-1] == 4
    assert pos["y"].shape == (1, 768)
    (m2,) = NODE_REGISTRY["VideoLinearCFGGuidance"](
        ictx, _N("VideoLinearCFGGuidance", [1.0]), model=model)
    (out,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", [0, "fixed", 2, 2.5, "euler", "karras", 1.0]),
        model=m2, positive=pos, negative=neg, latent_image=latent)
    z = out["samples"]
    assert z.shape[0] == 4
    assert np.isfinite(np.asarray(z)).all()
    (frames,) = NODE_REGISTRY["VAEDecode"](
        ictx, _N("VAEDecode"), samples=out, vae=vae)
    f = np.asarray(frames)
    assert f.shape[0] == 4 and f.shape[-1] == 3
    assert np.isfinite(f).all()
    # frames differ (it is a video, not a repeated image)
    assert not np.allclose(f[0], f[-1])


def test_modelsampling_edm_schedule():
    from stable_renderer_tpu.models.sampling import calculate_sigmas
    from stable_renderer_tpu.models.sampling.schedules import ModelSamplingEDM

    ms = ModelSamplingEDM(prediction="v")
    assert ms.sigma_max == pytest.approx(700.0, rel=1e-3)
    assert ms.sigma_min == pytest.approx(0.002, rel=1e-3)
    sig = calculate_sigmas(ms, "karras", 6)
    assert sig[0] > sig[-2] > sig[-1] == 0.0
    # percent_to_sigma: log interpolation between the EDM bounds
    mid = ms.percent_to_sigma(0.5)
    assert 0.002 < mid < 700.0


def test_stable_zero123_conditioning_and_sample():
    """StableZero123_Conditioning (nodes_stable3d.py): camera-embedding context
    + image c_concat; the KSampler applies cc_projection when the model
    carries it and denoises an 8-channel Zero123-style UNet."""
    import dataclasses

    from stable_renderer_tpu.models.unet import TINY_UNET_CONFIG, UNetModel
    from stable_renderer_tpu.models.sampling.schedules import ModelSampling

    ictx = InferenceContext(model_dirs=(), jit_cache={})
    _, clip_vision, vae = NODE_REGISTRY["ImageOnlyCheckpointLoader"](
        ictx, _N("ImageOnlyCheckpointLoader", ["none.safetensors"]))
    init_image = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3))
    pos, neg, latent = NODE_REGISTRY["StableZero123_Conditioning"](
        ictx, _N("StableZero123_Conditioning", [32, 32, 2, 10.0, 45.0]),
        clip_vision=clip_vision, init_image=init_image, vae=vae)
    d_embed = pos["context"].shape[-1]
    assert d_embed >= 4  # clip embed + 4 camera dims
    assert latent["samples"].shape[0] == 2
    # Zero123-style model: 8-ch UNet + cc_projection (d_embed -> context_dim)
    u8 = UNetModel(dataclasses.replace(TINY_UNET_CONFIG, in_channels=8))
    ccp_w = np.random.randn(u8.config.context_dim, d_embed).astype(np.float32) * 0.02
    model = {"unet": u8, "params": u8.init(jax.random.PRNGKey(0)),
             "sampling": ModelSampling(),
             "cc_projection": {"weight": ccp_w,
                               "bias": np.zeros(u8.config.context_dim, np.float32)}}
    (out,) = NODE_REGISTRY["KSampler"](
        ictx, _N("KSampler", [0, "fixed", 2, 2.0, "euler", "normal", 1.0], id=31),
        model=model, positive=pos, negative=neg, latent_image=latent)
    z = np.asarray(out["samples"])
    assert z.shape == (2, *latent["samples"].shape[1:])
    assert np.isfinite(z).all()

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
