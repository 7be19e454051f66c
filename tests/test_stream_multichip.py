"""Stream-pipeline multi-chip latency mode + lag-1 KV correspondence
(VERDICT r3 missing #3 / weak #3).

The StreamDiffusion-style realtime program keeps S frames in flight at
different sigmas; here we prove (a) the stage batch dp-shards over a mesh with
identical outputs, (b) TP params compose on top, and (c) the lag-1
broadcast-KV correspondence (RenderConfig.stream_kv_layers) carries the
previous frame's self-attn context into the current frame's denoise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
from stable_renderer_tpu.parallel import create_mesh
from stable_renderer_tpu.workflow.config import RenderConfig

# heavy model forwards / long compiles — smoke tier skips these
pytestmark = pytest.mark.slow


def _pipe(**cfg_kwargs):
    cfg = RenderConfig(prompt="x", steps=4, cfg_scale=2.0, sampler="lcm",
                       scheduler="sgm_uniform", stream_pipeline=True,
                       **cfg_kwargs)
    return DiffusionPipeline.from_random(cfg, tiny=True)


def _frame(key, size=32):
    return jax.random.uniform(key, (1, size, size, 3))


def _run_stream(pipe, n_frames=3, size=32):
    """Drive the stream program n_frames times, carrying state + kv."""
    sigmas = pipe.scheduler_sigmas()
    ctx = jnp.zeros((1, 7, pipe.unet.config.context_dim))
    nctx = jnp.zeros((1, 7, pipe.unet.config.context_dim))
    unet_params, _ = pipe.stream_params()
    state, kv = None, None
    outs = []
    for i in range(n_frames):
        img, state, kv = pipe._jit_render_stream(
            unet_params, pipe.vae_params,
            _frame(jax.random.PRNGKey(100 + i), size),
            None, None, state, sigmas, jax.random.PRNGKey(i),
            ctx, nctx, stream_init=(i == 0), kv_state=kv,
            stream_version=pipe.stream_version,
        )
        outs.append(np.asarray(img))
    return outs, state, kv


def test_stream_dp_mesh_matches_single_device():
    """Same frames through the dp-sharded stream program == single-device."""
    pipe_a = _pipe()
    ref_outs, ref_state, _ = _run_stream(pipe_a)

    pipe_b = _pipe()
    pipe_b.unet_params = pipe_a.unet_params
    pipe_b.vae_params = pipe_a.vae_params
    mesh = create_mesh({"dp": 4, "tp": 2})
    pipe_b.enable_stream_mesh(mesh)
    outs, state, _ = _run_stream(pipe_b)

    assert len(state.sharding.device_set) >= 4  # stage batch is distributed
    for r, o in zip(ref_outs, outs):
        np.testing.assert_allclose(o, r, atol=3e-4)


def test_stream_kv_lag_correspondence():
    """stream_kv_layers: captured contexts flow frame->frame and the
    injection actually changes the denoise (frames 2+ attend to frame t-1's
    K/V at the gated layers)."""
    pipe_plain = _pipe()
    pipe_kv = _pipe(stream_kv_layers=(0, 1))
    pipe_kv.unet_params = pipe_plain.unet_params
    pipe_kv.vae_params = pipe_plain.vae_params

    outs_plain, _, kv_none = _run_stream(pipe_plain)
    outs_kv, _, kv = _run_stream(pipe_kv)

    assert kv_none is None
    assert kv is not None and set(kv) == {"0", "1"}
    # per-layer context: (2S batch rows from the cfg concat, L, C), finite
    for arr in kv.values():
        assert np.isfinite(np.asarray(arr)).all()

    # frame 0 has no previous frame: injection is identity -> identical output
    np.testing.assert_allclose(outs_kv[0], outs_plain[0], atol=1e-5)
    # later frames attend to lag-1 context -> outputs differ
    assert np.max(np.abs(outs_kv[2] - outs_plain[2])) > 1e-4


def test_enable_stream_mesh_after_first_render_retraces():
    """VERDICT r4 weak #2: enable_stream_mesh mutates identity-hashed static
    ``self``; without the stream_version jit key the dp-only case would
    silently reuse the compiled UNSHARDED program. Render once WITHOUT the
    mesh, enable it, render again — the state must actually be sharded."""
    pipe = _pipe()
    # first render compiles the unsharded stream program
    _, state_unsharded, _ = _run_stream(pipe, n_frames=1)
    assert len(state_unsharded.sharding.device_set) == 1

    mesh = create_mesh({"dp": 4, "tp": 1}, devices=jax.devices()[:4])
    pipe.enable_stream_mesh(mesh)
    assert pipe.stream_version == 1
    _, state_sharded, _ = _run_stream(pipe, n_frames=1)
    # the with_sharding_constraint inside the retraced program must hold
    assert len(state_sharded.sharding.device_set) >= 4


def test_stream_kv_plus_mesh_compose():
    """KV-lag correspondence runs unchanged on the dp-sharded stream."""
    pipe_a = _pipe(stream_kv_layers=(0,))
    ref_outs, _, _ = _run_stream(pipe_a)

    pipe_b = _pipe(stream_kv_layers=(0,))
    pipe_b.unet_params = pipe_a.unet_params
    pipe_b.vae_params = pipe_a.vae_params
    pipe_b.enable_stream_mesh(create_mesh({"dp": 4, "tp": 2}))
    outs, _, kv = _run_stream(pipe_b)
    assert kv is not None
    for r, o in zip(ref_outs, outs):
        np.testing.assert_allclose(o, r, atol=3e-4)


def _run_stream_rich(pipe, n_frames=3, size=32, hints_per_frame=None,
                     ids=None, corresponder=None, seed0=100):
    """Drive the stream with ControlNet hints / id maps riding the state."""
    sigmas = pipe.scheduler_sigmas()
    ctx = jnp.zeros((1, 7, pipe.unet.config.context_dim))
    nctx = jnp.zeros((1, 7, pipe.unet.config.context_dim))
    unet_params, cn_params = pipe.stream_params()
    state, kv = None, None
    outs = []
    for i in range(n_frames):
        img, state, kv = pipe._jit_render_stream(
            unet_params, pipe.vae_params,
            _frame(jax.random.PRNGKey(seed0 + i), size),
            None, ids, state, sigmas, jax.random.PRNGKey(i),
            ctx, nctx, stream_init=(i == 0), kv_state=kv,
            stream_version=pipe.stream_version,
            cn_params=cn_params,
            hints=None if hints_per_frame is None else hints_per_frame(i),
            corresponder=corresponder,
        )
        outs.append(np.asarray(img))
    return outs, state


def test_stream_controlnet_zero_strength_matches_plain():
    """A strength-0 ControlNet riding the stream must be numerically
    invisible — exactness check of the hint-state plumbing/alignment."""
    from stable_renderer_tpu.workflow.config import ControlNetSpec

    pipe_a = _pipe()
    ref_outs, _, _ = _run_stream(pipe_a, n_frames=3)

    pipe_b = _pipe()
    pipe_b.unet_params = pipe_a.unet_params
    pipe_b.vae_params = pipe_a.vae_params
    pipe_b.add_random_controlnet(ControlNetSpec(source="normal", strength=0.0))
    _unzero_cn(pipe_b)  # nonzero residual towers; only strength gates them
    hint = lambda i: (jax.random.uniform(  # noqa: E731
        jax.random.PRNGKey(500 + i), (1, 32, 32, 3)),)
    outs, state = _run_stream_rich(pipe_b, n_frames=3, hints_per_frame=hint)
    # the hint stack depth equals the pipeline depth S = steps
    assert isinstance(state, dict)
    assert state["hints"][0].shape[0] == pipe_b.config.steps
    for r, o in zip(ref_outs, outs):
        np.testing.assert_allclose(r, o, atol=2e-5)


def _unzero_cn(pipe, seed=11):
    """ControlNet.init is checkpoint-faithful: zero_convs/middle_block_out
    AND the hint tower's final conv start at ZERO (a fresh cldm emits no
    residuals and ignores its hint by design), so a random ControlNet is
    numerically invisible / hint-blind. Give those convs random weights so
    hint effects are observable in tests."""
    cn, params, spec = pipe.controlnets[-1]
    key = jax.random.PRNGKey(seed)
    convs = [d["0"] for d in params["zero_convs"].values()]
    convs.append(params["middle_block_out"]["0"])
    convs.append(params["input_hint_block"]["14"])  # cldm zero_module tail
    for d in convs:
        w = d["weight"]
        key, k = jax.random.split(key)
        d["weight"] = jax.random.normal(k, w.shape, w.dtype) * 0.2
    pipe._bump_models()


def test_stream_controlnet_hints_apply():
    """Nonzero-strength hints change the output, and DIFFERENT per-frame
    hints give different results than a constant hint (per-frame alignment)."""
    from stable_renderer_tpu.workflow.config import ControlNetSpec

    pipe = _pipe()
    pipe.add_random_controlnet(ControlNetSpec(source="normal", strength=1.0))
    _unzero_cn(pipe)
    varying = lambda i: (jax.random.uniform(  # noqa: E731
        jax.random.PRNGKey(500 + i), (1, 32, 32, 3)),)
    constant = lambda i: (jax.random.uniform(  # noqa: E731
        jax.random.PRNGKey(500), (1, 32, 32, 3)),)
    outs_v, state_v = _run_stream_rich(pipe, n_frames=3,
                                       hints_per_frame=varying)
    outs_c, state_c = _run_stream_rich(pipe, n_frames=3,
                                       hints_per_frame=constant)
    # the first S outputs are warmup re-renders of frame 0, whose hint is
    # identical in both runs -> all three decoded outputs must MATCH...
    np.testing.assert_allclose(outs_v[0], outs_c[0], atol=2e-5)
    np.testing.assert_allclose(outs_v[2], outs_c[2], atol=2e-5)
    # ...but the in-flight stages of frames 1 and 2 were denoised under
    # DIFFERENT hints, so the carried latent state must diverge (rows 1-2;
    # row 0 is the raw encode of frame 2, hint-independent by construction)
    dv = np.abs(np.asarray(state_v["x"][1:3] - state_c["x"][1:3]))
    assert float(dv.max()) > 1e-6  # deterministic runs differ only via hints


def test_stream_vertex_averaging():
    """A corresponder with step_finished_inject_ratio > 0 vertex-averages
    across the in-flight frames (x0 space): outputs must differ from the
    plain stream, and the id stack must ride the state."""
    from stable_renderer_tpu.ops.correspondence import OverlapCorresponder

    pipe = _pipe()
    ref_outs, _, _ = _run_stream(pipe, n_frames=3)

    ids = jnp.zeros((1, 32, 32, 4), jnp.int32)
    # two vertex regions covering the frame (sprite=1, material=1, map=0)
    vid = (jnp.arange(32 * 32).reshape(32, 32) % 7).astype(jnp.int32)
    ids = ids.at[0, ..., 0].set(1).at[0, ..., 1].set(1).at[0, ..., 3].set(vid)
    corr = OverlapCorresponder(step_finished_inject_ratio=0.5,
                               step_finished_stop_inject_timestep=0.0,
                               vertex_segments=16, update_corrmap=False)
    outs, state = _run_stream_rich(pipe, n_frames=3, ids=ids,
                                   corresponder=corr)
    assert isinstance(state, dict)
    assert state["ids"].shape[0] == pipe.config.steps
    assert np.max(np.abs(outs[2] - ref_outs[2])) > 1e-4


def test_stale_kv_state_raises_clear_error():
    """VERDICT r4 weak #7: a kv_state carried across a stream_kv_layers
    config change must fail with a CLEAR message, not a pytree mismatch."""
    pipe_a = _pipe(stream_kv_layers=(0,))
    _, _, kv = _run_stream(pipe_a, n_frames=1)
    pipe_b = _pipe(stream_kv_layers=(0, 1))
    pipe_b.unet_params = pipe_a.unet_params
    pipe_b.vae_params = pipe_a.vae_params
    sigmas = pipe_b.scheduler_sigmas()
    ctx = jnp.zeros((1, 7, pipe_b.unet.config.context_dim))
    up, _ = pipe_b.stream_params()
    with pytest.raises(ValueError, match="stale stream kv_state"):
        pipe_b._jit_render_stream(
            up, pipe_b.vae_params, _frame(jax.random.PRNGKey(0)),
            None, None, None, sigmas, jax.random.PRNGKey(0), ctx, ctx,
            stream_init=True, kv_state=kv,
            stream_version=pipe_b.stream_version)
