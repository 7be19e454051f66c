"""Correspondence-algorithm tests vs reference semantics (corresponder.py,
loaders.py CreateNoiseSequenceFromIdMap)."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.data.engine_data import EngineData
from stable_renderer_tpu.data.corrmap import CorrespondMap
from stable_renderer_tpu.data.framebuffers import NON_AI_MAP_INDEX
from stable_renderer_tpu.ops.correspondence import (
    DefaultCorresponder,
    OverlapCorresponder,
    broadcast_kv_injection,
    latent_vertex_ids,
    vertex_average_injection,
    vertex_noise,
)


def _idmaps(b=2, h=16, w=16):
    """Two frames sharing vertex ids in a center square (same 3D points seen in
    both frames)."""
    ids = np.zeros((b, h, w, 4), np.int32)
    for f in range(b):
        for y in range(4, 12):
            for x in range(4, 12):
                ids[f, y, x] = [1, 1, 4, y * w + x]  # same vertex in both frames
    ids[0, 0, 0] = [2, 1, NON_AI_MAP_INDEX, 3]  # a non-AI pixel
    return jnp.asarray(ids)


def test_broadcast_kv_shapes_and_content():
    k = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    v = k + 100
    k2, v2 = broadcast_kv_injection(k, v, frame_indices=(1,))
    assert k2.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(k2[0]), np.asarray(k[1]))
    np.testing.assert_allclose(np.asarray(k2[1]), np.asarray(k[1]))
    # two frames concatenated
    k3, _ = broadcast_kv_injection(k, v, frame_indices=(0, 1))
    assert k3.shape == (2, 6, 4)


def test_latent_vertex_ids_downsample():
    ids = _idmaps(h=16, w=16)
    vids, valid = latent_vertex_ids(ids, 8, 8)
    assert vids.shape == (2, 8, 8)
    v, m = np.asarray(vids), np.asarray(valid)
    assert m[0, 3, 3] and not m[0, 0, 0]
    # both frames share vertex ids in the valid region
    assert (v[0][m[0] & m[1]] == v[1][m[0] & m[1]]).all()


def test_vertex_average_injection_pulls_frames_together():
    ids = _idmaps(h=16, w=16)
    key = jax.random.PRNGKey(0)
    latent = jax.random.normal(key, (2, 8, 8, 4))
    out = vertex_average_injection(latent, ids, ratio=1.0, num_segments=1024)
    assert out.shape == latent.shape
    # with ratio=1 the valid pixels of both frames move toward the shared mean:
    # cross-frame difference in the valid region must shrink
    _, valid = latent_vertex_ids(ids, 8, 8)
    m = np.asarray(valid[0] & valid[1])
    before = np.abs(np.asarray(latent[0] - latent[1]))[m].mean()
    after = np.abs(np.asarray(out[0] - out[1]))[m].mean()
    assert after < before
    # ratio=0 is AdaIN(latent, latent) = identity (up to numerics)
    out0 = vertex_average_injection(latent, ids, ratio=0.0, num_segments=1024)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(latent), atol=1e-4)


def test_vertex_noise_shared_across_frames():
    ids = _idmaps(h=16, w=16)
    noise = vertex_noise(jax.random.PRNGKey(0), ids, 8, 8, num_segments=1024)
    assert noise.shape == (2, 8, 8, 4)
    n = np.asarray(noise)
    _, valid = latent_vertex_ids(ids, 8, 8)
    m = np.asarray(valid[0] & valid[1])
    # same vertex -> identical noise across frames
    np.testing.assert_allclose(n[0][m], n[1][m])
    # background noise is independent
    bg = np.asarray(~valid[0] & ~valid[1])
    assert not np.allclose(n[0][bg], n[1][bg])
    # roughly standard normal
    assert abs(n.mean()) < 0.15 and abs(n.std() - 1.0) < 0.15


def test_default_corresponder_updates_corrmap():
    ids = _idmaps(h=16, w=16)
    cmap = CorrespondMap(k=3, height=16, width=16)
    ed = EngineData(
        frame_indices=jnp.asarray([0, 1]),
        id_maps=ids,
        correspond_maps={(1, 1): cmap},
    )
    images = jnp.full((2, 16, 16, 3), 0.6)
    DefaultCorresponder().finished(ed, images)
    assert bool(cmap.written[4, 5 * 16 + 5])
    np.testing.assert_allclose(np.asarray(cmap.values[4, 5 * 16 + 5, :3]), 0.6, atol=1e-6)
    # background cell untouched
    assert not bool(cmap.written[0, 0])


def test_overlap_corresponder_hooks_and_callback():
    ids = _idmaps(h=16, w=16)
    ed = EngineData(frame_indices=jnp.asarray([0, 1]), id_maps=ids)
    oc = OverlapCorresponder(vertex_segments=1024)
    hooks = oc.attn_hooks(ed)
    assert hooks.pre is not None and hooks.post is None
    q = k = v = jnp.ones((2, 5, 8))
    q2, k2, v2 = hooks.pre(q, k, v, 0)
    assert k2.shape == (2, 5, 8)
    from stable_renderer_tpu.models.sampling import ModelSampling

    ms = ModelSampling()
    cb = oc.step_callback(ed, ms=ms)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    # high sigma (early step, t >= 500) -> injection active
    hi = cb(x, x, jnp.asarray(10.0), 0)
    assert not np.allclose(np.asarray(hi), np.asarray(x))
    # low sigma (late, t < 500) -> passthrough
    lo = cb(x, x, jnp.asarray(0.05), 5)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(x))


def test_group_frame_distance_average_matches_pairwise_oracle():
    """group_frame_distance_average == the legacy FrameDistance pairwise
    formula (legacy_codes/.../algorithms.py:53-74): out_i =
    sum_j x_j/(|f_i-f_j|+1) / sum_j 1/(|f_i-f_j|+1) within a vertex group."""
    import numpy as np

    from stable_renderer_tpu.ops.math import group_frame_distance_average

    rng = np.random.default_rng(0)
    n, c, n_frames, n_seg = 64, 3, 4, 8
    x = rng.normal(size=(n, c)).astype(np.float32)
    ids = rng.integers(0, n_seg, size=n).astype(np.int32)
    frames = rng.integers(0, n_frames, size=n).astype(np.int32)

    got = np.asarray(group_frame_distance_average(
        jnp.asarray(x), jnp.asarray(ids), jnp.asarray(frames), n_seg, n_frames))

    want = x.copy()
    for i in range(n):
        members = np.where(ids == ids[i])[0]
        w = 1.0 / (np.abs(frames[i] - frames[members]) + 1.0)
        want[i] = (w[:, None] * x[members]).sum(0) / w.sum()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vertex_average_injection_weighting_schemes():
    """All four legacy weighting schemes run and differ from each other
    (algorithms.py AverageDistance/FrameDistance/PixelDistance/
    PerpendicularViewNormal equivalents)."""
    import numpy as np

    from stable_renderer_tpu.ops.correspondence import vertex_average_injection

    key = jax.random.PRNGKey(0)
    b, h, w = 3, 8, 8
    latent = jax.random.normal(key, (b, h, w, 4))
    ids = np.zeros((b, 16, 16, 4), np.int32)
    # one shared vertex pattern across frames, a few distinct vertices
    vid = (np.arange(16 * 16).reshape(16, 16) % 37) + 1
    for f in range(b):
        ids[f, ..., 3] = vid
        ids[f, ..., 0] = 1
        ids[f, ..., 2] = 3  # map_index != NON_AI
    normals = jax.random.uniform(jax.random.PRNGKey(2), (b, 16, 16, 3))
    outs = {}
    for scheme in ("average", "frame_distance", "pixel_distance", "view_normal"):
        outs[scheme] = np.asarray(vertex_average_injection(
            latent, jnp.asarray(ids), 0.5, num_segments=64,
            weighting=scheme, normal_maps=normals))
        assert np.isfinite(outs[scheme]).all(), scheme
    names = list(outs)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            assert not np.allclose(outs[names[i]], outs[names[j]]), (
                f"{names[i]} == {names[j]}")
    # view_normal without normals falls back to average
    fb = np.asarray(vertex_average_injection(
        latent, jnp.asarray(ids), 0.5, num_segments=64,
        weighting="view_normal", normal_maps=None))
    np.testing.assert_allclose(fb, outs["average"], atol=1e-6)


def test_overlap_corresponder_weighting_plumbs_through():
    from stable_renderer_tpu.ops.correspondence import OverlapCorresponder

    import numpy as np

    ids = np.zeros((2, 8, 8, 4), np.int32)
    ids[..., 3] = np.arange(64).reshape(8, 8) % 9 + 1
    ids[..., 2] = 1
    corr = OverlapCorresponder(weighting="frame_distance", vertex_segments=64,
                               update_corrmap=False)
    cb = corr.make_step_callback(jnp.asarray(ids), None)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    out = cb(x, x, jnp.asarray(1.0), 0)
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(x))
