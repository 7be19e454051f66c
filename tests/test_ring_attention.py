"""Ring cross-frame attention vs the dense reference on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stable_renderer_tpu.parallel import create_mesh
from stable_renderer_tpu.parallel.ring_attention import (
    cross_frame_attention,
    ring_cross_frame_attention,
)


def test_dense_cross_frame_attention_mixes_frames():
    n, l, c, heads = 4, 16, 32, 4
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (n, l, c))
    k = jax.random.normal(jax.random.fold_in(key, 1), (n, l, c))
    v = jax.random.normal(jax.random.fold_in(key, 2), (n, l, c))
    out = cross_frame_attention(q, k, v, heads)
    assert out.shape == (n, l, c)
    # changing frame 3's V must change frame 0's output (cross-frame flow)
    v2 = v.at[3].add(10.0)
    out2 = cross_frame_attention(q, k, v2, heads)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out2[0]))


def test_ring_matches_dense_on_mesh():
    mesh = create_mesh({"dp": 8})
    n, l, c, heads = 8, 16, 32, 4
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (n, l, c))
    k = jax.random.normal(jax.random.fold_in(key, 1), (n, l, c))
    v = jax.random.normal(jax.random.fold_in(key, 2), (n, l, c))
    dense = cross_frame_attention(q, k, v, heads)
    sharding = NamedSharding(mesh, P("dp"))
    qs, ks, vs = (jax.device_put(a, sharding) for a in (q, k, v))
    ring = jax.jit(
        lambda a, b_, c_: ring_cross_frame_attention(a, b_, c_, heads, mesh)
    )(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)
    assert ring.sharding.spec == P("dp")


def test_ring_multiframe_per_device():
    mesh = create_mesh({"dp": 4, "tp": 2})
    n, l, c, heads = 8, 8, 16, 2  # 2 frames per dp shard
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (n, l, c))
    k = jax.random.normal(jax.random.fold_in(key, 1), (n, l, c))
    v = jax.random.normal(jax.random.fold_in(key, 2), (n, l, c))
    dense = cross_frame_attention(q, k, v, heads)
    sharding = NamedSharding(mesh, P("dp"))
    ring = jax.jit(
        lambda a, b_, c_: ring_cross_frame_attention(a, b_, c_, heads, mesh)
    )(*(jax.device_put(a, sharding) for a in (q, k, v)))
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_overlap_all_frames_dense_vs_ring_in_denoise():
    """OverlapCorresponder(all_frames=True) as a PRODUCT feature: the full
    render program runs with cross-frame attention in the UNet self-attn, and
    the ring-routed dp-sharded run is exact vs the dense single-device run
    (VERDICT r1 next-step #10)."""
    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.ops.correspondence import OverlapCorresponder
    from stable_renderer_tpu.workflow.config import RenderConfig

    mesh = create_mesh({"dp": 8})
    pipe = DiffusionPipeline.from_random(
        RenderConfig(prompt="x", steps=2, cfg_scale=2.0, sampler="euler"), tiny=True
    )
    n, size = 8, 32
    k = jax.random.PRNGKey(0)
    ed = EngineData(
        frame_indices=jnp.arange(n),
        color_maps=jax.random.uniform(k, (n, size, size, 3)),
        noise_maps=jax.random.normal(jax.random.fold_in(k, 1), (n, 16, 16, 4)),
    )
    # layer_range=None: cross-frame attention at every self-attn layer
    dense = OverlapCorresponder(all_frames=True, layer_range=None, update_corrmap=False)
    ring = OverlapCorresponder(all_frames=True, layer_range=None, update_corrmap=False,
                               mesh=mesh)
    out_dense = pipe.render(ed, corresponder=dense, key=jax.random.PRNGKey(3))
    out_ring = pipe.render(ed, corresponder=ring, key=jax.random.PRNGKey(3), mesh=mesh)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_dense), atol=5e-4)
    # and cross-frame attention actually changed the result vs plain attention
    plain = OverlapCorresponder(pre_attn_inject_num_random_frames=-1, update_corrmap=False)
    out_plain = pipe.render(ed, corresponder=plain, key=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(out_dense), np.asarray(out_plain), atol=1e-4)


def test_overlap_layer_range_gating_and_random_pick():
    """layer_range gates the injection layers (corresponder.py:162-166); a None
    pre_attn_frames picks random frames per run from the traced key without
    recompiling (torch.randint-once semantics, corresponder.py:203-208)."""
    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.engine.pipeline import DiffusionPipeline
    from stable_renderer_tpu.ops.correspondence import OverlapCorresponder
    from stable_renderer_tpu.workflow.config import RenderConfig

    pipe = DiffusionPipeline.from_random(
        RenderConfig(prompt="x", steps=2, cfg_scale=1.0, sampler="euler"), tiny=True
    )
    n, size = 4, 32
    k = jax.random.PRNGKey(0)
    ed = EngineData(
        frame_indices=jnp.arange(n),
        color_maps=jax.random.uniform(k, (n, size, size, 3)),
        noise_maps=jax.random.normal(jax.random.fold_in(k, 1), (n, 16, 16, 4)),
    )
    gated = OverlapCorresponder(layer_range=(0,), update_corrmap=False)
    all_layers = OverlapCorresponder(layer_range=None, update_corrmap=False)
    out_gated = pipe.render(ed, corresponder=gated, key=jax.random.PRNGKey(3))
    out_all = pipe.render(ed, corresponder=all_layers, key=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(out_gated), np.asarray(out_all), atol=1e-5)

    rand = OverlapCorresponder(pre_attn_frames=None, layer_range=None,
                               update_corrmap=False)
    o1 = pipe.render(ed, corresponder=rand, key=jax.random.PRNGKey(10))
    o2 = pipe.render(ed, corresponder=rand, key=jax.random.PRNGKey(11))
    # different runs pick different frames -> different outputs, same program
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

# heavy model forwards / long compiles — the smoke tier (-m 'not slow') skips these
pytestmark = pytest.mark.slow
