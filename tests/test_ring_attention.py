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
