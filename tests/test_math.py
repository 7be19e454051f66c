"""Numeric parity tests for ops/math.py vs the reference torch semantics
(reference: source/common_utils/math_utils.py — AdaIN, group-by-then-average,
group-by-randn, group-by-first-occurrence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.ops.math import (
    adain,
    downsample_mean,
    group_average_by_id,
    group_first_by_id,
    group_randn_by_id,
    map_mean_std,
    resize_nearest,
)


def test_map_mean_std_matches_numpy(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    mean, std = map_mean_std(jnp.asarray(x))
    flat = x.reshape(2, 64, 4)
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, :], flat.mean(1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(std)[:, 0, 0, :], np.sqrt(flat.var(1, ddof=1) + 1e-5), rtol=1e-5
    )


def test_adain_transfers_statistics(rng):
    content = rng.standard_normal((1, 16, 16, 4)).astype(np.float32) * 3 + 7
    style = rng.standard_normal((1, 16, 16, 4)).astype(np.float32) * 0.5 - 2
    out = adain(jnp.asarray(content), jnp.asarray(style))
    out_mean, out_std = map_mean_std(out)
    s_mean, s_std = map_mean_std(jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(out_mean), np.asarray(s_mean), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_std), np.asarray(s_std), atol=1e-3)


def test_group_average_reference_example():
    # the documented example from math_utils.py:110-123
    t = np.array([[2, 1, 4], [2, 9, 12], [6, 4, 4], [7, 3, 99], [8, 1, 3]], np.float32)
    per_row, _ = group_average_by_id(
        jnp.asarray(t[:, 1:]), jnp.asarray(t[:, 0], dtype=jnp.int32), num_segments=16
    )
    expected = np.array([[5, 8], [5, 8], [4, 4], [3, 99], [1, 3]], np.float32)
    np.testing.assert_allclose(np.asarray(per_row), expected, rtol=1e-6)


def test_group_average_invalid_ids_passthrough():
    vals = jnp.asarray([[1.0], [2.0], [3.0]])
    ids = jnp.asarray([0, 99, -1], dtype=jnp.int32)  # 99/-1 out of range for 4 segments
    per_row, seg = group_average_by_id(vals, ids, num_segments=4)
    np.testing.assert_allclose(np.asarray(per_row).ravel(), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(seg)[0], [1.0])


def test_group_randn_same_id_same_noise():
    key = jax.random.PRNGKey(0)
    ids = jnp.asarray([2, 2, 6, 7, 8], dtype=jnp.int32)
    out = group_randn_by_id(key, ids, num_segments=16, channels=3)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], out[1])
    assert not np.allclose(out[0], out[2])
    # mean~0 std~1 across a big table
    big = group_randn_by_id(key, jnp.arange(4096, dtype=jnp.int32), 4096, 4)
    assert abs(float(jnp.mean(big))) < 0.05
    assert abs(float(jnp.std(big)) - 1.0) < 0.05


def test_group_first_by_id():
    # reference example semantics from tensor_group_by_then_set_first_occurance
    vals = jnp.asarray([[1.0], [9.0], [4.0], [3.0], [1.0]])
    ids = jnp.asarray([2, 2, 6, 7, 8], dtype=jnp.int32)
    order = jnp.asarray([0, 1, 0, 0, 1], dtype=jnp.int32)
    per_row, winners = group_first_by_id(vals, ids, order, num_segments=16)
    np.testing.assert_allclose(np.asarray(per_row).ravel(), [1, 1, 4, 3, 1])
    assert int(winners[2]) == 0  # row 0 won segment 2
    assert int(winners[0]) == -1  # empty segment


def test_downsample_mean_8x8():
    x = jnp.ones((1, 16, 16, 4)) * jnp.arange(16).reshape(1, 16, 1, 1)
    out = downsample_mean(x, 8)
    assert out.shape == (1, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], np.arange(8).mean())


def test_resize_nearest_roundtrip():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    up = resize_nearest(x, 8, 8)
    down = resize_nearest(up, 4, 4)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x))


@pytest.mark.parametrize("n_seg", [8, 300000])
def test_group_average_jits(n_seg):
    vals = jnp.ones((64, 4))
    ids = jnp.zeros((64,), jnp.int32)
    fn = jax.jit(lambda v, i: group_average_by_id(v, i, num_segments=n_seg))
    per_row, _ = fn(vals, ids)
    np.testing.assert_allclose(np.asarray(per_row), np.ones((64, 4)))
