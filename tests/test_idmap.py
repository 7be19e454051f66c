"""IDMap contract tests (reference: engine/static/corrmap.py:49-280)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.data.idmap import (
    IDMap,
    flat_correspondence,
    id_masks,
    vertex_screen_info,
)
from stable_renderer_tpu.data.framebuffers import NON_AI_MAP_INDEX


def _toy_idmap():
    ids = np.zeros((1, 4, 4, 4), np.int32)
    ids[0, 0, 0] = [1, 1, 3, 7]                      # AI pixel
    ids[0, 1, 2] = [2, 1, NON_AI_MAP_INDEX, 5]       # non-AI object
    ids[0, 3, 3] = [1, 1, 0, 9]                      # AI pixel, map_index 0
    return ids


def test_id_masks():
    masks = np.asarray(id_masks(jnp.asarray(_toy_idmap())))
    assert masks.shape == (1, 4, 4)
    assert masks[0, 0, 0] == 0.0    # AI pixel -> not background
    assert masks[0, 1, 2] == 1.0    # map_index 2048 -> background
    assert masks[0, 0, 1] == 1.0    # all-zero -> background
    assert masks[0, 3, 3] == 0.0


def test_vertex_screen_info_filtering_and_ratios():
    ids = _toy_idmap()
    info, valid = vertex_screen_info(jnp.asarray(ids), jnp.asarray([42], jnp.int32))
    info, valid = np.asarray(info), np.asarray(valid)
    assert info.shape == (16, 7)
    assert valid.sum() == 2  # only the two AI pixels
    row = info[0]  # pixel (y=0, x=0)
    np.testing.assert_allclose(row[:4], [1, 1, 3, 7])
    np.testing.assert_allclose(row[4:], [0.0, 0.0, 42.0])
    row = info[3 * 4 + 3]  # pixel (y=3, x=3): x_ratio = 3/h, y_ratio = 3/w
    np.testing.assert_allclose(row[4:6], [3 / 4, 3 / 4])


def test_flat_correspondence():
    vids, valid = flat_correspondence(jnp.asarray(_toy_idmap()))
    vids, valid = np.asarray(vids), np.asarray(valid)
    assert vids[0] == 7 and valid[0]
    assert not valid[1 * 4 + 2]  # the 2048 pixel


def test_idmap_host_wrapper():
    m = IDMap(tensor=jnp.asarray(_toy_idmap()[0]))  # 3D promotes to 4D
    assert m.frame_count == 1
    assert m.height == 4 and m.width == 4
    assert np.asarray(m.masks).shape == (1, 4, 4)
    info, valid = m.create_vertex_screen_info()
    assert info.shape == (16, 7)


def test_idmap_from_directory(tmp_path):
    ids = _toy_idmap()
    np.save(tmp_path / "frame_2.npy", ids[0])
    np.save(tmp_path / "frame_10.npy", ids[0] * 2)
    m = IDMap.from_directory(tmp_path)
    assert m.frame_indices == [2, 10]
    assert m.tensor.shape == (2, 4, 4, 4)
    # CHW layout also accepted
    np.save(tmp_path / "chw_3.npy", np.moveaxis(ids[0], -1, 0))
    m2 = IDMap.from_directory(tmp_path, frame_start=0, num_frames=1)
    assert m2.frame_count == 1


def test_idmap_bad_shapes():
    with pytest.raises(ValueError):
        IDMap(tensor=jnp.zeros((4, 4, 3), jnp.int32))
    with pytest.raises(ValueError):
        IDMap(tensor=jnp.zeros((1, 4, 4, 4), jnp.int32), frame_indices=[1, 2])
