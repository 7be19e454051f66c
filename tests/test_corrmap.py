"""CorrespondMap tests: update-mode semantics + dump/Load round trip in the
reference's interchange format (reference: engine/static/corrmap.py:344-357,578-872).
"""

import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.data.corrmap import CorrespondMap, corrmap_update


def _frame(h=4, w=4, c=4, fill=0.5):
    return jnp.full((h, w, c), fill, jnp.float32)


def _ids(h=4, w=4):
    """Two pixels mapping to the same cell (map 1, vertex 3), one to another."""
    ids = np.zeros((h, w, 4), np.int32)
    ids[0, 0] = [1, 1, 1, 3]
    ids[0, 1] = [1, 1, 1, 3]   # duplicate cell
    ids[2, 2] = [1, 1, 0, 5]
    return jnp.asarray(ids)


def test_update_first_avg_duplicates_average():
    m = CorrespondMap(k=3, height=4, width=4)
    color = np.full((4, 4, 4), 0.5, np.float32)
    color[0, 0] = 0.0
    color[0, 1] = 1.0
    m.update(jnp.asarray(color), _ids(), mode="first_avg")
    cell = np.asarray(m.values[1, 3])
    np.testing.assert_allclose(cell, 0.5)  # mean of 0 and 1
    assert bool(m.written[1, 3])
    assert bool(m.written[0, 5])
    # reference parity: all-zero id pixels DO scatter into cell (0, 0) when no mask
    # is given (corrmap.py:578-736 has no background filter; callers pass masks)
    assert bool(m.written[0, 0])


def test_update_background_excluded_via_idmap_masks():
    from stable_renderer_tpu.data.idmap import id_masks

    m = CorrespondMap(k=3, height=4, width=4)
    ids = _ids()
    # DefaultCorresponder.finished passes masks=id_maps.masks with inverse_masks=True
    # (corresponder.py:130-155): update only non-background pixels.
    m.update(_frame(fill=0.6), ids, masks=id_masks(ids[None])[0], inverse_masks=True, mode="first")
    assert bool(m.written[1, 3])
    assert not bool(m.written[0, 0])


def test_update_first_mode_first_pixel_wins_and_sticks():
    m = CorrespondMap(k=3, height=4, width=4)
    color = np.zeros((4, 4, 4), np.float32)
    color[0, 0] = 0.25
    color[0, 1] = 0.75
    m.update(jnp.asarray(color), _ids(), mode="first")
    np.testing.assert_allclose(np.asarray(m.values[1, 3]), 0.25)
    # second update must not overwrite written cells
    m.update(_frame(fill=0.9), _ids(), mode="first")
    np.testing.assert_allclose(np.asarray(m.values[1, 3]), 0.25)


def test_update_replace_overwrites():
    m = CorrespondMap(k=3, height=4, width=4)
    m.update(_frame(fill=0.2), _ids(), mode="first")
    m.update(_frame(fill=0.8), _ids(), mode="replace")
    np.testing.assert_allclose(np.asarray(m.values[1, 3]), 0.8)


def test_update_sprite_material_filter():
    m = CorrespondMap(k=3, height=4, width=4)
    m.update(_frame(fill=0.7), _ids(), spriteID=2, mode="first")  # no pixel has sprite 2
    assert not bool(jnp.any(m.written))
    m.update(_frame(fill=0.7), _ids(), spriteID=1, materialID=1, mode="first")
    assert bool(m.written[1, 3])


def test_update_mask_and_inverse():
    m = CorrespondMap(k=3, height=4, width=4)
    mask = np.ones((4, 4), np.float32)  # with inverse: keeps nothing
    m.update(_frame(), _ids(), masks=jnp.asarray(mask), inverse_masks=True, mode="first")
    assert not bool(jnp.any(m.written))
    m.update(_frame(fill=0.3), _ids(), masks=jnp.asarray(mask), mode="first")
    assert bool(m.written[1, 3])


def test_update_rgb_frame_gains_alpha():
    m = CorrespondMap(k=3, height=4, width=4, channel_count=4)
    m.update(_frame(c=3, fill=0.4), _ids(), mode="first")
    cell = np.asarray(m.values[1, 3])
    np.testing.assert_allclose(cell, [0.4, 0.4, 0.4, 1.0])


def test_dump_load_roundtrip(tmp_path):
    m = CorrespondMap(name="t", k=2, height=8, width=8)
    color = jnp.asarray(np.random.default_rng(0).random((8, 8, 4)), jnp.float32)
    ids = np.zeros((8, 8, 4), np.int32)
    ids[:4, :4, 2] = 1
    ids[:4, :4, 3] = np.arange(16).reshape(4, 4)
    ids[:4, :4, 0] = 1
    m.update(color, jnp.asarray(ids), mode="first")
    out = m.dump(tmp_path)
    m2 = CorrespondMap.Load(out)
    assert m2.k == 2 and m2.height == 8
    # PNG quantizes to 8 bits
    np.testing.assert_allclose(np.asarray(m2.values), np.asarray(m.values), atol=1 / 254)
    np.testing.assert_array_equal(np.asarray(m2.written), np.asarray(m.written))


def test_dump_load_zip_roundtrip(tmp_path):
    m = CorrespondMap(name="z", k=2, height=4, width=4)
    m.update(_frame(), _ids(), mode="first", ignore_obj_mat_id=True)
    out = m.dump(tmp_path, zip=True)
    assert out.endswith(".zip")
    m2 = CorrespondMap.Load(out)
    np.testing.assert_array_equal(np.asarray(m2.written), np.asarray(m.written))


def test_corrmap_update_jit_cache():
    vals = jnp.zeros((9, 16, 4))
    writ = jnp.zeros((9, 16), bool)
    color = _frame()
    ids = _ids()
    v1, w1 = corrmap_update(vals, writ, color, ids, mode="first_avg", num_bins=9)
    v2, w2 = corrmap_update(v1, w1, color, ids, mode="first_avg", num_bins=9)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
