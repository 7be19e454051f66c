"""Golden-fixture tests against the reference's shipped map dumps
(/root/reference/resources/example-map-outputs — the same fixtures the
reference's own __main__ smoke tests use, corrmap.py:893-936, SURVEY.md §4).

These pin the loader/EngineData/noise contracts to REAL reference output files:
if our sequence ordering, normalization, pooling, or packing semantics drift
from what the reference dumps, these fail.
"""

import os

import numpy as np
import pytest

FIXTURES = "/root/reference/resources/example-map-outputs/miku-sphere"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted"
)


def test_image_sequence_loader_order_and_range():
    """ImageSequenceLoader semantics (loaders.py:19-60): frames sorted by the
    NUMERIC index in the filename (color_2 before color_10), RGB in [0,1]."""
    from PIL import Image

    from stable_renderer_tpu.data.loaders import load_image_sequence

    seq = load_image_sequence(os.path.join(FIXTURES, "color"))
    assert seq.shape == (18, 512, 512, 3)
    assert seq.dtype == np.float32
    assert 0.0 <= seq.min() and seq.max() <= 1.0
    # numeric ordering: frame 2 must be color_2.png, not color_10.png
    direct = np.asarray(
        Image.open(os.path.join(FIXTURES, "color", "color_2.png")).convert("RGB"),
        np.float32,
    ) / 255.0
    np.testing.assert_array_equal(seq[2], direct)
    # and a slice honors frame_start/num_frames
    part = load_image_sequence(os.path.join(FIXTURES, "color"), frame_start=3, num_frames=2)
    np.testing.assert_array_equal(part[0], seq[3])
    assert part.shape[0] == 2


def test_noise_sequence_loader_pool_and_adain():
    """NoiseSequenceLoader (loaders.py:62-150): the reference's dumped per-pixel
    gaussian noise pools 8x8 to latent size and AdaIN-renormalizes back to the
    full-res statistics — pooled output must match the source mean/std per
    channel (the contract that keeps engine noise a valid latent init)."""
    from stable_renderer_tpu.data.loaders import load_noise_sequence

    src = np.load(os.path.join(FIXTURES, "noise", "noise_0.npy")).astype(np.float32)
    pooled = load_noise_sequence(os.path.join(FIXTURES, "noise"), num_frames=1)
    assert pooled.shape == (1, 64, 64, 4)
    for c in range(4):
        assert abs(pooled[0, ..., c].mean() - src[..., c].mean()) < 0.02
        assert abs(pooled[0, ..., c].std() - src[..., c].std()) < 0.05
    assert np.isfinite(pooled).all()


def test_virtual_engine_data_from_reference_dumps():
    """VirtualEngineDataNode composition (data.py:71-105) straight from the
    reference's dumped miku maps: all channels line up frame-wise."""
    from stable_renderer_tpu.data.loaders import virtual_engine_data

    ed = virtual_engine_data(
        color_dir=os.path.join(FIXTURES, "color"),
        noise_dir=os.path.join(FIXTURES, "noise"),
        normal_dir=os.path.join(FIXTURES, "normal"),
        depth_dir=os.path.join(FIXTURES, "depth"),
        canny_dir=os.path.join(FIXTURES, "canny"),
        num_frames=2,
        prompt="hatsune miku",
    )
    assert ed.frame_count == 2
    assert ed.color_maps.shape == (2, 512, 512, 3)
    assert ed.noise_maps.shape == (2, 64, 64, 4)
    assert ed.normal_maps.shape == (2, 512, 512, 3)
    assert ed.env_prompts[0].prompt == "hatsune miku"
    # the normal map background is the GL clear (black); the character region
    # carries encoded view-space normals
    nm = np.asarray(ed.normal_maps[0])
    assert (nm.max(-1) > 0.1).mean() > 0.05


def test_corrmap_bake_from_reference_colors():
    """CorrespondMap.update against REAL reference color dumps (the reference's
    own corrmap update_test uses these fixtures, corrmap.py:893-936): bake two
    real frames through synthetic ids, then dump/Load round-trip."""
    import jax.numpy as jnp

    from stable_renderer_tpu.data.corrmap import CorrespondMap
    from stable_renderer_tpu.data.idmap import id_masks
    from stable_renderer_tpu.data.loaders import load_image_sequence

    colors = load_image_sequence(os.path.join(FIXTURES, "color"), num_frames=2)
    h = w = 512
    ids = np.zeros((2, h, w, 4), np.int32)
    # character bounding region gets vertex ids; elsewhere stays background
    ids[:, 128:384, 128:384, 3] = np.arange(256 * 256, dtype=np.int32).reshape(256, 256) + 1
    ids[:, 128:384, 128:384, 0] = 1
    ids[:, 128:384, 128:384, 1] = 1
    ids = jnp.asarray(ids)
    cmap = CorrespondMap(name="miku", k=2, height=h, width=w)
    cmap.update(
        color_frames=jnp.asarray(colors),
        id_maps=ids,
        mode="first",
        masks=id_masks(ids),
        spriteID=1,
        materialID=1,
        inverse_masks=True,
    )
    written = int(np.asarray(cmap.written).sum())
    assert written >= 256 * 256  # every in-region vertex wrote at least once
    # written cells carry the real frame colors (not zeros)
    vals = np.asarray(cmap.values)
    wmask = np.asarray(cmap.written)
    assert vals[wmask][..., :3].mean() > 0.01
