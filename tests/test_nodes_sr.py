"""Tests for the stable_rendering custom node pack (workflow/nodes_sr.py)
— sequence loaders, VirtualEngineDataNode composition, processing utilities
(reference source/comfyUI/stable_rendering/_nodes/{loaders,data,processing})."""

import numpy as np
import pytest

import jax.numpy as jnp

from stable_renderer_tpu.workflow.executor import NODE_REGISTRY, InferenceContext


class _N:
    def __init__(self, type, widgets=None, id=1, inputs=None):
        self.type = type
        self.widgets = widgets or []
        self.id = id
        self.inputs = inputs or {}


def _ictx():
    return InferenceContext(model_dirs=(), jit_cache={})


def _run(name, widgets=None, **inputs):
    return NODE_REGISTRY[name](_ictx(), _N(name, widgets), **inputs)


SR_NODE_NAMES = [
    # class names exactly as the reference registers them
    # (stable_rendering/_nodes: auto-registration by class name)
    "ImageSequenceLoader", "NoiseSequenceLoader", "IDSequenceLoader",
    "CreateNoiseSequenceFromIdMap", "CreateIdenticalNoiseSequence",
    "VirtualEngineDataNode", "EngineDataNode", "InferenceOutputNode",
    "IsNotNoneNode", "IfNode", "IfValTypeEqual", "DefaultCorresponder",
    "OverlapCorresponder", "CorrespondSampler", "MaskedTextEncode",
    "SceneTextEncode", "EmptyCorrMaps",
    "RemoveBGNode", "RGBAToRGB", "RGBAThreshold",
    "TextConcat", "TextReplace", "SimpleVideoCombine",
]


def test_sr_node_names_all_registered():
    missing = [n for n in SR_NODE_NAMES if n not in NODE_REGISTRY]
    assert not missing, f"missing stable_rendering node names: {missing}"


# --- sequence loaders ---------------------------------------------------------


def _write_sequence(d, n=3, size=64):
    from PIL import Image

    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"frame_{i}.png")


def test_image_sequence_loader(tmp_path):
    _write_sequence(tmp_path / "seq", n=4)
    (imgs,) = _run("ImageSequenceLoader",
                   [str(tmp_path / "seq"), 1, 2, "SD15"])
    assert imgs.shape == (2, 512, 512, 3)  # resized to the SD15 canvas
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0


def test_noise_sequence_loader(tmp_path):
    d = tmp_path / "noise"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        np.save(d / f"noise_{i}.npy",
                rng.standard_normal((128, 128, 4)).astype(np.float32))
    (lat,) = _run("NoiseSequenceLoader", [str(d), 0, 3, "SD15"])
    # 128/64 = 2x block mean -> latent 64x64
    assert lat["noise"].shape == (3, 64, 64, 4)
    assert np.allclose(np.asarray(lat["samples"]), 0.0)
    # AdaIN renormalization keeps the noise roughly standard-normal
    assert abs(float(jnp.std(lat["noise"])) - 1.0) < 0.2


def test_id_sequence_loader(tmp_path):
    from stable_renderer_tpu.data.idmap import IDMap

    d = tmp_path / "ids"
    d.mkdir()
    for i in range(2):
        ids = np.zeros((16, 16, 4), np.int32)
        ids[4:12, 4:12] = [1, 1, 0, i + 1]
        np.save(d / f"id_{i}.npy", ids)
    (idmap,) = _run("IDSequenceLoader", [str(d), 0, 2])
    assert isinstance(idmap, IDMap)
    assert idmap.frame_count == 2


def test_create_noise_sequence_from_id_map():
    from stable_renderer_tpu.data.idmap import IDMap

    # two frames where vertex 7 appears at different screen positions —
    # multiples of 8 so the nearest 8x downsample samples exactly those cells
    ids = np.zeros((2, 512, 512, 4), np.int32)
    ids[0, 96, 200] = [1, 1, 0, 7]
    ids[1, 296, 400] = [1, 1, 0, 7]
    idmap = IDMap(jnp.asarray(ids))
    (lat,) = _run("CreateNoiseSequenceFromIdMap", [42, "SD15", "nearest"],
                  id_map=idmap)
    assert lat["noise"].shape == (2, 64, 64, 4)
    assert lat["samples"].shape == (2, 64, 64, 4)  # nearest fills samples too
    # vertex consistency at full-res scatters through the nearest downsample
    n = np.asarray(lat["noise"])
    assert np.allclose(n[0, 96 // 8, 200 // 8], n[1, 296 // 8, 400 // 8],
                       atol=1e-5)
    # different seeds give different noise
    (lat2,) = _run("CreateNoiseSequenceFromIdMap", [43, "SD15", "nearest"],
                   id_map=idmap)
    assert not np.allclose(np.asarray(lat2["noise"]), n)
    # mean mode returns zero samples
    (latm,) = _run("CreateNoiseSequenceFromIdMap", [42, "SD15", "mean"],
                   id_map=idmap)
    assert np.allclose(np.asarray(latm["samples"]), 0.0)


def test_create_noise_sequence_nonzero_frame_indices():
    """Filename-derived frame indices that don't start at 0 (frame_start>0
    dumps) must still scatter per-vertex noise into the right batch rows —
    info[:,6] carries the FILE index, not the row (loaders.py:199-206 would
    out-of-range here in the reference)."""
    from stable_renderer_tpu.data.idmap import IDMap

    ids = np.zeros((2, 512, 512, 4), np.int32)
    ids[0, 96, 200] = [1, 1, 0, 7]
    ids[1, 296, 400] = [1, 1, 0, 7]
    idmap = IDMap(jnp.asarray(ids), frame_indices=[8, 9])  # frame_start=8
    (lat,) = _run("CreateNoiseSequenceFromIdMap", [42, "SD15", "nearest"],
                  id_map=idmap)
    n = np.asarray(lat["noise"])
    assert n.shape == (2, 64, 64, 4)
    assert np.allclose(n[0, 96 // 8, 200 // 8], n[1, 296 // 8, 400 // 8],
                       atol=1e-5)
    # and the scattered cell differs from the plain tiled field around it
    assert not np.allclose(n[0, 96 // 8, 200 // 8], n[1, 96 // 8, 200 // 8],
                           atol=1e-5)


def test_create_identical_noise_sequence():
    (lat,) = _run("CreateIdenticalNoiseSequence", [7, 3, "SD15"])
    assert lat["samples"].shape == (3, 64, 64, 4)
    assert lat["noise"].shape == (3, 64, 64, 4)
    n = np.asarray(lat["noise"])
    assert np.allclose(n[0], n[1]) and np.allclose(n[1], n[2])
    assert not np.allclose(np.asarray(lat["samples"]), n)  # separate draws
    with pytest.raises(ValueError):
        _run("CreateIdenticalNoiseSequence", [7, 0, "SD15"])


# --- VirtualEngineDataNode ------------------------------------------------------


def test_virtual_engine_data_node_composes_and_installs():
    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.data.idmap import IDMap

    ids = np.zeros((2, 16, 16, 4), np.int32)
    ids[:, 4:12, 4:12] = [1, 1, 0, 3]
    idmap = IDMap(jnp.asarray(ids))
    color = jnp.ones((2, 16, 16, 3)) * 0.5
    noise = {"samples": jnp.zeros((2, 2, 2, 4)),
             "noise": jnp.ones((2, 2, 2, 4))}
    ictx = _ictx()
    (ed,) = NODE_REGISTRY["VirtualEngineDataNode"](
        ictx, _N("VirtualEngineDataNode"), color_maps=color, id_maps=idmap,
        noise_maps=noise)
    assert isinstance(ed, EngineData)
    assert ed.frame_count == 2
    assert ed.noise_maps.shape == (2, 2, 2, 4)
    assert ed.masks is not None  # derived from the id maps
    assert ictx.engine_data is ed  # installed as the context's hidden value
    # background cells are masked 1.0, AI cells 0.0
    m = np.asarray(ed.masks)
    assert m[0, 0, 0] == 1.0 and m[0, 8, 8] == 0.0


# --- processing -----------------------------------------------------------------


def test_rgba_to_rgb():
    img = jnp.zeros((1, 4, 4, 4)).at[..., 3].set(0.0)  # fully transparent
    (out,) = _run("RGBAToRGB", ["ff0000"], image=img)
    assert out.shape == (1, 4, 4, 3)
    assert np.allclose(np.asarray(out)[0, 0, 0], [1.0, 0.0, 0.0])
    opaque = jnp.ones((1, 4, 4, 4)) * 0.25
    opaque = opaque.at[..., 3].set(1.0)
    (out2,) = _run("RGBAToRGB", ["00ff00"], image=opaque)
    assert np.allclose(np.asarray(out2), 0.25)
    with pytest.raises(ValueError):
        _run("RGBAToRGB", ["zzz"], image=img)


def test_rgba_threshold():
    img = jnp.zeros((1, 2, 2, 4))
    img = img.at[0, 0, 0, 3].set(0.9).at[0, 1, 1, 3].set(0.1)
    (out,) = _run("RGBAThreshold", [0.5], image=img)
    a = np.asarray(out)[..., 3]
    assert a[0, 0, 0] == 1.0 and a[0, 1, 1] == 0.0


def test_remove_bg():
    # uniform gray background with a bright square in the middle
    img = jnp.full((1, 32, 32, 3), 0.2)
    img = img.at[0, 10:22, 10:22].set(1.0)
    (out,) = _run("RemoveBGNode", [], image=img)
    assert out.shape == (1, 32, 32, 4)
    a = np.asarray(out)[0, :, :, 3]
    assert a[16, 16] > 0.9     # foreground kept
    assert a[2, 2] < 0.1       # background removed


def test_text_nodes():
    (cat,) = _run("TextConcat", [], text_a="a photo of ", text_b="a cat")
    assert cat == "a photo of a cat"
    (rep,) = _run("TextReplace", [], text="a {X} scene", pattern="{X}",
                  replace="night")
    assert rep == "a night scene"
    # widget fallbacks
    (cat2,) = _run("TextConcat", ["hello ", "world"])
    assert cat2 == "hello world"


def test_simple_video_combine(tmp_path, monkeypatch):
    import stable_renderer_tpu.utils.paths as paths

    monkeypatch.setattr(paths, "OUTPUT_DIR", tmp_path)
    frames = jnp.stack([jnp.zeros((8, 8, 3)), jnp.ones((8, 8, 3))])
    (path,) = _run("SimpleVideoCombine",
                   [0.5, True, 8, 0, "clip", True], images=frames)
    assert path.endswith(".webp")
    from PIL import Image

    with Image.open(path) as im:
        assert getattr(im, "n_frames", 1) >= 2


# --- workflow-level integration --------------------------------------------------


def test_sr_loader_workflow_end_to_end(tmp_path):
    """UI-format workflow: IDSequenceLoader -> CreateNoiseSequenceFromIdMap
    -> VirtualEngineDataNode -> unpack, validated + executed."""
    from stable_renderer_tpu.workflow.executor import PromptExecutor
    from stable_renderer_tpu.workflow.loader import Workflow
    from stable_renderer_tpu.workflow.validation import validate_workflow

    d = tmp_path / "ids"
    d.mkdir()
    for i in range(2):
        ids = np.zeros((64, 64, 4), np.int32)
        ids[16:48, 16:48] = [1, 1, 0, 5]
        np.save(d / f"id_{i}.npy", ids)

    wf = {
        "nodes": [
            # directory is forceInput in the reference — feed it via a
            # string-producing node
            {"id": 9, "type": "TextConcat", "widgets_values": [str(d), ""]},
            {"id": 1, "type": "IDSequenceLoader",
             "widgets_values": [0, 2],
             "inputs": [{"name": "directory", "link": 4}]},
            {"id": 2, "type": "CreateNoiseSequenceFromIdMap",
             "widgets_values": [0, "SD15", "nearest"],
             "inputs": [{"name": "id_map", "link": 1}]},
            {"id": 3, "type": "VirtualEngineDataNode",
             "inputs": [{"name": "id_maps", "link": 2},
                        {"name": "noise_maps", "link": 3}]},
        ],
        "links": [
            # [link_id, src_id, src_slot, dst_id, dst_slot, type]
            [1, 1, 0, 2, 0, "IDMAP"],
            [2, 1, 0, 3, 1, "IDMAP"],
            [3, 2, 0, 3, 6, "LATENT"],
            [4, 9, 0, 1, 0, "STRING"],
        ],
    }
    workflow = Workflow.from_dict(wf)
    errors = validate_workflow(workflow, NODE_REGISTRY)
    assert errors == []
    ex = PromptExecutor(workflow)
    ctx = ex.execute()
    ed = ctx.engine_data
    assert ed is not None and ed.frame_count == 2
    assert ed.noise_maps.shape == (2, 64, 64, 4)


def test_simple_video_combine_gif(monkeypatch, tmp_path):
    """format widget 'gif' writes an animated GIF (the reference's UIImage
    path encodes animated output as GIF, processing/video.py docstring)."""
    import jax.numpy as jnp
    import stable_renderer_tpu.utils.paths as paths

    monkeypatch.setattr(paths, "OUTPUT_DIR", tmp_path)
    frames = jnp.stack([jnp.zeros((8, 8, 3)), jnp.ones((8, 8, 3))])
    (path,) = _run("SimpleVideoCombine",
                   [0.5, False, 8, 0, "clip", False, "gif"], images=frames)
    assert path.endswith(".gif")
    from PIL import Image

    im = Image.open(path)
    assert getattr(im, "n_frames", 1) == 2


# --- legacy loaders (reference _nodes/legacy/loaders.py) ----------------------


def test_legacy_image_sequence_loader(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    # shuffled write order; filenames carry the frame index
    for i in (2, 0, 1):
        arr = (rng.uniform(size=(16, 16, 4)) * 255).astype(np.uint8)
        arr[..., 3] = 255 - i  # distinct alpha per frame
        Image.fromarray(arr, "RGBA").save(tmp_path / f"color_{i}.png")
    paths = [str(tmp_path / f"color_{i}.png") for i in (1, 2, 0)]
    paths.append(str(tmp_path / "color_99.png"))  # missing -> skipped
    rgb, mask = _run("LegacyImageSequenceLoader", imgs=paths)
    assert rgb.shape == (3, 16, 16, 3) and mask.shape == (3, 16, 16)
    # mask = 1 - alpha, in frame-index order
    got = 1.0 - np.asarray(mask)[:, 0, 0]
    assert np.allclose(got, [255 / 255, 254 / 255, 253 / 255], atol=1e-3)


def test_legacy_noise_sequence_loader(tmp_path):
    rng = np.random.default_rng(4)
    full = rng.standard_normal((3, 8, 8, 4)).astype(np.float32)
    np.save(tmp_path / "noise_1.npy", full[1])
    np.save(tmp_path / "noise_0.npy", np.transpose(full[0], (2, 0, 1)))  # CHW
    np.save(tmp_path / "noise_2.npy", full[2])
    paths = [str(tmp_path / f"noise_{i}.npy") for i in (2, 1, 0)]
    (lat,) = _run("LegacyNoiseSequenceLoader", data_paths=paths)
    assert np.allclose(np.asarray(lat["noise"]), full, atol=1e-6)
    assert not np.asarray(lat["samples"]).any()
    assert lat["noise"].shape == lat["samples"].shape


def test_legacy_id_sequence_loader(tmp_path):
    ids = np.zeros((2, 8, 8, 4), np.int32)
    ids[0, 2, 3] = (1, 0, 4, 7)
    ids[1, 5, 5] = (2, 1, 0, 9)
    np.save(tmp_path / "id_5.npy", ids[1])
    np.save(tmp_path / "id_3.npy", ids[0])
    paths = [str(tmp_path / "id_5.npy"), str(tmp_path / "id_3.npy")]
    (idmap,) = _run("LegacyIDSequenceLoader", data_paths=paths)
    assert idmap.frame_indices == [3, 5]
    assert np.array_equal(np.asarray(idmap.tensor), ids)


def test_legacy_loader_widget_string(tmp_path):
    """Paths may also arrive as one newline-separated widget string."""
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 4), np.uint8), "RGBA").save(
        tmp_path / "f_0.png")
    rgb, mask = _run("LegacyImageSequenceLoader",
                     [str(tmp_path / "f_0.png")])
    assert rgb.shape == (1, 8, 8, 3)
