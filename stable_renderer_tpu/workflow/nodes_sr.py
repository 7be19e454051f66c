"""Stable-rendering workflow nodes: sequence loaders + processing utilities.

Closes the registry gap against the reference's own custom node set
(reference: source/comfyUI/stable_rendering/_nodes/{loaders,data,processing}):

  * sequence loaders — ImageSequenceLoader, NoiseSequenceLoader,
    CreateNoiseSequenceFromIdMap, CreateIdenticalNoiseSequence,
    IDSequenceLoader (loaders.py:19-340).
  * VirtualEngineDataNode — compose an EngineData from explicit map inputs
    when running without the engine (data.py:71-105). Distinct from the
    unpack node registered as EngineData/EngineDataNode/VirtualEngineData.
  * processing — RemoveBGNode, RGBAToRGB, RGBAThreshold (processing/img.py),
    TextConcat, TextReplace (processing/text.py), SimpleVideoCombine
    (processing/video.py).

All tensors are NHWC jax arrays; LATENT values are {"samples", "noise"}
dicts — the KSampler consumes the "noise" slot for vertex-consistent noise
exactly like the reference's LATENT(noise=...) field.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from stable_renderer_tpu.utils.log import get_logger
from stable_renderer_tpu.workflow.executor import (
    InferenceContext,
    WorkflowNode,
    register_node,
    widget as _widget,
)

logger = get_logger("sr_tpu.nodes_sr")


_SD_SIZES = {"SD15": 512, "SDXL": 1024}


# ---------------------------------------------------------------------------
# sequence loaders (_nodes/loaders.py)


@register_node("ImageSequenceLoader")
def image_sequence_loader(ctx: InferenceContext, node: WorkflowNode,
                          directory=None):
    """Numbered image dir -> (N, size, size, 3) float32, resized to the SD
    version's canvas (loaders.py:19-77 ImageSequenceLoader)."""
    import jax.image
    import jax.numpy as jnp

    from stable_renderer_tpu.data.loaders import load_image_sequence

    # directory is forceInput in the reference; accept it as a widget too,
    # shifting the remaining widget offsets
    off = 0
    if directory is None:
        directory = str(_widget(node, 0, ""))
        off = 1
    frame_start = _widget(node, off + 0, 0, int)
    num_frames = _widget(node, off + 1, 16, int)
    sd_version = str(_widget(node, off + 2, "SD15"))
    if sd_version not in _SD_SIZES:
        raise ValueError("sd_version should be either SD15 or SDXL")
    size = _SD_SIZES[sd_version]
    frames = load_image_sequence(directory, frame_start, num_frames)
    x = jnp.asarray(frames)
    if x.shape[1:3] != (size, size):
        x = jax.image.resize(x, (x.shape[0], size, size, 3), method="nearest")
    return (x,)


@register_node("NoiseSequenceLoader")
def noise_sequence_loader(ctx: InferenceContext, node: WorkflowNode,
                          directory=None):
    """Dumped noise .npy dir -> LATENT with the reference's block-mean
    downsample to latent resolution + AdaIN renormalization against the
    full-res noise (loaders.py:79-152 NoiseSequenceLoader). samples is
    zeros — only the noise slot carries data, matching
    LATENT(samples=zeros_like(noise), noise=noise)."""
    import jax.numpy as jnp

    from stable_renderer_tpu.data.loaders import load_noise_sequence

    off = 0
    if directory is None:
        directory = str(_widget(node, 0, ""))
        off = 1
    frame_start = _widget(node, off + 0, 0, int)
    num_frames = _widget(node, off + 1, 16, int)
    sd_version = str(_widget(node, off + 2, "SD15"))
    if sd_version not in _SD_SIZES:
        raise ValueError("sd_version should be either SD15 or SDXL")
    probe = load_noise_sequence(directory, frame_start, 1, pool=1)
    height = probe.shape[1]
    block = _SD_SIZES[sd_version] // 8  # 64 for SD15, 128 for SDXL
    if height % block != 0:
        raise ValueError(
            f"noise height {height} not divisible by {block} for {sd_version}")
    noise = jnp.asarray(load_noise_sequence(
        directory, frame_start, num_frames, pool=height // block))
    return ({"samples": jnp.zeros_like(noise), "noise": noise},)


@register_node("IDSequenceLoader")
def id_sequence_loader(ctx: InferenceContext, node: WorkflowNode,
                       directory=None):
    """ID .npy dir -> IDMap (loaders.py:312-340 IDSequenceLoader)."""
    from stable_renderer_tpu.data.loaders import load_id_sequence

    off = 0
    if directory is None:
        directory = str(_widget(node, 0, ""))
        off = 1
    frame_start = _widget(node, off + 0, 0, int)
    num_frames = _widget(node, off + 1, 16, int)
    return (load_id_sequence(directory, frame_start, num_frames),)


def _legacy_paths(node, paths):
    """Explicit file-list input for the legacy loaders: a list/tuple of path
    strings (linked input) or a newline/comma-separated widget string. Sorted
    by the filename frame index with position fallback, then filtered to
    existing files — the reference's reorder-then-skip-missing behavior
    (stable_rendering/_nodes/legacy/loaders.py:34-48)."""
    from stable_renderer_tpu.utils.paths import extract_index

    if paths is None:
        raw = str(_widget(node, 0, ""))
        paths = [p.strip() for p in raw.replace(",", "\n").splitlines()
                 if p.strip()]
    paths = [str(p) for p in paths]
    order = {p: i for i, p in enumerate(paths)}
    paths.sort(key=lambda p: extract_index(Path(p).name, order[p]))
    return [p for p in paths if Path(p).exists()]


@register_node("LegacyImageSequenceLoader")
def legacy_image_sequence_loader(ctx: InferenceContext, node: WorkflowNode,
                                 imgs=None):
    """Explicit image-file list -> (IMAGE rgb, MASK = 1 - alpha)
    (legacy/loaders.py:13-57 LegacyImageSequenceLoader). NHWC float32."""
    import jax.numpy as jnp
    from PIL import Image

    files = _legacy_paths(node, imgs)
    if not files:
        raise ValueError("LegacyImageSequenceLoader: no existing image files")
    rgbs, masks = [], []
    for f in files:
        arr = np.asarray(Image.open(f).convert("RGBA"), np.float32) / 255.0
        rgbs.append(arr[..., :3])
        masks.append(1.0 - arr[..., 3])
    return jnp.asarray(np.stack(rgbs)), jnp.asarray(np.stack(masks))


def _legacy_load_map(path: str) -> np.ndarray:
    """One legacy npy/image map -> (H, W, 4) float32. CHW npy dumps are
    transposed to the framework's NHWC layout (the reference keeps CHW;
    legacy/loaders.py:87-98)."""
    from PIL import Image

    if path.endswith(".npy"):
        t = np.squeeze(np.load(path)).astype(np.float32)
        if t.ndim != 3:
            raise ValueError(f"Invalid shape of legacy map tensor: {t.shape}.")
        if t.shape[-1] != 4:
            if t.shape[0] == 4:
                t = np.transpose(t, (1, 2, 0))
            else:
                raise ValueError(f"Invalid legacy map tensor shape: {t.shape}.")
        return t
    return np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0


@register_node("LegacyNoiseSequenceLoader")
def legacy_noise_sequence_loader(ctx: InferenceContext, node: WorkflowNode,
                                 data_paths=None):
    """Explicit noise npy/image file list -> LATENT(samples=zeros, noise=t)
    (legacy/loaders.py:60-102 LegacyNoiseSequenceLoader). Full resolution —
    no block-mean downsample, unlike NoiseSequenceLoader."""
    import jax.numpy as jnp

    files = _legacy_paths(node, data_paths)
    if not files:
        raise ValueError("LegacyNoiseSequenceLoader: no existing noise files")
    maps = [_legacy_load_map(f) for f in files]
    for t in maps:
        if t.shape != maps[0].shape:
            raise ValueError(
                f"Tensor data has inconsistent shapes: {t.shape} and {maps[0].shape}.")
    noise = jnp.asarray(np.stack(maps))
    return ({"samples": jnp.zeros_like(noise), "noise": noise},)


@register_node("LegacyIDSequenceLoader")
def legacy_id_sequence_loader(ctx: InferenceContext, node: WorkflowNode,
                              data_paths=None):
    """Explicit id npy/image file list -> IDMap with filename-derived frame
    indices (legacy/loaders.py:105-147 LegacyIDSequenceLoader)."""
    from stable_renderer_tpu.data.idmap import IDMap
    from stable_renderer_tpu.utils.paths import extract_index

    files = _legacy_paths(node, data_paths)
    if not files:
        raise ValueError("LegacyIDSequenceLoader: no existing id files")
    frame_indices = [extract_index(Path(f).name, i)
                     for i, f in enumerate(files)]
    maps = [_legacy_load_map(f) for f in files]
    for t in maps:
        if t.shape != maps[0].shape:
            raise ValueError(
                f"Tensor data has inconsistent shapes: {t.shape} and {maps[0].shape}.")
    return (IDMap(tensor=np.stack(maps).astype(np.int32),
                  frame_indices=frame_indices),)


def _pool_latent(full, block: int, how: str):
    """(N, H, W, 4) -> (N, H/block, W/block, 4) by block reduce."""
    import jax.numpy as jnp

    from stable_renderer_tpu.ops.math import resize_nearest

    n, h, w, c = full.shape
    if how == "nearest":
        return resize_nearest(full, h // block, w // block)
    tiles = full.reshape(n, h // block, block, w // block, block, c)
    red = {"mean": jnp.mean, "max": jnp.max, "min": jnp.min}[how]
    return red(tiles, axis=(2, 4))


@register_node("CreateNoiseSequenceFromIdMap")
def create_noise_sequence_from_id_map(ctx: InferenceContext,
                                      node: WorkflowNode, id_map=None):
    """Vertex-consistent latent noise from an IDMap: one shared full-res
    noise field per sequence, with every screen pixel that maps to the same
    3D vertex re-seeded to the SAME normal draw across frames, then block
    downsampled to latent resolution (loaders.py:154-271
    CreateNoiseSequenceFromIdMap; the per-vertex re-init is the reference's
    tensor_group_by_then_randn_init).

    'nearest' returns both samples and noise filled (the reference's
    F.interpolate path); mean/max/min return samples=zeros + pooled noise."""
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.ops.math import group_randn_by_id

    seed = _widget(node, 0, 0, int)
    sd_version = str(_widget(node, 1, "SD15"))
    how = str(_widget(node, 2, "nearest"))
    if sd_version not in _SD_SIZES:
        raise ValueError("sd_version should be either SD15 or SDXL")
    if how not in ("mean", "max", "min", "nearest"):
        raise ValueError(
            "downsample_option should be either mean, max, min, or nearest")
    if id_map is None or id_map.frame_count == 0:
        raise ValueError("ID map is empty.")
    size = _SD_SIZES[sd_version]
    n = id_map.frame_count

    info, valid = id_map.create_vertex_screen_info()
    vertex_ids = info[:, 3].astype(jnp.int32)
    # num_segments from the concrete table (host loader node, not jitted)
    num_segments = int(jnp.max(jnp.where(valid, vertex_ids, 0))) + 1
    xs = jnp.clip((info[:, 4] * size).astype(jnp.int32), 0, size - 1)
    ys = jnp.clip((info[:, 5] * size).astype(jnp.int32), 0, size - 1)
    # info[:, 6] carries the FILENAME-derived frame index (corrmap.py:251-254
    # vertex_screen_info layout), which is a batch-row position only for
    # 0-based contiguous dumps — map it back to the row via the (sorted)
    # frame_indices table so frame_start>0 / sparse dumps scatter correctly
    # (the reference indexes latent[frame_index] directly and would
    # out-of-range on such dumps, loaders.py:199-206)
    fi_table = jnp.asarray(id_map.frame_indices, jnp.int32)
    fs = jnp.clip(jnp.searchsorted(fi_table, info[:, 6].astype(jnp.int32)),
                  0, n - 1)

    def vertex_noise(key):
        base = jax.random.normal(key, (1, size, size, 4), jnp.float32)
        field = jnp.tile(base, (n, 1, 1, 1))
        per_vertex = group_randn_by_id(
            jax.random.fold_in(key, 7), vertex_ids, num_segments, 4)
        current = field[fs, ys, xs]
        vals = jnp.where(valid[:, None], per_vertex, current)
        return field.at[fs, ys, xs].set(vals)

    key = jax.random.PRNGKey(seed)
    latent_full = vertex_noise(key)
    noise_full = vertex_noise(jax.random.fold_in(key, 1))
    block = 8  # full-res field is size x size; latent is size/8
    latent = _pool_latent(latent_full, block, how)
    noise = _pool_latent(noise_full, block, how)
    if how == "nearest":
        return ({"samples": latent, "noise": noise},)
    return ({"samples": jnp.zeros_like(noise), "noise": noise},)


@register_node("CreateIdenticalNoiseSequence")
def create_identical_noise_sequence(ctx: InferenceContext, node: WorkflowNode):
    """One latent-resolution noise draw tiled over num_frames
    (loaders.py:273-310 CreateIdenticalNoiseSequence)."""
    import jax
    import jax.numpy as jnp

    seed = _widget(node, 0, 0, int)
    num_frames = _widget(node, 1, 1, int)
    sd_version = str(_widget(node, 2, "SD15"))
    if sd_version not in _SD_SIZES:
        raise ValueError("sd_version should be either SD15 or SDXL")
    if num_frames <= 0:
        raise ValueError("num_frames should be larger than 0.")
    hw = _SD_SIZES[sd_version] // 8
    key = jax.random.PRNGKey(seed)
    latent = jax.random.normal(key, (1, hw, hw, 4), jnp.float32)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (1, hw, hw, 4),
                              jnp.float32)
    return ({"samples": jnp.tile(latent, (num_frames, 1, 1, 1)),
             "noise": jnp.tile(noise, (num_frames, 1, 1, 1))},)


# ---------------------------------------------------------------------------
# VirtualEngineDataNode (_nodes/data.py:71-105)


@register_node("VirtualEngineDataNode")
def virtual_engine_data_node(ctx: InferenceContext, node: WorkflowNode,
                             color_maps=None, id_maps=None, pos_maps=None,
                             normal_maps=None, depth_maps=None,
                             canny_maps=None, noise_maps=None, masks=None,
                             correspond_maps=None, sprites=None,
                             env_prompt=None):
    """Compose an EngineData from explicit inputs when running without the
    engine, and install it as the context's engine_data so downstream
    hidden-value consumers (CorrespondSampler) see it — the reference sets
    PromptExecutor.latest_context.engine_data (data.py:92-104)."""
    import jax.numpy as jnp

    from stable_renderer_tpu.data.engine_data import EngineData
    from stable_renderer_tpu.data.idmap import IDMap, id_masks

    id_tensor = None
    frame_indices = None
    if id_maps is not None:
        if isinstance(id_maps, IDMap):
            id_tensor = id_maps.tensor
            frame_indices = jnp.asarray(id_maps.frame_indices, jnp.int32)
        else:
            id_tensor = jnp.asarray(id_maps)
    noise = None
    if noise_maps is not None:
        noise = noise_maps["noise"] if isinstance(noise_maps, dict) \
            else jnp.asarray(noise_maps)
    n = None
    for cand in (color_maps, id_tensor, noise):
        if cand is not None:
            n = cand.shape[0]
            break
    if n is None:
        raise ValueError("VirtualEngineDataNode needs at least one map input")
    if frame_indices is None:
        frame_indices = jnp.arange(n, dtype=jnp.int32)
    if masks is None and id_tensor is not None:
        masks = id_masks(id_tensor)
    ed = EngineData(
        frame_indices=frame_indices,
        color_maps=None if color_maps is None else jnp.asarray(color_maps),
        id_maps=id_tensor,
        pos_maps=None if pos_maps is None else jnp.asarray(pos_maps),
        noise_maps=noise,
        normal_maps=None if normal_maps is None else jnp.asarray(normal_maps),
        depth_maps=None if depth_maps is None else jnp.asarray(depth_maps),
        canny_maps=None if canny_maps is None else jnp.asarray(canny_maps),
        masks=None if masks is None else jnp.asarray(masks),
        sprite_infos=sprites or {},
        env_prompts=tuple(env_prompt or ()),
        correspond_maps=correspond_maps or {},
    )
    ctx.engine_data = ed
    return (ed,)


# ---------------------------------------------------------------------------
# processing (_nodes/processing/{img,text,video}.py)


@register_node("RGBAToRGB")
def rgba_to_rgb(ctx: InferenceContext, node: WorkflowNode, image=None):
    """Alpha-composite an RGBA image over a hex background color
    (processing/img.py:101-130 RGBAToRGB)."""
    import jax.numpy as jnp

    color = str(_widget(node, 0, "ffffff")).lstrip("#")
    if len(color) != 6:
        raise ValueError("Color must be a hex string")
    try:
        bg = jnp.asarray([int(color[i:i + 2], 16) for i in (0, 2, 4)],
                         jnp.float32) / 255.0
    except ValueError:
        raise ValueError(f"Invalid color format {color}, "
                         "color must be a hex string")
    if image.shape[-1] != 4:
        raise ValueError("Input image must be in RGBA format")
    rgb, alpha = image[..., :3], image[..., 3:4]
    return ((1.0 - alpha) * bg + alpha * rgb,)


@register_node("RGBAThreshold")
def rgba_threshold(ctx: InferenceContext, node: WorkflowNode, image=None):
    """Binarize the alpha channel at a threshold
    (processing/img.py:132-160 RGBAThreshold)."""
    import jax.numpy as jnp

    threshold = _widget(node, 0, 0.5, float)
    if image.shape[-1] != 4:
        raise ValueError("Input image must be in RGBA format")
    alpha = (image[..., 3:4] > threshold).astype(image.dtype)
    return (jnp.concatenate([image[..., :3], alpha], axis=-1),)


@register_node("RemoveBGNode")
def remove_bg(ctx: InferenceContext, node: WorkflowNode, image=None):
    """Background removal (processing/img.py:80-98 RemoveBGNode). The
    reference wraps an ONNX matting net (abg-comfyui); no such weights ship
    offline, so this implements a border-statistics chroma matte: the
    background color is estimated from the frame borders, pixels within an
    adaptive color distance are faded out, and the matte is smoothed with a
    small box blur. Output is RGBA with background alpha -> 0 (same contract:
    batch in, batch out, foreground pixels untouched)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(image)[..., :3]
    border = jnp.concatenate([
        x[:, :2].reshape(x.shape[0], -1, 3),
        x[:, -2:].reshape(x.shape[0], -1, 3),
        x[:, :, :2].reshape(x.shape[0], -1, 3),
        x[:, :, -2:].reshape(x.shape[0], -1, 3),
    ], axis=1)
    bg = jnp.median(border, axis=1)[:, None, None, :]
    dist = jnp.linalg.norm(x - bg, axis=-1, keepdims=True)
    spread = jnp.std(border, axis=(1, 2))[:, None, None, None]
    lo = 2.0 * spread + 0.02
    hi = 4.0 * spread + 0.08
    alpha = jnp.clip((dist - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
    kernel = jnp.ones((1, 3, 3, 1), x.dtype) / 9.0
    alpha = jax.lax.conv_general_dilated(
        alpha, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "OHWI", "NHWC"))
    return (jnp.concatenate([x * alpha, alpha], axis=-1),)


@register_node("TextConcat")
def text_concat(ctx: InferenceContext, node: WorkflowNode,
                text_a=None, text_b=None):
    """(processing/text.py TextConcat)"""
    # widgets shift left when text_a arrives as a link instead of a widget
    off = 0
    if text_a is None:
        text_a = str(_widget(node, 0, ""))
        off = 1
    if text_b is None:
        text_b = str(_widget(node, off, ""))
    return (str(text_a) + str(text_b),)


@register_node("TextReplace")
def text_replace(ctx: InferenceContext, node: WorkflowNode, text=None,
                 pattern=None, replace=None):
    """(processing/text.py TextReplace)"""
    text = text if text is not None else str(_widget(node, 0, ""))
    pattern = pattern if pattern is not None else str(_widget(node, 1, ""))
    replace = replace if replace is not None else str(_widget(node, 2, ""))
    return (str(text).replace(str(pattern), str(replace)),)


@register_node("SimpleVideoCombine")
def simple_video_combine(ctx: InferenceContext, node: WorkflowNode,
                         images=None):
    """Combine frames into an animated gif/webp with optional alpha threshold
    and pingpong (processing/video.py:30-100 SimpleVideoCombine; the
    reference emits a UIImage the server encodes to GIF — headless here,
    written straight to the output dir; format widget picks gif or webp)."""
    from PIL import Image

    from stable_renderer_tpu.utils.paths import OUTPUT_DIR

    alpha_threshold = _widget(node, 0, 0.5, float)
    enable_alpha = bool(_widget(node, 1, True))
    frame_rate = max(1, _widget(node, 2, 8, int))
    loop_count = _widget(node, 3, 0, int)
    prefix = str(_widget(node, 4, "video"))
    pingpong = bool(_widget(node, 5, False))
    fmt = str(_widget(node, 6, "webp")).lower()
    if fmt not in ("webp", "gif"):
        fmt = "webp"

    arr = np.clip(np.asarray(images, np.float32), 0.0, 1.0)
    if enable_alpha:
        if arr.shape[-1] == 4:
            arr = np.concatenate(
                [arr[..., :3],
                 (arr[..., 3:] > alpha_threshold).astype(np.float32)], -1)
        else:
            arr = np.concatenate(
                [arr, np.ones_like(arr[..., :1])], -1)
    frames = [Image.fromarray((f * 255.0).astype(np.uint8))
              for f in arr]
    if pingpong and len(frames) > 2:
        frames = frames + frames[-2:0:-1]
    out_dir = Path(OUTPUT_DIR) / "workflow"
    out_dir.mkdir(parents=True, exist_ok=True)
    counter = len(list(out_dir.glob(f"{prefix}_*.{fmt}")))
    path = out_dir / f"{prefix}_{counter:05}.{fmt}"
    save_kwargs = {"lossless": True} if fmt == "webp" else {}
    if fmt == "gif" and frames[0].mode == "RGBA":
        # GIF has 1-bit alpha via palette transparency; PIL handles RGBA->P
        save_kwargs["disposal"] = 2
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=round(1000.0 / frame_rate), loop=loop_count,
                   **save_kwargs)
    ctx.status_messages.append(f"saved {path}")
    return (str(path),)
