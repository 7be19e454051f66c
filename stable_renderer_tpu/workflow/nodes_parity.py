"""Remaining builtin + comfy_extras parity nodes.

Closes the node-registry gap against the reference's NODE_CLASS_MAPPINGS
(reference: source/comfyUI/nodes.py:1901-1968 builtins +
comfy_extras/nodes_{latent,images,mask,model_advanced,model_downscale,
clip_sdxl,cond,canny,post_processing,stable_cascade,stable3d}.py):

  * latent batch/transform zoo — SetLatentNoiseMask, LatentFromBatch,
    RepeatLatentBatch, LatentBlend, LatentRotate, LatentFlip, LatentCrop,
    LatentInterpolate, LatentBatch, LatentBatchSeedBehavior,
    LatentCompositeMasked, Save/LoadLatent.
  * image zoo — EmptyImage, ImageCrop, RepeatImageBatch, ImageFromBatch,
    ImageCompositeMasked, ImageColorToMask, CropMask, LoadImageMask,
    ImageScaleToTotalPixels, Canny, SaveAnimatedWEBP/PNG.
  * conditioning — ConditioningAverage, ConditioningSetAreaStrength,
    CLIPTextEncodeSDXL(+Refiner), CLIPTextEncodeControlnet.
  * loaders — VAELoader, CLIPLoader, DualCLIPLoader, LoraLoader,
    CheckpointLoader, unCLIPCheckpointLoader, DiffusersLoader,
    StyleModelLoader/Apply, DiffControlNetLoader, VAEDecode/EncodeTiled.
  * advanced model patches — ModelSamplingDiscrete/ContinuousEDM/
    StableCascade, RescaleCFG, PatchModelAddDownscale.
  * stragglers — StableCascade_StageC_VAEEncode,
    StableZero123_Conditioning_Batched.

All tensors are NHWC jax arrays (the reference is NCHW torch); LATENT values
are the same {"samples": ...} dicts the rest of the executor uses.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from stable_renderer_tpu.utils.log import get_logger
from stable_renderer_tpu.workflow.executor import (
    InferenceContext,
    WorkflowNode,
    _find_model_file,
    register_node,
    widget as _widget,
)
from stable_renderer_tpu.workflow.nodes_extra import _add_patch, _resize_image

logger = get_logger("sr_tpu.nodes_parity")


def _samples(latent):
    return latent["samples"] if isinstance(latent, dict) else latent


def _repeat_to_batch(x, n: int):
    """comfy.utils.repeat_to_batch_size: tile then slice to n rows."""
    import jax.numpy as jnp

    if x.shape[0] == n:
        return x
    reps = -(-n // x.shape[0])
    return jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:n]


# ---------------------------------------------------------------------------
# latent batch / transform zoo (nodes.py + comfy_extras/nodes_latent.py)


@register_node("SetLatentNoiseMask")
def set_latent_noise_mask(ctx: InferenceContext, node: WorkflowNode,
                          samples=None, mask=None):
    """Attach an inpaint noise mask to a latent (nodes.py:1380-1394
    SetLatentNoiseMask; consumed by the KSampler's inpaint wrap)."""
    import jax.numpy as jnp

    m = jnp.asarray(mask)
    if m.ndim == 2:
        m = m[None]
    return ({**samples, "noise_mask": m},)


@register_node("LatentFromBatch")
def latent_from_batch(ctx: InferenceContext, node: WorkflowNode, samples=None):
    """Slice [batch_index, batch_index+length) out of a latent batch,
    carrying noise_mask rows and per-sample noise batch indices
    (nodes.py:1109-1139 LatentFromBatch)."""
    s_in = _samples(samples)
    batch_index = min(s_in.shape[0] - 1, _widget(node, 0, 0, int))
    length = min(s_in.shape[0] - batch_index, _widget(node, 1, 1, int))
    out = dict(samples)
    out["samples"] = s_in[batch_index:batch_index + length]
    if "noise_mask" in samples:
        masks = samples["noise_mask"]
        if masks.shape[0] == 1:
            out["noise_mask"] = masks
        else:
            masks = _repeat_to_batch(masks, s_in.shape[0])
            out["noise_mask"] = masks[batch_index:batch_index + length]
    if "batch_index" not in samples:
        out["batch_index"] = list(range(batch_index, batch_index + length))
    else:
        out["batch_index"] = samples["batch_index"][
            batch_index:batch_index + length]
    return (out,)


@register_node("RepeatLatentBatch")
def repeat_latent_batch(ctx: InferenceContext, node: WorkflowNode, samples=None):
    """Tile a latent batch ``amount`` times (nodes.py:1141-1170)."""
    import jax.numpy as jnp

    amount = _widget(node, 0, 1, int)
    s_in = _samples(samples)
    out = dict(samples)
    out["samples"] = jnp.tile(s_in, (amount, 1, 1, 1))
    if "noise_mask" in samples and samples["noise_mask"].shape[0] > 1:
        masks = _repeat_to_batch(samples["noise_mask"], s_in.shape[0])
        out["noise_mask"] = jnp.tile(masks, (amount, 1, 1, 1))
    if "batch_index" in samples:
        idx = list(samples["batch_index"])
        offset = max(idx) - min(idx) + 1
        out["batch_index"] = [i + offset * rep for rep in range(amount)
                              for i in idx]
    return (out,)


@register_node("LatentBlend")
def latent_blend(ctx: InferenceContext, node: WorkflowNode,
                 samples1=None, samples2=None):
    """blend_factor * s1 + (1 - blend_factor) * s2, resizing s2 to s1's
    spatial dims when needed (nodes.py:1306-1345 LatentBlend)."""
    s1, s2 = _samples(samples1), _samples(samples2)
    factor = _widget(node, 0, 0.5, float)
    if s1.shape[1:3] != s2.shape[1:3]:
        s2 = _resize_image(s2, s1.shape[1], s1.shape[2], "bicubic")
    out = dict(samples1)
    out["samples"] = s1 * factor + s2 * (1.0 - factor)
    return (out,)


@register_node("LatentRotate")
def latent_rotate(ctx: InferenceContext, node: WorkflowNode, samples=None):
    """Rotate by 0/90/180/270 degrees (nodes.py:1220-1242; the reference
    rotates dims [3,2] = (W,H) in NCHW, i.e. clockwise — NHWC axes (2,1))."""
    import jax.numpy as jnp

    rotation = str(_widget(node, 0, "none"))
    k = {"9": 1, "1": 2, "2": 3}.get(rotation[:1], 0)
    out = dict(samples)
    out["samples"] = jnp.rot90(_samples(samples), k=k, axes=(2, 1))
    return (out,)


@register_node("LatentFlip")
def latent_flip(ctx: InferenceContext, node: WorkflowNode, samples=None):
    """Flip vertically (x-axis) or horizontally (y-axis)
    (nodes.py:1244-1262 LatentFlip; NCHW dim 2 = NHWC axis 1)."""
    import jax.numpy as jnp

    method = str(_widget(node, 0, "x-axis: vertically"))
    axis = 1 if method.startswith("x") else 2
    out = dict(samples)
    out["samples"] = jnp.flip(_samples(samples), axis=axis)
    return (out,)


@register_node("LatentCrop")
def latent_crop(ctx: InferenceContext, node: WorkflowNode, samples=None):
    """Crop a (width, height) window at pixel (x, y), /8 to latent units
    (nodes.py:1347-1378 LatentCrop)."""
    s = _samples(samples)
    width = _widget(node, 0, 512, int)
    height = _widget(node, 1, 512, int)
    x = min(_widget(node, 2, 0, int) // 8, s.shape[2] - 8)
    y = min(_widget(node, 3, 0, int) // 8, s.shape[1] - 8)
    out = dict(samples)
    out["samples"] = s[:, y:y + height // 8, x:x + width // 8]
    return (out,)


@register_node("LatentInterpolate")
def latent_interpolate(ctx: InferenceContext, node: WorkflowNode,
                       samples1=None, samples2=None):
    """Norm-preserving channel-vector slerp-style interpolation
    (comfy_extras/nodes_latent.py:69-100 LatentInterpolate; the reference's
    vector_norm(dim=1) is the NCHW channel axis = NHWC axis -1)."""
    import jax.numpy as jnp

    ratio = _widget(node, 0, 1.0, float)
    s1, s2 = _samples(samples1), _samples(samples2)
    if s1.shape[1:3] != s2.shape[1:3]:
        s2 = _resize_image(s2, s1.shape[1], s1.shape[2], "bilinear")
    s2 = _repeat_to_batch(s2, s1.shape[0])
    m1 = jnp.linalg.norm(s1, axis=-1, keepdims=True)
    m2 = jnp.linalg.norm(s2, axis=-1, keepdims=True)
    n1 = jnp.nan_to_num(s1 / m1)
    n2 = jnp.nan_to_num(s2 / m2)
    t = n1 * ratio + n2 * (1.0 - ratio)
    mt = jnp.linalg.norm(t, axis=-1, keepdims=True)
    st = jnp.nan_to_num(t / mt)
    out = dict(samples1)
    out["samples"] = st * (m1 * ratio + m2 * (1.0 - ratio))
    return (out,)


@register_node("LatentBatch")
def latent_batch(ctx: InferenceContext, node: WorkflowNode,
                 samples1=None, samples2=None):
    """Concatenate two latent batches, upscaling the second to match
    (comfy_extras/nodes_latent.py:102-123 LatentBatch)."""
    import jax.numpy as jnp

    s1, s2 = _samples(samples1), _samples(samples2)
    if s1.shape[1:3] != s2.shape[1:3]:
        s2 = _resize_image(s2, s1.shape[1], s1.shape[2], "bilinear")
    out = dict(samples1)
    out["samples"] = jnp.concatenate([s1, s2], axis=0)
    out["batch_index"] = (list(samples1.get("batch_index",
                                            range(s1.shape[0]))) +
                          list(samples2.get("batch_index",
                                            range(s2.shape[0]))))
    return (out,)


@register_node("LatentBatchSeedBehavior")
def latent_batch_seed_behavior(ctx: InferenceContext, node: WorkflowNode,
                               samples=None):
    """random: per-sample noise seeds; fixed: all rows share seed index
    (comfy_extras/nodes_latent.py:125-146)."""
    behavior = str(_widget(node, 0, "fixed"))
    out = dict(samples)
    if behavior == "random":
        out.pop("batch_index", None)
    else:
        first = list(samples.get("batch_index", [0]))[0]
        out["batch_index"] = [first] * _samples(samples).shape[0]
    return (out,)


def _composite_masked(destination, source, x, y, mask, multiplier,
                      resize_source):
    """comfy_extras/nodes_mask.py:8-40 composite(), NHWC. Bounds-clamped
    masked paste of source over destination at (x, y) pixel coords."""
    import jax.numpy as jnp

    if resize_source:
        source = _resize_image(source, destination.shape[1],
                               destination.shape[2], "bilinear")
    source = _repeat_to_batch(source, destination.shape[0])
    x = max(-source.shape[2] * multiplier,
            min(x, destination.shape[2] * multiplier))
    y = max(-source.shape[1] * multiplier,
            min(y, destination.shape[1] * multiplier))
    left, top = x // multiplier, y // multiplier
    if mask is None:
        mask = jnp.ones(source.shape[:3] + (1,), source.dtype)
    else:
        mask = jnp.asarray(mask)
        if mask.ndim == 2:
            mask = mask[None]
        mask = _resize_image(mask[..., None], source.shape[1],
                             source.shape[2], "bilinear")
        mask = _repeat_to_batch(mask, source.shape[0])
    visible_w = destination.shape[2] - left + min(0, x)
    visible_h = destination.shape[1] - top + min(0, y)
    vh = min(visible_h, source.shape[1])
    vw = min(visible_w, source.shape[2])
    if vh <= 0 or vw <= 0:
        return destination
    m = mask[:, :vh, :vw]
    src = source[:, :vh, :vw]
    t0, l0 = max(top, 0), max(left, 0)
    dst_win = destination[:, t0:t0 + vh, l0:l0 + vw]
    blended = m * src[:, :dst_win.shape[1], :dst_win.shape[2]] + \
        (1.0 - m[:, :dst_win.shape[1], :dst_win.shape[2]]) * dst_win
    return destination.at[:, t0:t0 + vh, l0:l0 + vw].set(blended)


@register_node("LatentCompositeMasked")
def latent_composite_masked(ctx: InferenceContext, node: WorkflowNode,
                            destination=None, source=None, mask=None):
    """(comfy_extras/nodes_mask.py:42-67 LatentCompositeMasked)"""
    x = _widget(node, 0, 0, int)
    y = _widget(node, 1, 0, int)
    resize = bool(_widget(node, 2, False))
    out = dict(destination)
    out["samples"] = _composite_masked(
        _samples(destination), _samples(source), x, y, mask, 8, resize)
    return (out,)


@register_node("ImageCompositeMasked")
def image_composite_masked(ctx: InferenceContext, node: WorkflowNode,
                           destination=None, source=None, mask=None):
    """(comfy_extras/nodes_mask.py:69-92 ImageCompositeMasked)"""
    x = _widget(node, 0, 0, int)
    y = _widget(node, 1, 0, int)
    resize = bool(_widget(node, 2, False))
    return (_composite_masked(destination, source, x, y, mask, 1, resize),)


@register_node("SaveLatent")
def save_latent(ctx: InferenceContext, node: WorkflowNode, samples=None):
    """Write the latent as a safetensors .latent file in the reference's
    sharing format: latent_tensor + latent_format_version_0 marker
    (nodes.py:444-493 SaveLatent)."""
    from safetensors.numpy import save_file

    from stable_renderer_tpu.utils.paths import OUTPUT_DIR

    prefix = str(_widget(node, 0, "latents/sr_tpu"))
    out_dir = (Path(OUTPUT_DIR) / prefix).parent
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = Path(prefix).name
    counter = len(list(out_dir.glob(f"{stem}_*.latent")))
    path = out_dir / f"{stem}_{counter:05}_.latent"
    save_file({
        "latent_tensor": np.asarray(_samples(samples), np.float32),
        "latent_format_version_0": np.zeros((0,), np.float32),
    }, str(path))
    ctx.status_messages.append(f"saved latent {path}")
    return (str(path),)


@register_node("LoadLatent")
def load_latent(ctx: InferenceContext, node: WorkflowNode):
    """Load a .latent safetensors file; legacy files without the version
    marker are un-scaled by 1/0.18215 (nodes.py:495-540 LoadLatent)."""
    import jax.numpy as jnp
    from safetensors.numpy import load_file

    name = str(_widget(node, 0, ""))
    path = _find_model_file(ctx, name)
    if path is None:
        raise FileNotFoundError(f"latent '{name}' not found")
    data = load_file(path)
    mult = 1.0 if "latent_format_version_0" in data else 1.0 / 0.18215
    arr = np.asarray(data["latent_tensor"], np.float32) * mult
    if arr.ndim == 4 and arr.shape[1] in (4, 16) and arr.shape[-1] not in (4, 16):
        arr = arr.transpose(0, 2, 3, 1)  # NCHW latent from a torch writer
    return ({"samples": jnp.asarray(arr)},)


# ---------------------------------------------------------------------------
# image zoo (nodes.py + comfy_extras/nodes_images.py, nodes_mask.py)


@register_node("EmptyImage")
def empty_image(ctx: InferenceContext, node: WorkflowNode):
    """Solid-color RGB image from a packed 0xRRGGBB int
    (nodes.py:1813-1834 EmptyImage)."""
    import jax.numpy as jnp

    width = _widget(node, 0, 512, int)
    height = _widget(node, 1, 512, int)
    batch = _widget(node, 2, 1, int)
    color = _widget(node, 3, 0, int)
    rgb = jnp.asarray([(color >> 16) & 0xFF, (color >> 8) & 0xFF,
                       color & 0xFF], jnp.float32) / 255.0
    return (jnp.broadcast_to(rgb, (batch, height, width, 3)),)


@register_node("ImageCrop")
def image_crop(ctx: InferenceContext, node: WorkflowNode, image=None):
    """(comfy_extras/nodes_images.py:14-34 ImageCrop)"""
    width = _widget(node, 0, 512, int)
    height = _widget(node, 1, 512, int)
    x = min(_widget(node, 2, 0, int), image.shape[2] - 1)
    y = min(_widget(node, 3, 0, int), image.shape[1] - 1)
    return (image[:, y:y + height, x:x + width, :],)


@register_node("RepeatImageBatch")
def repeat_image_batch(ctx: InferenceContext, node: WorkflowNode, image=None):
    """(comfy_extras/nodes_images.py:36-49 RepeatImageBatch)"""
    import jax.numpy as jnp

    amount = _widget(node, 0, 1, int)
    return (jnp.tile(image, (amount, 1, 1, 1)),)


@register_node("ImageFromBatch")
def image_from_batch(ctx: InferenceContext, node: WorkflowNode, image=None):
    """(comfy_extras/nodes_images.py:51-68 ImageFromBatch)"""
    batch_index = min(image.shape[0] - 1, _widget(node, 0, 0, int))
    length = min(image.shape[0] - batch_index, _widget(node, 1, 1, int))
    return (image[batch_index:batch_index + length],)


@register_node("ImageColorToMask")
def image_color_to_mask(ctx: InferenceContext, node: WorkflowNode, image=None):
    """Mask = 1 where the pixel equals the packed 0xRRGGBB color
    (comfy_extras/nodes_mask.py:132-151 ImageColorToMask)."""
    import jax.numpy as jnp

    color = _widget(node, 0, 0, int)
    quant = jnp.round(jnp.clip(image, 0.0, 1.0) * 255.0).astype(jnp.int32)
    packed = (quant[..., 0] << 16) | (quant[..., 1] << 8) | quant[..., 2]
    return ((packed == color).astype(jnp.float32),)


@register_node("CropMask")
def crop_mask(ctx: InferenceContext, node: WorkflowNode, mask=None):
    """(comfy_extras/nodes_mask.py:193-215 CropMask)"""
    import jax.numpy as jnp

    m = jnp.asarray(mask)
    if m.ndim == 2:
        m = m[None]
    x = _widget(node, 0, 0, int)
    y = _widget(node, 1, 0, int)
    width = _widget(node, 2, 512, int)
    height = _widget(node, 3, 512, int)
    return (m[:, y:y + height, x:x + width],)


@register_node("LoadImageMask")
def load_image_mask(ctx: InferenceContext, node: WorkflowNode):
    """Load one channel of an image as a mask; alpha is inverted
    (nodes.py:1682-1725 LoadImageMask)."""
    import jax.numpy as jnp

    name = str(_widget(node, 0, ""))
    channel = str(_widget(node, 1, "alpha"))
    path = _find_model_file(ctx, name)
    if path is None:
        logger.warning(f"LoadImageMask: '{name}' not found; zeros(64,64)")
        return (jnp.zeros((1, 64, 64)),)
    from PIL import Image

    pil = Image.open(path)
    if pil.mode == "I":
        pil = pil.point(lambda v: v * (1 / 255))
    pil = pil.convert("RGBA")
    c = channel[0].upper()
    arr = np.asarray(pil.getchannel(c), np.float32) / 255.0
    if c == "A":
        arr = 1.0 - arr
    return (jnp.asarray(arr)[None],)


@register_node("ImageScaleToTotalPixels")
def image_scale_to_total_pixels(ctx: InferenceContext, node: WorkflowNode,
                                image=None):
    """Scale preserving aspect to hit a megapixel budget
    (comfy_extras/nodes_post_processing.py ImageScaleToTotalPixels)."""
    method = str(_widget(node, 0, "bilinear"))
    megapixels = _widget(node, 1, 1.0, float)
    total = megapixels * 1024 * 1024
    scale = math.sqrt(total / (image.shape[1] * image.shape[2]))
    h = round(image.shape[1] * scale)
    w = round(image.shape[2] * scale)
    return (_resize_image(image, h, w, method),)


@register_node("Canny")
def canny_node(ctx: InferenceContext, node: WorkflowNode, image=None):
    """Canny edge preprocessor (comfy_extras/nodes_canny.py Canny; the
    kernel lives in ops/canny.py as a jitted NHWC pipeline)."""
    from stable_renderer_tpu.ops.canny import canny

    low = _widget(node, 0, 0.4, float)
    high = _widget(node, 1, 0.8, float)
    return (canny(image, low, high),)


def _save_animated(images, fps: float, suffix: str, **pil_kwargs):
    from PIL import Image

    from stable_renderer_tpu.utils.paths import OUTPUT_DIR

    out_dir = Path(OUTPUT_DIR) / "workflow"
    out_dir.mkdir(parents=True, exist_ok=True)
    frames = [Image.fromarray(
        np.clip(np.asarray(f) * 255.0, 0, 255).astype(np.uint8))
        for f in images]
    counter = len(list(out_dir.glob(f"anim_*{suffix}")))
    path = out_dir / f"anim_{counter:05}{suffix}"
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=round(1000.0 / max(fps, 0.01)), **pil_kwargs)
    return str(path)


@register_node("SaveAnimatedWEBP")
def save_animated_webp(ctx: InferenceContext, node: WorkflowNode, images=None):
    """(comfy_extras/nodes_images.py SaveAnimatedWEBP)"""
    fps = _widget(node, 1, 6.0, float)
    lossless = bool(_widget(node, 2, True))
    quality = _widget(node, 3, 80, int)
    method = str(_widget(node, 4, "default"))
    methods = {"default": 4, "fastest": 0, "slowest": 6}
    path = _save_animated(images, fps, ".webp", lossless=lossless,
                          quality=quality, method=methods.get(method, 4))
    ctx.status_messages.append(f"saved {path}")
    return (images,)


@register_node("SaveAnimatedPNG")
def save_animated_png(ctx: InferenceContext, node: WorkflowNode, images=None):
    """(comfy_extras/nodes_images.py SaveAnimatedPNG — APNG writer)"""
    fps = _widget(node, 1, 6.0, float)
    compress_level = _widget(node, 2, 4, int)
    path = _save_animated(images, fps, ".png",
                          compress_level=compress_level)
    ctx.status_messages.append(f"saved {path}")
    return (images,)


# ---------------------------------------------------------------------------
# conditioning (nodes.py + nodes_clip_sdxl.py + nodes_cond.py)


@register_node("ConditioningAverage")
def conditioning_average(ctx: InferenceContext, node: WorkflowNode,
                         conditioning_to=None, conditioning_from=None):
    """Weighted average of two conditionings; the shorter context is
    zero-padded on the token axis (nodes.py:79-120 ConditioningAverage)."""
    import jax.numpy as jnp

    strength = _widget(node, 0, 1.0, float)
    t1 = conditioning_to["context"]
    t0 = conditioning_from["context"][:, :t1.shape[1]]
    if t0.shape[1] < t1.shape[1]:
        pad = jnp.zeros((t0.shape[0], t1.shape[1] - t0.shape[1], t1.shape[2]),
                        t0.dtype)
        t0 = jnp.concatenate([t0, pad], axis=1)
    out = dict(conditioning_to)
    out["context"] = t1 * strength + t0 * (1.0 - strength)
    p1 = conditioning_to.get("pooled")
    p0 = conditioning_from.get("pooled")
    if p1 is not None and p0 is not None:
        out["pooled"] = p1 * strength + p0 * (1.0 - strength)
    elif p0 is not None:
        out["pooled"] = p0
    return (out,)


@register_node("ConditioningSetAreaStrength")
def conditioning_set_area_strength(ctx: InferenceContext, node: WorkflowNode,
                                   conditioning=None):
    """(nodes.py ConditioningSetAreaStrength — strength only)"""
    strength = _widget(node, 0, 1.0, float)
    return ({**conditioning, "strength": strength},)


def _encode_tower(clip: dict, text_l: str, text_g: str | None = None):
    """Dual-tower SDXL encode when the clip dict carries a G tower, else the
    plain weighted single-tower path (sdxl_clip.py SDXLClipModel vs SD1).

    Split prompts (text_g != text_l) run the dual encoder once per text and
    splice the matching tower's features; the shorter chunk stream is
    zero-padded (the reference pads with empty-prompt chunks —
    sdxl_clip.py SDXLTokenizer)."""
    import jax.numpy as jnp

    from stable_renderer_tpu.models.clip import (
        encode_token_weights_batch,
        encode_token_weights_batch_g,
        encode_token_weights_batch_xl,
    )

    if clip.get("g_only"):
        # SDXL-Refiner: single G tower, 1280-wide context + G text projection
        # pooled (sdxl_clip.py SDXLRefinerClipModel) — text_g drives it
        ids, w, _ = clip["tokenizer"].tokenize_weighted_batch(
            [text_g if text_g is not None else text_l])
        return encode_token_weights_batch_g(
            clip["clip_g"], clip["params_g"], jnp.asarray(ids), jnp.asarray(w),
            clip_skip=int(clip.get("clip_skip", -2)),
        )
    if clip.get("clip_g") is not None:
        def enc(text):
            ids, w, custom = clip["tokenizer"].tokenize_weighted_batch([text])
            return encode_token_weights_batch_xl(
                clip["clip"], clip["clip_g"], clip["params"],
                clip["params_g"], jnp.asarray(ids), jnp.asarray(w),
                None if custom is None else jnp.asarray(custom),
                clip_skip=int(clip.get("clip_skip", -2)),
            )

        if text_g is None or text_g == text_l:
            return enc(text_l)
        z_l, _ = enc(text_l)
        z_g, pooled = enc(text_g)
        length = max(z_l.shape[1], z_g.shape[1])

        def pad(z):
            if z.shape[1] == length:
                return z
            return jnp.concatenate(
                [z, jnp.zeros((z.shape[0], length - z.shape[1], z.shape[2]),
                              z.dtype)], axis=1)

        d_l = clip["clip"].config.hidden_size
        return (jnp.concatenate(
            [pad(z_l)[..., :d_l], pad(z_g)[..., d_l:]], axis=-1), pooled)
    ids, w, custom = clip["tokenizer"].tokenize_weighted_batch([text_l])
    return encode_token_weights_batch(
        clip["clip"], clip["params"], jnp.asarray(ids), jnp.asarray(w),
        None if custom is None else jnp.asarray(custom),
        clip_skip=int(clip.get("clip_skip", -1)),
    )


@register_node("CLIPTextEncodeSDXL")
def clip_text_encode_sdxl(ctx: InferenceContext, node: WorkflowNode, clip=None):
    """SDXL dual-prompt encode with size/crop ADM conditioning
    (comfy_extras/nodes_clip_sdxl.py CLIPTextEncodeSDXL +
    model_base.py:346-370 SDXL.encode_adm)."""
    from stable_renderer_tpu.models.sdxl import sdxl_adm_vector

    width = _widget(node, 0, 1024, int)
    height = _widget(node, 1, 1024, int)
    crop_w = _widget(node, 2, 0, int)
    crop_h = _widget(node, 3, 0, int)
    target_width = _widget(node, 4, 1024, int)
    target_height = _widget(node, 5, 1024, int)
    text_g = str(_widget(node, 6, ""))
    text_l = str(_widget(node, 7, text_g))
    context, pooled = _encode_tower(clip, text_l, text_g)
    cond = {"context": context, "pooled": pooled, "controls": [],
            "prompt": text_g}
    if pooled is not None:
        cond["y"] = sdxl_adm_vector(
            pooled, original_size=(height, width), crop=(crop_h, crop_w),
            target_size=(target_height, target_width))
    return (cond,)


@register_node("CLIPTextEncodeSDXLRefiner")
def clip_text_encode_sdxl_refiner(ctx: InferenceContext, node: WorkflowNode,
                                  clip=None):
    """Refiner encode: pooled + Fourier[h, w, crop_h, crop_w, aesthetic]
    (nodes_clip_sdxl.py CLIPTextEncodeSDXLRefiner +
    model_base.py:319-344 SDXLRefiner.encode_adm)."""
    from stable_renderer_tpu.models.sdxl import sdxl_refiner_adm_vector

    ascore = _widget(node, 0, 6.0, float)
    width = _widget(node, 1, 1024, int)
    height = _widget(node, 2, 1024, int)
    text = str(_widget(node, 3, ""))
    context, pooled = _encode_tower(clip, text, text)
    cond = {"context": context, "pooled": pooled, "controls": [],
            "prompt": text}
    if pooled is not None:
        cond["y"] = sdxl_refiner_adm_vector(
            pooled, original_size=(height, width), aesthetic_score=ascore)
    return (cond,)


@register_node("CLIPTextEncodeControlnet")
def clip_text_encode_controlnet(ctx: InferenceContext, node: WorkflowNode,
                                clip=None, conditioning=None):
    """Attach a separate text encoding for controlnets that take their own
    prompt (comfy_extras/nodes_cond.py CLIPTextEncodeControlnet —
    cross_attn_controlnet). Consumed by the control assembly when the
    controlnet's context slot differs from the sampling context."""
    text = str(_widget(node, 0, ""))
    context, pooled = _encode_tower(clip, text)
    return ({**conditioning, "controlnet_context": context,
             "controlnet_pooled": pooled},)


# ---------------------------------------------------------------------------
# loaders (nodes.py advanced/loaders)


def _tiny_vae():
    import jax

    from stable_renderer_tpu.models import TINY_VAE_CONFIG, VAE

    vae = VAE(TINY_VAE_CONFIG)
    return {"vae": vae, "params": vae.init(jax.random.PRNGKey(1))}


@register_node("VAELoader")
def vae_loader(ctx: InferenceContext, node: WorkflowNode):
    """Standalone VAE checkpoint loader (nodes.py VAELoader; accepts bare
    VAE state dicts or full checkpoints' first_stage_model.* subtree)."""
    import jax.numpy as jnp

    from stable_renderer_tpu.models import SD15_VAE_CONFIG, VAE

    name = str(_widget(node, 0, ""))
    path = _find_model_file(ctx, name)
    if path is None:
        logger.warning(f"VAE '{name}' not found; tiny random VAE")
        return (_tiny_vae(),)
    from stable_renderer_tpu.models.weights import (
        load_state_dict,
        nest,
        to_device,
    )

    flat = load_state_dict(path)
    if any(k.startswith("first_stage_model.") for k in flat):
        flat = {k[len("first_stage_model."):]: v for k, v in flat.items()
                if k.startswith("first_stage_model.")}
    return ({"vae": VAE(SD15_VAE_CONFIG),
             "params": to_device(nest(flat, ""), jnp.bfloat16)},)


@register_node("CLIPLoader")
def clip_loader(ctx: InferenceContext, node: WorkflowNode):
    """Standalone text-encoder loader (nodes.py CLIPLoader)."""
    import jax
    import jax.numpy as jnp

    from stable_renderer_tpu.models import (
        CLIPTextModel,
        SD15_CLIP_CONFIG,
        TINY_CLIP_CONFIG,
        Tokenizer,
    )

    name = str(_widget(node, 0, ""))
    path = _find_model_file(ctx, name)
    if path is None:
        logger.warning(f"CLIP '{name}' not found; tiny random CLIP")
        clip = CLIPTextModel(TINY_CLIP_CONFIG)
        return ({"clip": clip, "params": clip.init(jax.random.PRNGKey(2)),
                 "tokenizer": Tokenizer(TINY_CLIP_CONFIG)},)
    from stable_renderer_tpu.models.weights import (
        load_state_dict,
        nest,
        to_device,
    )

    flat = load_state_dict(path)
    for prefix in ("cond_stage_model.transformer.",
                   "text_model.", "transformer."):
        if any(k.startswith(prefix) for k in flat):
            flat = {k[len(prefix):]: v for k, v in flat.items()
                    if k.startswith(prefix)}
            break
    clip = CLIPTextModel(SD15_CLIP_CONFIG)
    return ({"clip": clip,
             "params": to_device(nest(flat, ""), jnp.float32),
             "tokenizer": Tokenizer(SD15_CLIP_CONFIG)},)


@register_node("DualCLIPLoader")
def dual_clip_loader(ctx: InferenceContext, node: WorkflowNode):
    """SDXL dual text-encoder loader (nodes.py DualCLIPLoader): clip_l +
    clip_g towers in one CLIP value."""
    import dataclasses
    import jax

    from stable_renderer_tpu.models import (
        CLIPTextModel,
        TINY_CLIP_CONFIG,
        TINY_UNET_CONFIG,
        Tokenizer,
    )
    from stable_renderer_tpu.models.clip import OpenCLIPConfig, OpenCLIPTextModel

    name_l = str(_widget(node, 0, ""))
    name_g = str(_widget(node, 1, ""))
    path_l = _find_model_file(ctx, name_l)
    path_g = _find_model_file(ctx, name_g)
    if path_l is None or path_g is None:
        logger.warning("DualCLIPLoader: checkpoints not found; tiny random towers")
        ccfg = dataclasses.replace(
            TINY_CLIP_CONFIG, hidden_size=TINY_UNET_CONFIG.context_dim)
        clip_l = CLIPTextModel(ccfg)
        gcfg = OpenCLIPConfig(
            vocab_size=ccfg.vocab_size, width=ccfg.hidden_size,
            num_layers=2, num_heads=2, max_length=ccfg.max_length,
            projection_dim=ccfg.hidden_size)
        clip_g = OpenCLIPTextModel(gcfg)
        return ({"clip": clip_l, "params": clip_l.init(jax.random.PRNGKey(3)),
                 "clip_g": clip_g,
                 "params_g": clip_g.init(jax.random.PRNGKey(4)),
                 "tokenizer": Tokenizer(ccfg)},)
    import jax.numpy as jnp

    from stable_renderer_tpu.models import SD15_CLIP_CONFIG
    from stable_renderer_tpu.models.clip import SDXL_CLIP_G_CONFIG
    from stable_renderer_tpu.models.weights import (
        load_state_dict,
        nest,
        to_device,
    )

    flat_l = load_state_dict(path_l)
    flat_g = load_state_dict(path_g)
    clip_l = CLIPTextModel(SD15_CLIP_CONFIG)
    clip_g = OpenCLIPTextModel(SDXL_CLIP_G_CONFIG)
    return ({"clip": clip_l,
             "params": to_device(nest(flat_l, ""), jnp.float32),
             "clip_g": clip_g,
             "params_g": to_device({"model": nest(flat_g, "")}, jnp.float32),
             "tokenizer": Tokenizer(SD15_CLIP_CONFIG)},)


@register_node("LoraLoader")
def lora_loader(ctx: InferenceContext, node: WorkflowNode, model=None,
                clip=None):
    """LoRA merge into BOTH the UNet and the text encoder
    (nodes.py LoraLoader; model-only variant already exists)."""
    name = str(_widget(node, 0, ""))
    strength_model = _widget(node, 1, 1.0, float)
    strength_clip = _widget(node, 2, 1.0, float)
    path = _find_model_file(ctx, name)
    if path is None:
        logger.warning(f"lora '{name}' not found; passing through")
        return model, clip
    from stable_renderer_tpu.models.lora import merge_lora
    from stable_renderer_tpu.models.weights import load_state_dict

    flat = load_state_dict(path)
    out_model = model
    if strength_model != 0.0 and model is not None:
        out_model = {**model, "params": merge_lora(
            model["params"], flat, strength_model, prefix="lora_unet_")}
    out_clip = clip
    if strength_clip != 0.0 and clip is not None:
        out_clip = {**clip, "params": merge_lora(
            clip["params"], flat, strength_clip, prefix="lora_te_")}
    return out_model, out_clip


@register_node("CheckpointLoader")
def checkpoint_loader_config(ctx: InferenceContext, node: WorkflowNode):
    """Config-file checkpoint loader (nodes.py CheckpointLoader). The config
    widget is accepted for workflow compatibility; architecture detection is
    state-dict driven (models/weights.py detect_unet_config), matching the
    reference's deprecation of config-based loading."""
    from stable_renderer_tpu.workflow.executor import checkpoint_loader

    inner = WorkflowNode(id=node.id, type="CheckpointLoaderSimple",
                         widgets=list(node.widgets[1:2]), inputs=node.inputs)
    return checkpoint_loader(ctx, inner)


@register_node("unCLIPCheckpointLoader")
def unclip_checkpoint_loader(ctx: InferenceContext, node: WorkflowNode):
    """unCLIP checkpoint loader -> (MODEL, CLIP, VAE, CLIP_VISION)
    (nodes.py unCLIPCheckpointLoader). The embedded CLIP-vision tower
    (embedder.model.visual.*) feeds unCLIPConditioning."""
    import jax

    from stable_renderer_tpu.workflow.executor import checkpoint_loader

    model, clip, vae = checkpoint_loader(ctx, node)
    name = str(_widget(node, 0, ""))
    path = _find_model_file(ctx, name)
    clip_vision = None
    if path is not None:
        from stable_renderer_tpu.models.clip_vision import (
            CLIPVisionModel,
            detect_vision_config,
        )
        from stable_renderer_tpu.models.weights import load_state_dict, nest

        flat = load_state_dict(path)
        prefix = "embedder.model.visual."
        sub = {k[len(prefix):]: v for k, v in flat.items()
               if k.startswith(prefix)}
        cfg = detect_vision_config(sub.keys()) if sub else None
        if cfg is not None:
            clip_vision = {"model": CLIPVisionModel(cfg),
                           "params": nest(sub, "")}
        elif sub:
            # openclip-layout embedders (visual.transformer.resblocks.*)
            # are not converted yet; the conditioning path still works with
            # an external CLIPVisionLoader
            logger.warning("unCLIP embedder layout unrecognized; "
                           "load a CLIP vision checkpoint separately")
    if clip_vision is None:
        from stable_renderer_tpu.models.clip_vision import (
            CLIPVisionModel,
            TINY_VISION_CONFIG,
        )

        m = CLIPVisionModel(TINY_VISION_CONFIG)
        clip_vision = {"model": m, "params": m.init(jax.random.PRNGKey(5))}
    return model, clip, vae, clip_vision


@register_node("DiffusersLoader")
def diffusers_loader(ctx: InferenceContext, node: WorkflowNode):
    """Diffusers-layout model directory -> (MODEL, CLIP, VAE)
    (nodes.py DiffusersLoader; models/diffusers_convert.py remaps the key
    layout into the comfy flat layout the normal loader consumes)."""
    name = str(_widget(node, 0, ""))
    base = None
    for d in ctx.model_dirs:
        cand = Path(d) / name
        if (cand / "model_index.json").exists() or (cand / "unet").exists():
            base = cand
            break
    if base is None and (Path(name) / "unet").exists():
        base = Path(name)
    if base is None:
        raise FileNotFoundError(f"diffusers model dir '{name}' not found")
    import jax.numpy as jnp

    from stable_renderer_tpu.models import (
        CLIPTextModel,
        SD15_CLIP_CONFIG,
        SD15_VAE_CONFIG,
        Tokenizer,
        UNetModel,
        VAE,
    )
    from stable_renderer_tpu.models.sampling import ModelSampling
    from stable_renderer_tpu.models.weights import load_checkpoint, to_device

    # load_checkpoint routes directory paths through the diffusers-layout
    # conversion (models/diffusers_convert.py load_diffusers_folder)
    unet_p, vae_p, clip_p, ucfg = load_checkpoint(str(base))
    model = {"unet": UNetModel(ucfg),
             "params": to_device(unet_p, jnp.bfloat16),
             "sampling": ModelSampling()}
    vae = {"vae": VAE(SD15_VAE_CONFIG),
           "params": to_device(vae_p, jnp.bfloat16)}
    clip = {"clip": CLIPTextModel(SD15_CLIP_CONFIG),
            "params": to_device(clip_p, jnp.float32),
            "tokenizer": Tokenizer(SD15_CLIP_CONFIG)}
    return model, clip, vae


@register_node("StyleModelLoader")
def style_model_loader(ctx: InferenceContext, node: WorkflowNode):
    """T2I StyleAdapter loader (nodes.py StyleModelLoader; sd.py:383
    StyleModel)."""
    import jax

    from stable_renderer_tpu.models.t2i_adapter import (
        StyleAdapter,
        StyleAdapterConfig,
        load_style_model,
    )

    name = str(_widget(node, 0, ""))
    path = _find_model_file(ctx, name)
    if path is None:
        logger.warning(f"style model '{name}' not found; tiny random")
        cfg = StyleAdapterConfig(width=64, context_dim=32, num_head=4,
                                 n_layers=2, num_token=4)
        sa = StyleAdapter(cfg)
        return ({"model": sa, "params": sa.init(jax.random.PRNGKey(6))},)
    from stable_renderer_tpu.models.weights import load_state_dict

    sa, params = load_style_model(load_state_dict(path))
    return ({"model": sa, "params": params},)


@register_node("StyleModelApply")
def style_model_apply(ctx: InferenceContext, node: WorkflowNode,
                      conditioning=None, style_model=None,
                      clip_vision_output=None):
    """Append the style tokens to the text context on the token axis
    (nodes.py StyleModelApply: torch.cat((t, style_cond), dim=1))."""
    import jax.numpy as jnp

    tokens = style_model["model"].apply(
        style_model["params"],
        clip_vision_output.last_hidden_state.astype(jnp.float32))
    ctx_t = conditioning["context"]
    tokens = jnp.broadcast_to(tokens[:1], (ctx_t.shape[0], *tokens.shape[1:]))
    return ({**conditioning,
             "context": jnp.concatenate(
                 [ctx_t, tokens.astype(ctx_t.dtype)], axis=1)},)


@register_node("DiffControlNetLoader")
def diff_controlnet_loader(ctx: InferenceContext, node: WorkflowNode,
                           model=None):
    """Difference-format controlnet loader (nodes.py DiffControlNetLoader):
    diff checkpoints store controlnet-minus-base weights; the base model's
    matching tensors are added back when the KSampler materializes the
    control (comfy controlnet.py load_controlnet model-diff path). The value
    stays lazy like ControlNetLoader's — the executor's control sniffing
    resolves it."""
    name = str(_widget(node, 0, ""))
    path = _find_model_file(ctx, name)
    return ({"name": name, "path": path, "diff_base": model},)


@register_node("VAEDecodeTiled")
def vae_decode_tiled(ctx: InferenceContext, node: WorkflowNode,
                     samples=None, vae=None):
    """Tiled VAE decode (nodes.py VAEDecodeTiled; models/vae.py
    decode_tiled host-loop over overlapping latent tiles)."""
    import jax.numpy as jnp

    tile = _widget(node, 0, 512, int)
    dtype = vae["params"]["quant_conv"]["weight"].dtype
    z = _samples(samples)
    img = vae["vae"].decode_tiled(vae["params"], z.astype(dtype),
                                  tile=max(tile // 8, 8))
    return (jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0),)


@register_node("VAEEncodeTiled")
def vae_encode_tiled(ctx: InferenceContext, node: WorkflowNode,
                     pixels=None, vae=None):
    """Tiled VAE encode (nodes.py VAEEncodeTiled)."""
    import jax.numpy as jnp

    tile = _widget(node, 0, 512, int)
    dtype = vae["params"]["quant_conv"]["weight"].dtype
    z = vae["vae"].encode_tiled(
        vae["params"], (jnp.asarray(pixels)[..., :3] * 2.0 - 1.0).astype(dtype),
        tile=tile)
    return ({"samples": z.astype(jnp.float32)},)


# ---------------------------------------------------------------------------
# advanced model patches (nodes_model_advanced.py + nodes_model_downscale.py)


@register_node("ModelSamplingDiscrete")
def model_sampling_discrete(ctx: InferenceContext, node: WorkflowNode,
                            model=None):
    """Swap the model's sampling schedule/prediction (nodes_model_advanced.py
    ModelSamplingDiscrete: eps | v_prediction | lcm | x0, optional
    zero-terminal-SNR sigma rescale)."""
    from stable_renderer_tpu.models.sampling.schedules import (
        ModelSampling,
        rescale_zero_terminal_snr_sigmas,
    )

    sampling = str(_widget(node, 0, "eps"))
    zsnr = bool(_widget(node, 1, False))
    pred = {"eps": "eps", "v_prediction": "v", "lcm": "lcm", "x0": "x0"}[sampling]
    ms = ModelSampling(prediction=pred)
    if zsnr:
        ms.set_sigmas(rescale_zero_terminal_snr_sigmas(ms.sigmas))
    return ({**model, "sampling": ms},)


@register_node("ModelSamplingContinuousEDM")
def model_sampling_continuous_edm(ctx: InferenceContext, node: WorkflowNode,
                                  model=None):
    """(nodes_model_advanced.py ModelSamplingContinuousEDM)"""
    from stable_renderer_tpu.models.sampling.schedules import ModelSamplingEDM

    sampling = str(_widget(node, 0, "v_prediction"))
    sigma_max = _widget(node, 1, 120.0, float)
    sigma_min = _widget(node, 2, 0.002, float)
    pred = "v" if sampling == "v_prediction" else "eps"
    ms = ModelSamplingEDM(prediction=pred, edm_sigma_min=sigma_min,
                          edm_sigma_max=sigma_max)
    return ({**model, "sampling": ms},)


@register_node("ModelSamplingStableCascade")
def model_sampling_stable_cascade(ctx: InferenceContext, node: WorkflowNode,
                                  model=None):
    """(nodes_model_advanced.py ModelSamplingStableCascade)"""
    from stable_renderer_tpu.models.sampling.schedules import ModelSamplingCascade

    shift = _widget(node, 0, 2.0, float)
    return ({**model, "sampling": ModelSamplingCascade(shift=shift)},)


@register_node("RescaleCFG")
def rescale_cfg(ctx: InferenceContext, node: WorkflowNode, model=None):
    """v-space CFG rescale patch (nodes_model_advanced.py:173-210 RescaleCFG;
    the math runs inside make_denoiser's CFG combine)."""
    multiplier = _widget(node, 0, 0.7, float)
    return (_add_patch(model, {"kind": "rescale_cfg",
                               "sig": ("rescale_cfg", multiplier),
                               "multiplier": multiplier}),)


@register_node("PatchModelAddDownscale")
def patch_model_add_downscale(ctx: InferenceContext, node: WorkflowNode,
                              model=None):
    """Kohya Deep Shrink (nodes_model_downscale.py PatchModelAddDownscale).
    TPU static-shape note: applied as a sigma-gated low-pass (down+up) at the
    patched input block instead of shrinking mid-network shapes — see
    nodes_extra._make_downscale_in_block."""
    block_number = _widget(node, 0, 3, int)
    factor = _widget(node, 1, 2.0, float)
    start_percent = _widget(node, 2, 0.0, float)
    end_percent = _widget(node, 3, 0.35, float)
    after_skip = bool(_widget(node, 4, True))
    down_m = str(_widget(node, 5, "bicubic"))
    up_m = str(_widget(node, 6, "bicubic"))
    return (_add_patch(model, {
        "kind": "downscale",
        "sig": ("downscale", block_number, factor, start_percent, end_percent,
                after_skip, down_m, up_m),
        "block_number": block_number, "downscale_factor": factor,
        "start_percent": start_percent, "end_percent": end_percent,
        "after_skip": after_skip, "downscale_method": down_m,
        "upscale_method": up_m}),)


# ---------------------------------------------------------------------------
# stragglers (nodes_stable_cascade.py / nodes_stable3d.py)


@register_node("StableCascade_StageC_VAEEncode")
def stable_cascade_stage_c_vae_encode(ctx: InferenceContext,
                                      node: WorkflowNode,
                                      image=None, vae=None):
    """Encode pixels into a Stage-C latent at the requested compression and
    an empty Stage-B latent (nodes_stable_cascade.py:51-83)."""
    import jax.numpy as jnp

    import jax

    compression = _widget(node, 0, 42, int)
    height, width = image.shape[1], image.shape[2]
    # encoder downscale ratio: 2^(levels-1) for our VAE; the cascade effnet
    # encoder's is 32 (comfy sd.py VAE downscale_ratio for stage C)
    cfg = getattr(vae["vae"], "config", None)
    ratio = 2 ** (len(cfg.ch_mult) - 1) if cfg is not None else 32
    out_w = max(ratio, (width // compression) * ratio)
    out_h = max(ratio, (height // compression) * ratio)
    s = _resize_image(image[..., :3], out_h, out_w, "bicubic")
    dtype = jax.tree_util.tree_leaves(vae["params"])[0].dtype
    c_latent = vae["vae"].encode(vae["params"],
                                 (s * 2.0 - 1.0).astype(dtype))
    b_latent = jnp.zeros((c_latent.shape[0], height // 4, width // 4, 4))
    return ({"samples": c_latent.astype(jnp.float32)},
            {"samples": b_latent})


@register_node("StableZero123_Conditioning_Batched")
def stable_zero123_conditioning_batched(ctx: InferenceContext,
                                        node: WorkflowNode,
                                        clip_vision=None, init_image=None,
                                        vae=None):
    """Batched Zero123 conditioning: per-row camera embeddings stepped by
    elevation/azimuth increments; batch_index pinned so every view shares
    the noise seed (nodes_stable3d.py:56-99)."""
    import jax
    import jax.numpy as jnp

    w = node.widgets
    width = int(w[0]) if w else 256
    height = int(w[1]) if len(w) > 1 else 256
    batch_size = int(w[2]) if len(w) > 2 else 1
    elevation = float(w[3]) if len(w) > 3 else 0.0
    azimuth = float(w[4]) if len(w) > 4 else 0.0
    elev_inc = float(w[5]) if len(w) > 5 else 0.0
    azim_inc = float(w[6]) if len(w) > 6 else 0.0

    out = clip_vision["model"].encode_image(clip_vision["params"], init_image)
    pooled = out.image_embeds[:1][:, None, :]  # (1, 1, D)
    img = jnp.asarray(init_image)[..., :3]
    if img.shape[1:3] != (height, width):
        img = jax.image.resize(
            img, (img.shape[0], height, width, 3), method="bilinear")
    dtype = vae["params"]["quant_conv"]["weight"].dtype
    t = vae["vae"].encode(vae["params"], (img * 2.0 - 1.0).astype(dtype)
                          ).astype(jnp.float32)
    rows = []
    for i in range(batch_size):
        e = elevation + elev_inc * i
        a = azimuth + azim_inc * i
        rows.append([
            math.radians((90.0 - e) - 90.0),
            math.sin(math.radians(a)),
            math.cos(math.radians(a)),
            math.radians(90.0),
        ])
    cam = jnp.asarray(rows, jnp.float32)[:, None, :]  # (B, 1, 4)
    pooled_b = jnp.broadcast_to(pooled, (batch_size, 1, pooled.shape[-1]))
    cond_ctx = jnp.concatenate([pooled_b, cam], axis=-1)
    t_b = _repeat_to_batch(t, batch_size)
    positive = {"context": cond_ctx, "controls": [],
                "concat_latent_image": t_b, "prompt": "zero123"}
    negative = {"context": jnp.zeros_like(cond_ctx), "controls": [],
                "concat_latent_image": jnp.zeros_like(t_b), "prompt": ""}
    latent = {"samples": jnp.zeros(
        (batch_size, height // 8, width // 8, 4)),
        "batch_index": [0] * batch_size}
    return positive, negative, latent
