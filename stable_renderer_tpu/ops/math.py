"""Numeric core: AdaIN + grouped (segment) reductions keyed by integer IDs.

These are the TPU-native equivalents of the reference's math utilities
(reference: source/common_utils/math_utils.py:27-278 —
``adaptive_instance_normalization``, ``tensor_group_by_then_average``,
``tensor_group_by_then_randn_init``, ``tensor_group_by_then_set_first_occurance``).

Design differences (deliberate, for XLA):
  * The torch versions compute ``unique()`` (dynamic shapes). Here every group op is a
    fixed-size segment reduction over ``num_segments`` (static), so the whole pipeline
    stays jittable. IDs are arbitrary int32 in ``[0, num_segments)``; out-of-range IDs
    are treated as invalid and dropped.
  * All ops are pure functions; randomness takes an explicit ``jax.random`` key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def map_mean_std(feat: jax.Array, eps: float = 1e-5) -> tuple[jax.Array, jax.Array]:
    """Per-(batch, channel) spatial mean/std of an NHWC feature map.

    Matches reference ``calc_map_mean_std`` (math_utils.py:28-52) which uses the
    *unbiased* variance (torch ``var`` default, ddof=1) over flattened H*W.
    Returns arrays of shape (N, 1, 1, C).
    """
    n, h, w, c = feat.shape
    flat = feat.reshape(n, h * w, c).astype(jnp.float32)
    mean = jnp.mean(flat, axis=1)
    denom = max(h * w - 1, 1)
    var = jnp.sum((flat - mean[:, None, :]) ** 2, axis=1) / denom
    std = jnp.sqrt(var + eps)
    return mean[:, None, None, :].astype(feat.dtype), std[:, None, None, :].astype(feat.dtype)


def adain(content: jax.Array, style: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Adaptive instance normalization, NHWC.

    ``out = (content - mu_c) / sigma_c * sigma_s + mu_s`` per (batch, channel).
    Matches reference ``adaptive_instance_normalization`` (math_utils.py:56-82).
    """
    c_mean, c_std = map_mean_std(content, eps)
    s_mean, s_std = map_mean_std(style, eps)
    normalized = (content - c_mean) / c_std
    return normalized * s_std + s_mean


def _valid_segments(ids: jax.Array, num_segments: int) -> tuple[jax.Array, jax.Array]:
    """Clamp ids into range; return (segment_ids_for_scatter, valid_mask).

    Invalid rows scatter into segment ``num_segments`` (an extra dump segment)."""
    valid = (ids >= 0) & (ids < num_segments)
    seg = jnp.where(valid, ids, num_segments)
    return seg, valid


def group_average_by_id(
    values: jax.Array,
    ids: jax.Array,
    num_segments: int,
    valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Mean of ``values`` rows sharing the same id, broadcast back to each row.

    Args:
      values: (N, C) float.
      ids: (N,) int32 in [0, num_segments); out-of-range = dropped.
      valid: optional (N,) bool extra validity mask.

    Returns:
      (per_row_mean (N, C) — rows with invalid ids keep their original value,
       per_segment_mean (num_segments, C) — zero where a segment is empty).

    Equivalent of reference ``tensor_group_by_then_average`` (math_utils.py:90-165)
    with static shapes.
    """
    seg, in_range = _valid_segments(ids, num_segments)
    if valid is not None:
        in_range = in_range & valid
        seg = jnp.where(in_range, seg, num_segments)
    v32 = values.astype(jnp.float32)
    sums = jax.ops.segment_sum(
        jnp.where(in_range[:, None], v32, 0.0), seg, num_segments=num_segments + 1
    )
    counts = jax.ops.segment_sum(
        in_range.astype(jnp.float32), seg, num_segments=num_segments + 1
    )
    seg_mean = (sums / jnp.maximum(counts, 1.0)[:, None])[:-1]
    per_row = seg_mean[jnp.clip(ids, 0, num_segments - 1)]
    per_row = jnp.where(in_range[:, None], per_row, v32)
    return per_row.astype(values.dtype), seg_mean.astype(values.dtype)


def group_weighted_average_by_id(
    values: jax.Array,
    ids: jax.Array,
    weights: jax.Array,
    num_segments: int,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Per-row TRUST-weighted group mean: every member of an id group gets
    sum_j(w_j x_j) / sum_j(w_j) over the group.

    TPU-native reformulation of the legacy overlap weighting schemes that use
    a per-occurrence trust weight (reference legacy_codes/stable_rendering_algo/
    overlap/algorithms.py:98-121 PerpendicularViewNormal — weight by how
    directly the pixel faces the camera — and the PixelDistance scheme
    approximated as distance-from-group-mean-position)."""
    seg, in_range = _valid_segments(ids, num_segments)
    if valid is not None:
        in_range = in_range & valid
        seg = jnp.where(in_range, seg, num_segments)
    v32 = values.astype(jnp.float32)
    w32 = jnp.where(in_range, weights.astype(jnp.float32), 0.0)
    sums = jax.ops.segment_sum(v32 * w32[:, None], seg,
                               num_segments=num_segments + 1)
    wsum = jax.ops.segment_sum(w32, seg, num_segments=num_segments + 1)
    seg_mean = (sums / jnp.maximum(wsum, 1e-8)[:, None])[:-1]
    per_row = seg_mean[jnp.clip(ids, 0, num_segments - 1)]
    return jnp.where(in_range[:, None], per_row, v32).astype(values.dtype)


def group_frame_distance_average(
    values: jax.Array,   # (N, C) rows = pixels across a frame batch
    ids: jax.Array,      # (N,) vertex ids
    frames: jax.Array,   # (N,) int32 frame index of each row
    num_segments: int,
    n_frames: int,
    valid: jax.Array | None = None,
) -> jax.Array:
    """EXACT pairwise frame-distance mixing: row i of group g becomes
    sum_j values_j / (|f_i - f_j| + 1), normalized — the legacy FrameDistance
    algorithm (legacy_codes/.../algorithms.py:53-74).

    TPU shape: instead of per-group pairwise matrices (dynamic group sizes),
    accumulate per-(segment, frame) sums/counts with one segment_sum over
    seg * n_frames + frame, then combine with the static (n_frames, n_frames)
    reciprocal-distance kernel — static shapes, two matmul-free passes."""
    seg, in_range = _valid_segments(ids, num_segments)
    if valid is not None:
        in_range = in_range & valid
    f = jnp.clip(frames, 0, n_frames - 1)
    seg2 = jnp.where(in_range, seg * n_frames + f, num_segments * n_frames)
    v32 = values.astype(jnp.float32)
    sums = jax.ops.segment_sum(
        jnp.where(in_range[:, None], v32, 0.0), seg2,
        num_segments=num_segments * n_frames + 1,
    )[:-1].reshape(num_segments, n_frames, -1)
    counts = jax.ops.segment_sum(
        in_range.astype(jnp.float32), seg2,
        num_segments=num_segments * n_frames + 1,
    )[:-1].reshape(num_segments, n_frames)
    fgrid = jnp.arange(n_frames, dtype=jnp.float32)
    kern = 1.0 / (jnp.abs(fgrid[:, None] - fgrid[None, :]) + 1.0)  # (F, F)
    # per (segment, target frame): weighted sums over source frames
    mixed = jnp.einsum("tf,sfc->stc", kern, sums)       # (S, F, C)
    norm = jnp.einsum("tf,sf->st", kern, counts)        # (S, F)
    out_sf = mixed / jnp.maximum(norm, 1e-8)[..., None]
    safe_ids = jnp.clip(ids, 0, num_segments - 1)
    per_row = out_sf[safe_ids, f]
    return jnp.where(in_range[:, None], per_row, v32).astype(values.dtype)


def group_randn_by_id(
    key: jax.Array,
    ids: jax.Array,
    num_segments: int,
    channels: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Standard-normal value per id, identical for all rows sharing the id.

    Equivalent of reference ``tensor_group_by_then_randn_init``
    (math_utils.py:168-230): used to seed the *same* latent noise for every screen
    pixel that maps to the same 3D vertex across frames
    (reference: comfyUI/stable_rendering/_nodes/loaders.py CreateNoiseSequenceFromIdMap).

    Returns (N, channels); rows with out-of-range ids get independent noise.
    """
    table = jax.random.normal(key, (num_segments, channels), dtype=jnp.float32)
    in_range = (ids >= 0) & (ids < num_segments)
    gathered = table[jnp.clip(ids, 0, num_segments - 1)]
    fallback = jax.random.normal(jax.random.fold_in(key, 1), (ids.shape[0], channels))
    return jnp.where(in_range[:, None], gathered, fallback).astype(dtype)


def group_first_by_id(
    values: jax.Array,
    ids: jax.Array,
    order: jax.Array,
    num_segments: int,
    valid: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Broadcast, within each id group, the value of the row with the smallest
    ``order`` to every row of the group.

    Equivalent of reference ``tensor_group_by_then_set_first_occurance``
    (math_utils.py:233-278), deterministic by construction (the reference relies on a
    Python loop over argsort).

    Returns (per_row (N, C), winner_row_index_per_segment (num_segments,) int32 with
    -1 for empty segments).
    """
    n = values.shape[0]
    seg, in_range = _valid_segments(ids, num_segments)
    if valid is not None:
        in_range = in_range & valid
        seg = jnp.where(in_range, seg, num_segments)
    big = jnp.iinfo(jnp.int32).max
    order = order.astype(jnp.int64) if order.dtype == jnp.int64 else order.astype(jnp.int32)
    keyed = jnp.where(in_range, order.astype(jnp.int32), big)
    seg_min = jax.ops.segment_min(keyed, seg, num_segments=num_segments + 1)[:-1]
    # recover the winner row index: a row wins iff its order equals its segment's min.
    row_idx = jnp.arange(n, dtype=jnp.int32)
    is_winner = in_range & (order.astype(jnp.int32) == seg_min[jnp.clip(ids, 0, num_segments - 1)])
    winner_idx = jax.ops.segment_min(
        jnp.where(is_winner, row_idx, big), seg, num_segments=num_segments + 1
    )[:-1]
    empty = winner_idx == big
    winner_idx_safe = jnp.where(empty, 0, winner_idx)
    seg_first = jnp.where(empty[:, None], 0.0, values[winner_idx_safe].astype(jnp.float32))
    per_row = seg_first[jnp.clip(ids, 0, num_segments - 1)]
    per_row = jnp.where(in_range[:, None], per_row, values.astype(jnp.float32))
    return per_row.astype(values.dtype), jnp.where(empty, -1, winner_idx).astype(jnp.int32)


def downsample_mean(x: jax.Array, factor: int) -> jax.Array:
    """Mean-pool an (N, H, W, C) map by ``factor`` in both spatial dims.

    The reference merges every 8x8 pixel block into one latent cell
    (reference: renderManager.py:929-936). Implemented as a reshape-mean, which XLA
    fuses into a single reduction.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


def resize_nearest(x: jax.Array, height: int, width: int) -> jax.Array:
    """Nearest-neighbor resize of (N, H, W, C) to (N, height, width, C).

    Used where the reference calls F.interpolate(mode='nearest')
    (corresponder.py:253, 282)."""
    n, h, w, c = x.shape
    rows = (jnp.arange(height) * h // height).astype(jnp.int32)
    cols = (jnp.arange(width) * w // width).astype(jnp.int32)
    return x[:, rows][:, :, cols]
