"""IDMap — the per-frame correspondence data structure.

Shape (N, H, W, 4) int32, cell = (spriteID, materialID, map_index, vertexID).
Same contract as the reference (reference: engine/static/corrmap.py:49-280), with the
derived products re-expressed as pure, jittable array functions:

  * ``id_masks``   — background mask (map_index == 2048 OR all-zero cell) as float,
                     matching IDMap.__attrs_post_init__ (corrmap.py:119-130).
  * ``vertex_screen_info`` — the flattened (M, 7) table
                     (spriteID, materialID, map_index, vertexID, x_ratio, y_ratio,
                     frame_index) (corrmap.py:220-280). The torch version boolean-
                     filters to a dynamic M; the XLA version keeps static shape
                     (N*H*W, 7) plus a validity mask — every consumer here is a
                     masked segment op, so no compaction is ever needed.
  * ``flat_correspondence`` — the common consumable: flat vertex ids + validity for
                     segment reductions keyed by vertexID.

Host-side ``IDMap`` wraps the array with frame indices and the directory loader that
understands the reference's .npy map dumps (corrmap.py:138-198).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.data.framebuffers import NON_AI_MAP_INDEX
from stable_renderer_tpu.utils.paths import extract_index


def id_masks(id_tensor: jax.Array) -> jax.Array:
    """Background mask from an id map: 1.0 where there is NO AI id.

    A pixel is background when map_index == 2048 (non-AI object) or the whole cell is
    zero (nothing rendered). Matches reference corrmap.py:119-127.

    Args:
      id_tensor: (..., 4) int32.
    Returns:
      (...,) float32 mask.
    """
    non_ai = id_tensor[..., 2] == NON_AI_MAP_INDEX
    all_zero = jnp.all(id_tensor == 0, axis=-1)
    return jnp.logical_or(non_ai, all_zero).astype(jnp.float32)


def vertex_screen_info(
    id_tensor: jax.Array, frame_indices: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Flattened per-pixel correspondence table with validity mask.

    Args:
      id_tensor: (N, H, W, 4) int32.
      frame_indices: (N,) int32 frame index of each batch row.

    Returns:
      info:  (N*H*W, 7) float32 —
             (spriteID, materialID, map_index, vertexID, x_ratio, y_ratio, frame_idx).
             Ratios match the reference exactly: x_ratio = x / height,
             y_ratio = y / width (sic — the reference divides by the *other* axis,
             corrmap.py:237-250; identical for square maps, kept for parity).
      valid: (N*H*W,) bool — False where map_index == 2048 or cell all-zero
             (the rows the torch version filters out, corrmap.py:271-279).
    """
    n, h, w, _ = id_tensor.shape
    x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :], (n, h, w))
    y = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :, None], (n, h, w))
    f = jnp.broadcast_to(frame_indices.astype(jnp.float32)[:, None, None], (n, h, w))
    info = jnp.concatenate(
        [
            id_tensor.astype(jnp.float32),
            (x / h)[..., None],
            (y / w)[..., None],
            f[..., None],
        ],
        axis=-1,
    ).reshape(-1, 7)
    ids = id_tensor.reshape(-1, 4)
    valid = jnp.logical_and(
        ids[:, 2] != NON_AI_MAP_INDEX, jnp.any(ids != 0, axis=-1)
    )
    return info, valid


def flat_correspondence(
    id_tensor: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """(vertexID, valid) flattened over all frames+pixels, for segment reductions.

    Returns:
      vertex_ids: (N*H*W,) int32
      valid:      (N*H*W,) bool (AI pixels only)
    """
    ids = id_tensor.reshape(-1, 4)
    valid = jnp.logical_and(ids[:, 2] != NON_AI_MAP_INDEX, jnp.any(ids != 0, axis=-1))
    return ids[:, 3], valid


@dataclass
class IDMap:
    """Host wrapper: (N, H, W, 4) int32 array + frame indices.

    Mirrors the reference IDMap class surface (corrmap.py:49-280)."""

    tensor: jax.Array
    frame_indices: list[int] = field(default_factory=list)

    def __post_init__(self) -> None:
        t = jnp.asarray(self.tensor)
        if t.ndim == 3:
            t = t[None]
        if t.ndim != 4 or t.shape[-1] != 4:
            raise ValueError(f"IDMap tensor must be (N, H, W, 4), got {t.shape}")
        self.tensor = t.astype(jnp.int32)
        if not self.frame_indices:
            self.frame_indices = list(range(t.shape[0]))
        if len(self.frame_indices) != t.shape[0]:
            raise ValueError("frame_indices length must equal batch size")

    @property
    def frame_count(self) -> int:
        return len(self.frame_indices)

    @property
    def height(self) -> int:
        return self.tensor.shape[-3]

    @property
    def width(self) -> int:
        return self.tensor.shape[-2]

    @property
    def masks(self) -> jax.Array:
        """(N, H, W) float32: 1.0 = background (no AI id)."""
        return id_masks(self.tensor)

    def __getitem__(self, index: int) -> jax.Array:
        return self.tensor[index]

    def __len__(self) -> int:
        return self.frame_count

    def create_vertex_screen_info(self) -> tuple[jax.Array, jax.Array]:
        return vertex_screen_info(
            self.tensor, jnp.asarray(self.frame_indices, dtype=jnp.int32)
        )

    @classmethod
    def from_directory(
        cls,
        directory: str | Path,
        frame_start: int | None = None,
        num_frames: int | None = None,
        use_frame_indices_from_filename: bool = True,
    ) -> "IDMap":
        """Load per-frame ``*.npy`` id dumps (the reference's map-output format,
        corrmap.py:138-198). Files are ordered by the integer index parsed from the
        filename."""
        directory = Path(directory)
        if not directory.exists():
            raise FileNotFoundError(directory)
        names = [f for f in os.listdir(directory) if f.endswith(".npy")]
        fallback = {f: i for i, f in enumerate(names)}
        names.sort(key=lambda f: extract_index(f, fallback[f]))
        frame_start = frame_start or 0
        if use_frame_indices_from_filename:
            indices = [extract_index(f) for f in names]
        else:
            indices = list(range(len(names)))
        num_frames = num_frames or len(names)
        names = names[frame_start : frame_start + num_frames]
        indices = indices[frame_start : frame_start + num_frames]
        if not names:
            raise ValueError(f"No .npy id maps found in {directory}")
        arrays = []
        for name in names:
            arr = np.load(directory / name)
            arr = np.squeeze(arr)
            if arr.ndim != 3:
                raise ValueError(f"Invalid id tensor shape {arr.shape} in {name}")
            if arr.shape[0] == 4 and arr.shape[-1] != 4:  # CHW -> HWC
                arr = np.moveaxis(arr, 0, -1)
            arrays.append(arr.astype(np.int32))
        if any(a.shape != arrays[0].shape for a in arrays):
            raise ValueError("Inconsistent id map shapes")
        return cls(tensor=jnp.asarray(np.stack(arrays)), frame_indices=indices)

    @classmethod
    def from_tensor(cls, frame_indices: list[int], tensor: jax.Array) -> "IDMap":
        return cls(tensor=tensor, frame_indices=list(frame_indices))
