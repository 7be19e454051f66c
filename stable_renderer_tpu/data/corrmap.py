"""CorrespondMap — view-binned UV-space color cache for baking.

State contract matches the reference (reference: engine/static/corrmap.py:373-886):
    values:   (k*k, map_h * map_w, C) float   — per view-bin flattened UV color cache
    written:  (k*k, map_h * map_w) bool       — which cells hold real data

``corrmap_update`` is the TPU-native replacement for the reference's torch fancy
scatter + (stubbed) Taichi dedup kernel (corrmap.py:286-342, 578-736): one jittable
masked segment reduction over (map_index, vertexID) cells.  Update modes match the
reference's UpdateMode docstring semantics (corrmap.py:344-357):

    replace      overwrite the cell with the (first) new contribution
    replace_avg  overwrite the cell with the MEAN of this update's contributions
    first        write only unwritten cells, first contribution wins
    first_avg    write only unwritten cells, mean of this update's contributions

Determinism note: where the reference relies on torch scatter ordering for duplicate
(map_index, vertexID) pixels, this implementation defines the winner as the pixel
with the smallest flattened screen index (deterministic segment-min), and the *_avg
modes actually average (the reference's dedup kernel is stubbed out, corrmap.py:727).

dump/Load use the reference's on-disk interchange format byte-for-byte:
k*k PNGs + ``{i}_written.png`` masks + ``meta.json`` (+ optional zip)
(corrmap.py:738-872), so maps bake here and replay in the reference and vice versa.
"""

from __future__ import annotations

import json
import os
import zipfile
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Optional, Tuple
from uuid import uuid4

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.utils.log import EngineLogger
from stable_renderer_tpu.utils.paths import TEMP_DIR

UpdateMode = str  # 'replace' | 'replace_avg' | 'first' | 'first_avg'
_MODES = ("replace", "replace_avg", "first", "first_avg")


@partial(
    jax.jit,
    static_argnames=("mode", "num_bins", "ignore_obj_mat_id"),
)
def corrmap_update(
    values: jax.Array,      # (K2, M, C) float
    written: jax.Array,     # (K2, M) bool
    color_frame: jax.Array, # (H, W, C') float
    id_map: jax.Array,      # (H, W, 4) int32
    mode: str = "first_avg",
    mask: Optional[jax.Array] = None,  # (H, W): >0 keeps the pixel
    sprite_id: Optional[jax.Array] = None,
    material_id: Optional[jax.Array] = None,
    ignore_obj_mat_id: bool = False,
    num_bins: int = 9,
) -> Tuple[jax.Array, jax.Array]:
    """One frame's scatter into the correspondence map. Returns (values, written).

    Cell key = map_index * M + vertexID; pixels with out-of-range keys, failing the
    mask, or not matching sprite/material ids contribute nothing.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    k2, m, c = values.shape
    assert k2 == num_bins

    cf = color_frame.reshape(-1, color_frame.shape[-1]).astype(jnp.float32)
    if cf.shape[-1] > c:
        cf = cf[:, :c]
    elif c == 4 and cf.shape[-1] == 3:  # add alpha=1 (reference corrmap.py:699-701)
        cf = jnp.concatenate([cf, jnp.ones_like(cf[:, :1])], axis=-1)

    ids = id_map.reshape(-1, 4)
    map_index = ids[:, 2]
    vertex_id = ids[:, 3]

    valid = (map_index >= 0) & (map_index < num_bins) & (vertex_id >= 0) & (vertex_id < m)
    if mask is not None:
        valid &= mask.reshape(-1) > 0
    if not ignore_obj_mat_id:
        if sprite_id is not None:
            valid &= ids[:, 0] == sprite_id
        if material_id is not None:
            valid &= ids[:, 1] == material_id

    seg = jnp.where(valid, map_index * m + vertex_id, num_bins * m)
    n_seg = num_bins * m

    if mode in ("first", "first_avg"):
        cell_written = written.reshape(-1)[jnp.clip(seg, 0, n_seg - 1)]
        valid &= ~cell_written
        seg = jnp.where(valid, seg, n_seg)

    if mode.endswith("_avg"):
        sums = jax.ops.segment_sum(
            jnp.where(valid[:, None], cf, 0.0), seg, num_segments=n_seg + 1
        )[:-1]
        counts = jax.ops.segment_sum(
            valid.astype(jnp.float32), seg, num_segments=n_seg + 1
        )[:-1]
        touched = counts > 0
        new_cell = sums / jnp.maximum(counts, 1.0)[:, None]
    else:
        # first-contribution-wins: deterministic winner = min screen index
        n_pix = cf.shape[0]
        pix = jnp.arange(n_pix, dtype=jnp.int32)
        big = jnp.iinfo(jnp.int32).max
        win = jax.ops.segment_min(
            jnp.where(valid, pix, big), seg, num_segments=n_seg + 1
        )[:-1]
        touched = win != big
        new_cell = cf[jnp.clip(win, 0, n_pix - 1)]
        new_cell = jnp.where(touched[:, None], new_cell, 0.0)

    flat_vals = values.reshape(n_seg, c).astype(jnp.float32)
    flat_written = written.reshape(n_seg)
    out_vals = jnp.where(touched[:, None], new_cell, flat_vals)
    out_written = flat_written | touched
    return out_vals.reshape(values.shape).astype(values.dtype), out_written.reshape(written.shape)


def corrmap_update_sharded(
    values: jax.Array,        # (K2, M, C) float — replicated
    written: jax.Array,       # (K2, M) bool — replicated
    color_frames: jax.Array,  # (B, H, W, C') — dp-sharded over frames
    id_maps: jax.Array,       # (B, H, W, 4) int32 — dp-sharded
    mesh,                     # jax.sharding.Mesh
    axis: str = "dp",
    mode: str = "first_avg",
    masks: Optional[jax.Array] = None,  # (B, H, W) — dp-sharded
    sprite_id: Optional[int] = None,
    material_id: Optional[int] = None,
    ignore_obj_mat_id: bool = False,
    num_bins: int = 9,
) -> Tuple[jax.Array, jax.Array]:
    """Collective corrmap scatter (SURVEY.md section 2.6 last bullet): frames
    stay dp-sharded on their devices; each chip segment-reduces its local
    frames, then ICI collectives (pmin for the winning frame / psum for sums
    and counts) merge per-cell across the mesh. No chip ever materializes the
    full frame batch, and the result is replicated and EXACTLY equal to the
    host-sequential per-frame loop (CorrespondMap.update):

      * first / first_avg — the earliest frame touching an unwritten cell
        wins (sequential gating reproduced via per-cell winning-frame
        selection, then the reduction restricted to that frame);
      * replace / replace_avg — the latest frame touching the cell wins;
      * non-avg modes take the winning frame's smallest screen index pixel,
        avg modes take the mean over the winning frame's contributions.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}")
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    k2, m, c = values.shape
    b_total, h, w = color_frames.shape[:3]
    n_seg = num_bins * m
    hw = h * w
    big = jnp.iinfo(jnp.int32).max

    def local_update(vals, writ, cfs, ids_b, msk):
        ax = jax.lax.axis_index(axis)
        b_local = cfs.shape[0]
        n_pix = b_local * hw

        cf = cfs.reshape(n_pix, cfs.shape[-1]).astype(jnp.float32)
        if cf.shape[-1] > c:
            cf = cf[:, :c]
        elif c == 4 and cf.shape[-1] == 3:
            cf = jnp.concatenate([cf, jnp.ones_like(cf[:, :1])], axis=-1)
        ids = ids_b.reshape(n_pix, 4)
        map_index, vertex_id = ids[:, 2], ids[:, 3]
        valid = ((map_index >= 0) & (map_index < num_bins)
                 & (vertex_id >= 0) & (vertex_id < m))
        if msk is not None:
            valid &= msk.reshape(n_pix) > 0
        if not ignore_obj_mat_id:
            if sprite_id is not None:
                valid &= ids[:, 0] == sprite_id
            if material_id is not None:
                valid &= ids[:, 1] == material_id
        seg = jnp.where(valid, map_index * m + vertex_id, n_seg)
        if mode in ("first", "first_avg"):
            cell_written = writ.reshape(-1)[jnp.clip(seg, 0, n_seg - 1)]
            valid &= ~cell_written
            seg = jnp.where(valid, seg, n_seg)

        # global frame index of every local pixel
        gframe = ax * b_local + jnp.repeat(jnp.arange(b_local, dtype=jnp.int32), hw)
        # winning-frame key: first* -> earliest frame; replace* -> latest
        fkey = gframe if mode.startswith("first") else (b_total - 1 - gframe)
        fwin = jax.ops.segment_min(
            jnp.where(valid, fkey, big), seg, num_segments=n_seg + 1)[:-1]
        fwin = jax.lax.pmin(fwin, axis)
        touched = fwin != big
        valid &= fkey == fwin[jnp.clip(seg, 0, n_seg - 1)]
        seg = jnp.where(valid, seg, n_seg)

        if mode.endswith("_avg"):
            sums = jax.ops.segment_sum(
                jnp.where(valid[:, None], cf, 0.0), seg, num_segments=n_seg + 1)[:-1]
            counts = jax.ops.segment_sum(
                valid.astype(jnp.float32), seg, num_segments=n_seg + 1)[:-1]
            sums = jax.lax.psum(sums, axis)
            counts = jax.lax.psum(counts, axis)
            new_cell = sums / jnp.maximum(counts, 1.0)[:, None]
        else:
            # smallest screen index within the winning frame; unique winner,
            # so a masked psum broadcasts its color
            pix_in_frame = jnp.tile(jnp.arange(hw, dtype=jnp.int32), b_local)
            pwin = jax.ops.segment_min(
                jnp.where(valid, pix_in_frame, big), seg, num_segments=n_seg + 1)[:-1]
            pwin = jax.lax.pmin(pwin, axis)
            is_winner = valid & (pix_in_frame == pwin[jnp.clip(seg, 0, n_seg - 1)])
            new_cell = jax.ops.segment_sum(
                jnp.where(is_winner[:, None], cf, 0.0), seg,
                num_segments=n_seg + 1)[:-1]
            new_cell = jax.lax.psum(new_cell, axis)

        flat_vals = vals.reshape(n_seg, c).astype(jnp.float32)
        out_vals = jnp.where(touched[:, None], new_cell, flat_vals)
        out_written = writ.reshape(n_seg) | touched
        return (out_vals.reshape(vals.shape).astype(vals.dtype),
                out_written.reshape(writ.shape))

    if masks is None:
        fn = shard_map(
            lambda v, wr, cf, ids: local_update(v, wr, cf, ids, None),
            mesh=mesh, in_specs=(P(), P(), P(axis), P(axis)),
            out_specs=(P(), P()), check_rep=False)
        return fn(values, written, color_frames, id_maps)
    fn = shard_map(
        local_update, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()), check_rep=False)
    return fn(values, written, color_frames, id_maps, masks)


@dataclass
class CorrespondMap:
    """Host wrapper around the (values, written) device arrays.

    The GL ``sampler2DArray`` upload path of the reference (corrmap.py:443-528) is
    unnecessary on TPU: the rasterizer samples ``values`` directly as an array
    (see ops/gbuffer.py BAKED mode)."""

    name: str = "corrmap"
    k: int = 3
    height: int = 512
    width: int = 512
    channel_count: int = 4
    values: jax.Array = field(default=None)  # type: ignore[assignment]
    written: jax.Array = field(default=None)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.values is None:
            self.values = jnp.zeros(
                (self.k * self.k, self.height * self.width, self.channel_count),
                jnp.float32,
            )
        if self.written is None:
            self.written = jnp.zeros((self.k * self.k, self.height * self.width), bool)

    # --- reference-parity accessors (corrmap.py:540-576) ---

    def __getitem__(self, index: int) -> jax.Array:
        return self.values[index]

    def get_map(self, index: int) -> jax.Array:
        return self.values[index].reshape(self.height, self.width, self.channel_count)

    def get_maps(self) -> jax.Array:
        return self.values.reshape(self.k * self.k, self.height, self.width, self.channel_count)

    def get_written_flag_map(self, index: int) -> jax.Array:
        return self.written[index].reshape(self.height, self.width)

    def clear(self) -> None:
        self.values = jnp.zeros_like(self.values)
        self.written = jnp.zeros_like(self.written)

    def update(
        self,
        color_frames: jax.Array,  # (N, H, W, C) or (H, W, C)
        id_maps: jax.Array,       # (N, H, W, 4) or (H, W, 4)
        spriteID: int | None = None,
        materialID: int | None = None,
        mode: UpdateMode = "first_avg",
        masks: jax.Array | None = None,
        inverse_masks: bool = False,
        ignore_obj_mat_id: bool = False,
    ) -> None:
        """Scatter N frames into the map (reference corrmap.py:578-736)."""
        color_frames = jnp.asarray(color_frames)
        id_maps = jnp.asarray(id_maps)
        if color_frames.ndim == 3:
            color_frames = color_frames[None]
        if id_maps.ndim == 3:
            id_maps = id_maps[None]
        if masks is not None:
            masks = jnp.asarray(masks)
            if masks.ndim == 2:
                masks = masks[None]
            if masks.ndim == 4:
                masks = masks[..., 0]
            if inverse_masks:
                masks = 1.0 - masks
        vals, writ = self.values, self.written
        for i in range(color_frames.shape[0]):
            vals, writ = corrmap_update(
                vals,
                writ,
                color_frames[i],
                id_maps[i],
                mode=mode,
                mask=None if masks is None else masks[i],
                sprite_id=None if spriteID is None else jnp.int32(spriteID),
                material_id=None if materialID is None else jnp.int32(materialID),
                ignore_obj_mat_id=ignore_obj_mat_id,
                num_bins=self.k * self.k,
            )
        self.values, self.written = vals, writ
        EngineLogger.debug(
            f"Updated CorrespondMap {self.name}: mode={mode} sprite={spriteID} mat={materialID}"
        )

    def update_batch(
        self,
        color_frames: jax.Array,  # (B, H, W, C')
        id_maps: jax.Array,       # (B, H, W, 4)
        mesh,
        axis: str = "dp",
        spriteID: int | None = None,
        materialID: int | None = None,
        mode: UpdateMode = "first_avg",
        masks: jax.Array | None = None,
        inverse_masks: bool = False,
        ignore_obj_mat_id: bool = False,
    ) -> None:
        """Sharded batch scatter: frames stay dp-sharded across ``mesh``, the
        map updates via collectives (corrmap_update_sharded). Result is exactly
        the sequential ``update`` loop's."""
        if masks is not None:
            masks = jnp.asarray(masks)
            if masks.ndim == 4:
                masks = masks[..., 0]
            if inverse_masks:
                masks = 1.0 - masks
        self.values, self.written = corrmap_update_sharded(
            self.values, self.written, jnp.asarray(color_frames),
            jnp.asarray(id_maps), mesh, axis=axis, mode=mode, masks=masks,
            sprite_id=spriteID, material_id=materialID,
            ignore_obj_mat_id=ignore_obj_mat_id, num_bins=self.k * self.k,
        )

    # --- on-disk interchange (reference format, corrmap.py:738-872) ---

    def dump(
        self,
        path: str | Path,
        name: str | None = None,
        zip: bool = False,
        force: bool = False,
    ) -> str:
        from PIL import Image

        name = name or self.name
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        suffix = ".zip" if zip else ""
        real_name = name
        if not force:
            count = 1
            while (path / (real_name + suffix)).exists():
                real_name = f"{name}_{count}"
                count += 1
        target = path / (real_name + suffix)
        if zip:
            work = Path(TEMP_DIR) / uuid4().hex
        else:
            work = target
        work.mkdir(parents=True, exist_ok=True)

        mode_map = {1: "L", 3: "RGB", 4: "RGBA"}
        for i in range(self.k * self.k):
            img = np.clip(255.0 * np.asarray(self.get_map(i)), 0, 255).astype(np.uint8)
            Image.fromarray(img, mode=mode_map[self.channel_count]).save(work / f"{i}.png")
            wr = np.clip(255.0 * np.asarray(self.get_written_flag_map(i)), 0, 255).astype(np.uint8)
            Image.fromarray(wr, mode="L").save(work / f"{i}_written.png")

        meta = {
            "k": self.k,
            "height": self.height,
            "width": self.width,
            "channel_count": self.channel_count,
            "name": name,
        }
        with open(work / "meta.json", "w") as f:
            json.dump(meta, f)

        if zip:
            with zipfile.ZipFile(target, "w") as z:
                for f_ in os.listdir(work):
                    z.write(work / f_, f_)
                    os.remove(work / f_)
            os.rmdir(work)
        EngineLogger.debug(f"CorrespondMap {name} dumped to {target}")
        return str(target)

    @classmethod
    def Load(cls, path: str | Path, name: str | None = None) -> "CorrespondMap":
        from PIL import Image

        path = Path(path)
        is_zip = path.is_file()
        if is_zip:
            work = Path(TEMP_DIR) / uuid4().hex
            work.mkdir(parents=True, exist_ok=True)
            with zipfile.ZipFile(path, "r") as z:
                z.extractall(work)
        else:
            work = path
        with open(work / "meta.json") as f:
            meta = json.load(f)
        cmap = cls(
            name=name or meta["name"],
            k=meta["k"],
            height=meta["height"],
            width=meta["width"],
            channel_count=meta["channel_count"],
        )
        values = []
        writtens = []
        for i in range(cmap.k * cmap.k):
            img = np.asarray(Image.open(work / f"{i}.png"), dtype=np.float32) / 255.0
            values.append(img.reshape(-1, cmap.channel_count))
            wr = np.asarray(Image.open(work / f"{i}_written.png"), dtype=np.float32) / 255.0
            writtens.append(wr.reshape(-1) > 0.5)
        cmap.values = jnp.asarray(np.stack(values))
        cmap.written = jnp.asarray(np.stack(writtens))
        if is_zip:
            for f_ in os.listdir(work):
                os.remove(work / f_)
            os.rmdir(work)
        return cmap
