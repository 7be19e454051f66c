"""Correspondence / temporal-consistency algorithms — the stable-rendering core.

Capability match for the reference's Corresponder stack
(reference: common_utils/stable_render_utils/corresponder.py — the Corresponder
protocol :29-98, DefaultCorresponder :100-155, OverlapCorresponder :157-377 — and
the noise-sequence loaders, comfyUI/stable_rendering/_nodes/loaders.py:154-271).

TPU-first re-design: each hook is a pure jittable function over static-shape
arrays; they plug into the denoise scan through models.unet.AttnHooks and the
sampler step_callback, so the whole temporal-consistency machinery compiles into
the single-program denoise loop (the reference runs these as eager torch inside a
Python sampling loop).

Components:
  * ``broadcast_kv_injection`` — OverlapCorresponder.pre_atten_inject semantics
    (:188-220): every frame attends to the K/V of N selected frames (full
    cross-frame attention with shared context). Multi-chip: the K/V gather is an
    all_gather over the frame-sharded mesh axis (see parallel/).
  * ``vertex_average_injection`` — OverlapCorresponder.step_finished (:298-376):
    group latent pixels by 3D vertexID across frames, blend each pixel toward its
    group mean, AdaIN-renormalize per frame.
  * ``vertex_noise`` — CreateNoiseSequenceFromIdMap: identical starting noise per
    3D vertex across frames.
  * Host-level Corresponder classes mirroring the reference protocol, assembling
    the above into AttnHooks + step callbacks + the bake-time corrmap update.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from stable_renderer_tpu.data.corrmap import CorrespondMap
from stable_renderer_tpu.data.framebuffers import NON_AI_MAP_INDEX
from stable_renderer_tpu.models.unet import AttnHooks
from stable_renderer_tpu.ops.math import adain, group_average_by_id, group_randn_by_id


def broadcast_kv_injection(
    k: jax.Array,  # (B, L, C) self-attn key context (pre-projection)
    v: jax.Array,  # (B, L, C)
    frame_indices=(0,),  # static ints OR a traced int array (per-run random pick)
) -> Tuple[jax.Array, jax.Array]:
    """Replace every frame's K/V context with the concatenation of the selected
    frames' contexts (OverlapCorresponder.pre_atten_inject :188-220).

    ``frame_indices`` may be static host ints or a traced index array — the
    latter reproduces the reference's per-run random frame pick
    (corresponder.py:203-208 torch.randint once per run) without recompiling:
    the gather is dynamic, the shapes static.
    """
    b = k.shape[0]
    idx = jnp.asarray(frame_indices) % b
    n_sel = idx.shape[0]
    l, c = k.shape[1], k.shape[2]
    sel_k = k[idx].reshape(n_sel * l, c)
    sel_v = v[idx].reshape(n_sel * l, c)
    k_out = jnp.broadcast_to(sel_k[None], (b, n_sel * l, c))
    v_out = jnp.broadcast_to(sel_v[None], (b, n_sel * l, c))
    return k_out, v_out


def latent_vertex_ids(
    id_maps: jax.Array,  # (B, H, W, 4) int32 image-resolution id maps
    height: int,
    width: int,
) -> Tuple[jax.Array, jax.Array]:
    """Nearest-downsample the id map to latent resolution; return
    (vertex_ids (B, h, w), valid (B, h, w)).

    Matches the reference's coordinate scaling (corresponder.py:313-318:
    screen ratios * latent size, nearest)."""
    b, ih, iw, _ = id_maps.shape
    rows = (jnp.arange(height) * ih // height).astype(jnp.int32)
    cols = (jnp.arange(width) * iw // width).astype(jnp.int32)
    small = id_maps[:, rows][:, :, cols]
    valid = jnp.logical_and(
        small[..., 2] != NON_AI_MAP_INDEX, jnp.any(small != 0, axis=-1)
    )
    return small[..., 3], valid


@partial(jax.jit, static_argnames=("num_segments", "weighting", "adain_mode"))
def vertex_average_injection(
    latent: jax.Array,    # (B, h, w, C)
    id_maps: jax.Array,   # (B, H, W, 4)
    ratio: jax.Array | float = 0.1,
    num_segments: int = 262144,
    weighting: str = "average",
    normal_maps: Optional[jax.Array] = None,  # (B, H, W, >=3) encoded normals
    adain_mode: str = "content",
) -> jax.Array:
    """Blend each latent pixel toward the (weighted) mean of all pixels
    (across frames) sharing its 3D vertex, then AdaIN back to the original
    statistics (OverlapCorresponder.step_finished :298-376).

    ``weighting`` selects the per-pixel mixing scheme of the reference's
    legacy overlap algorithms (legacy_codes/stable_rendering_algo/overlap/
    algorithms.py:6-121):
      * "average"        — uniform group mean (AverageDistance).
      * "frame_distance" — EXACT pairwise 1/(|f_i - f_j| + 1) mixing
                           (FrameDistance), via per-(vertex, frame) sums.
      * "pixel_distance" — trust weight 1/(|x - x̄_g| + |y - ȳ_g| + 1): pixels
                           far from the vertex's mean screen position count
                           less (PixelDistance, reformulated from pairwise to
                           per-occurrence trust for static shapes).
      * "view_normal"    — trust weight 1/(|1 - facing| + 1) from the normal
                           map's view-facing component (PerpendicularViewNormal);
                           falls back to "average" when normal_maps is None.
    """
    from stable_renderer_tpu.ops.math import (
        group_frame_distance_average,
        group_weighted_average_by_id,
    )

    b, h, w, c = latent.shape
    vids, valid = latent_vertex_ids(id_maps, h, w)
    flat = latent.reshape(-1, c)
    flat_ids = vids.reshape(-1)
    flat_valid = valid.reshape(-1)
    if weighting == "frame_distance":
        frames = jnp.repeat(jnp.arange(b, dtype=jnp.int32), h * w)
        per_row = group_frame_distance_average(
            flat, flat_ids, frames, num_segments, b, valid=flat_valid)
    elif weighting == "pixel_distance":
        xs = jnp.tile(jnp.tile(jnp.arange(w, dtype=jnp.float32), h), b)
        ys = jnp.tile(jnp.repeat(jnp.arange(h, dtype=jnp.float32), w), b)
        pos = jnp.stack([xs, ys], axis=-1)
        mean_pos, _ = group_average_by_id(pos, flat_ids, num_segments,
                                          valid=flat_valid)
        dist = jnp.abs(pos - mean_pos).sum(-1)
        per_row = group_weighted_average_by_id(
            flat, flat_ids, 1.0 / (dist + 1.0), num_segments, valid=flat_valid)
    elif weighting == "view_normal" and normal_maps is not None:
        rows = (jnp.arange(h) * normal_maps.shape[1] // h).astype(jnp.int32)
        cols = (jnp.arange(w) * normal_maps.shape[2] // w).astype(jnp.int32)
        small = normal_maps[:, rows][:, :, cols]
        # encoded [0,1] -> view-space normal; facing = |n_z| (1 = toward camera)
        facing = jnp.abs(small[..., 2] * 2.0 - 1.0).reshape(-1)
        per_row = group_weighted_average_by_id(
            flat, flat_ids, 1.0 / (jnp.abs(1.0 - facing) + 1.0),
            num_segments, valid=flat_valid)
    else:
        per_row, _ = group_average_by_id(
            flat, flat_ids, num_segments, valid=flat_valid)
    blended = (1.0 - ratio) * flat + ratio * per_row
    blended = jnp.where(valid.reshape(-1, 1), blended, flat)
    modified = blended.reshape(b, h, w, c)
    if adain_mode == "reference":
        # Bug-compatible with the reference's step_finished: it calls
        # adaptive_instance_normalization(noise.clone(), noise_copy)
        # (corresponder.py:360-363) with CONTENT = the ORIGINAL noise — so
        # only the averaged copy's per-(frame, channel) statistics survive
        # and the averaged CONTENT is discarded (the commented-out masking
        # right below that call suggests an abandoned fight with this).
        return adain(latent, modified)
    # "content" (default, deliberate deviation): keep the vertex-averaged
    # content and renormalize it back to the ORIGINAL latent's statistics —
    # the intended cross-frame-consistency semantics; A/B evidence in
    # PARITY.json diffusion_ab (scripts/diffusion_ab.py).
    return adain(modified, latent)


@partial(jax.jit, static_argnames=("num_segments", "height", "width", "channels"))
def vertex_noise(
    key: jax.Array,
    id_maps: jax.Array,  # (B, H, W, 4)
    height: int,
    width: int,
    channels: int = 4,
    num_segments: int = 262144,
) -> jax.Array:
    """Per-vertex-consistent starting noise at latent resolution
    (CreateNoiseSequenceFromIdMap semantics): pixels of the same 3D vertex get the
    same gaussian sample in every frame; background pixels get independent noise.
    """
    b = id_maps.shape[0]
    vids, valid = latent_vertex_ids(id_maps, height, width)
    flat = group_randn_by_id(
        key, vids.reshape(-1), num_segments, channels
    )
    indep = jax.random.normal(jax.random.fold_in(key, 7), (b * height * width, channels))
    out = jnp.where(valid.reshape(-1, 1), flat, indep)
    return out.reshape(b, height, width, channels)


# ---------------------------------------------------------------------------
# host-level corresponder objects (the reference protocol surface)


@dataclass(eq=False)  # identity hash: corresponders are static args of the jitted step
class Corresponder:
    """Protocol base (corresponder.py:29-98). Subclasses override any of the five
    hook points; ``attn_hooks``/``step_callback`` adapt them into the compiled
    denoise loop."""

    layer_range: Optional[Tuple[int, ...]] = (6,)

    def prepare(self, engine_data) -> None:  # noqa: ANN001
        pass

    def attn_hooks(self, engine_data, key: Optional[jax.Array] = None) -> AttnHooks:  # noqa: ANN001
        """Build the traced attention hooks. ``key`` (traced) seeds per-run
        randomness (the reference's once-per-run random frame pick)."""
        return AttnHooks()

    def _gate_layer(self, layer: int) -> bool:
        """layer_range gating (corresponder.py:162-166: 'the layers that the
        correspond function will be applied to'; None = all layers). layer is a
        static trace-time int, so gating costs nothing compiled."""
        return self.layer_range is None or layer in self.layer_range

    def step_callback(self, engine_data, ms=None, sigmas=None):  # noqa: ANN001
        """Returns (x, denoised, sigma, i) -> x for samplers.sample, or None."""
        log_sigmas = None
        if ms is not None:
            import jax.numpy as _jnp

            log_sigmas = _jnp.asarray(ms.log_sigmas)
        id_maps = None if engine_data is None else engine_data.id_maps
        normals = None if engine_data is None else engine_data.normal_maps
        return self.make_step_callback(id_maps, log_sigmas, normals)

    def make_step_callback(self, id_maps, log_sigmas, normal_maps=None):  # noqa: ANN001
        """Trace-time factory: build the per-step latent callback from traced
        arrays (called inside the jitted denoise program)."""
        return None

    def finished(self, engine_data, images: jax.Array) -> None:  # noqa: ANN001
        pass


@dataclass(eq=False)
class DefaultCorresponder(Corresponder):
    """Bake-path corresponder (corresponder.py:100-155): on ``finished``
    (post-VAE-decode) scatter the decoded frames into every submitted
    CorrespondMap."""

    update_corrmap: bool = True
    update_corrmap_mode: str = "first_avg"
    ignore_obj_mat_id_when_update: bool = False

    def finished(self, engine_data, images: jax.Array) -> None:  # noqa: ANN001
        if not self.update_corrmap or images is None or engine_data.id_maps is None:
            return
        from stable_renderer_tpu.data.idmap import id_masks

        id_maps = engine_data.id_maps
        masks = id_masks(id_maps)
        for (sprite_id, material_id), cmap in engine_data.correspond_maps.items():
            cmap.update(
                color_frames=images,
                id_maps=id_maps,
                mode=self.update_corrmap_mode,
                masks=masks,
                spriteID=sprite_id,
                materialID=material_id,
                ignore_obj_mat_id=self.ignore_obj_mat_id_when_update,
                inverse_masks=True,  # update non-background pixels
            )


_DEFAULT_CORRESPONDER: Optional[DefaultCorresponder] = None


def default_corresponder() -> DefaultCorresponder:
    """The shared default corresponder instance. Corresponders are identity-hashed
    static jit arguments (eq=False), so handing out a fresh instance per frame
    would retrace the fused frame program every frame — the default must be a
    process-wide singleton (it is stateless: config flags only)."""
    global _DEFAULT_CORRESPONDER
    if _DEFAULT_CORRESPONDER is None:
        _DEFAULT_CORRESPONDER = DefaultCorresponder()
    return _DEFAULT_CORRESPONDER


@dataclass(eq=False)
class OverlapCorresponder(DefaultCorresponder):
    """Cross-frame-consistency corresponder (corresponder.py:157-377).

    Modes:
      * default: every frame attends to the K/V of ``pre_attn_frames``
        (static) — or, when ``pre_attn_frames`` is None, of
        ``pre_attn_inject_num_random_frames`` frames picked randomly per run
        from the traced key (the reference's torch.randint-once semantics,
        corresponder.py:203-208, recompile-free).
      * ``all_frames=True``: full cross-frame attention — sequence = frames x
        tokens (SURVEY.md section 2.6 'all-frames' long-context mechanism).
        With ``mesh`` set, routes through ring attention over the dp-sharded
        frame axis (parallel/ring_attention.py): K/V blocks rotate via
        ppermute, no chip materializes the full sequence.
    """

    update_corrmap_mode: str = "first"
    pre_attn_inject_num_random_frames: int = 1
    pre_attn_frames: Optional[Tuple[int, ...]] = (1,)
    step_finished_inject_ratio: float = 0.1
    step_finished_stop_inject_timestep: float = 500.0
    vertex_segments: int = 262144
    # per-pixel mixing scheme of the legacy overlap algorithms
    # (algorithms.py:6-121): average | frame_distance | pixel_distance |
    # view_normal (view_normal needs normal maps at the callback)
    weighting: str = "average"
    # adain handling of the step_finished injection: "content" (default —
    # vertex-averaged content renormalized to the original statistics, the
    # intended consistency semantics) | "reference" (bug-compatible with
    # corresponder.py:360-363, which keeps the ORIGINAL content and applies
    # only the averaged copy's statistics — see vertex_average_injection)
    step_finished_adain: str = "content"
    all_frames: bool = False
    mesh: Optional[object] = None  # jax Mesh: ring-attention routing when set
    mesh_axis: str = "dp"
    allow_any_sampler: bool = False  # the reference restricts CorrespondSampler
    # + OverlapCorresponder to ddim/ddpm (stable_rendering/_nodes/samplers.py:163)
    # and the executor enforces it; the scan-based injection here is actually
    # sampler-agnostic, so True opts out (engine/pipeline paths never gate)

    def attn_hooks(self, engine_data, key: Optional[jax.Array] = None) -> AttnHooks:  # noqa: ANN001
        if self.all_frames:
            from stable_renderer_tpu.parallel.ring_attention import (
                cross_frame_attention,
                ring_cross_frame_attention,
            )

            def attn(q, k, v, heads, layer):
                from stable_renderer_tpu.models.layers import attention as _plain

                if not self._gate_layer(layer):
                    return _plain(q, k, v, heads)
                if self.mesh is not None:
                    return ring_cross_frame_attention(
                        q, k, v, heads, self.mesh, self.mesh_axis
                    )
                return cross_frame_attention(q, k, v, heads)

            return AttnHooks(attn=attn)
        if self.pre_attn_inject_num_random_frames < 0:
            return AttnHooks()
        n_sel = max(self.pre_attn_inject_num_random_frames, 1)
        random_pick = self.pre_attn_frames is None
        if not random_pick:
            frames = jnp.asarray(self.pre_attn_frames[:n_sel])
        elif key is not None:
            # per-run random bits; mapped to [1, B) inside pre where the frame
            # count is known (reference torch.randint(1, B, (n,)) once per run,
            # corresponder.py:203-208)
            frames = jax.random.randint(key, (n_sel,), 0, 1_000_003)
        else:
            frames = jnp.arange(1, n_sel + 1)
            random_pick = False

        def pre(q, k, v, layer):
            if not self._gate_layer(layer):
                return q, k, v
            idx = 1 + frames % max(k.shape[0] - 1, 1) if random_pick else frames
            k2, v2 = broadcast_kv_injection(k, v, idx)
            return q, k2, v2

        return AttnHooks(pre=pre)

    def make_step_callback(self, id_maps, log_sigmas, normal_maps=None):  # noqa: ANN001
        if id_maps is None:
            return None
        ratio = self.step_finished_inject_ratio
        stop_t = self.step_finished_stop_inject_timestep
        segs = self.vertex_segments
        weighting = self.weighting
        adain_mode = self.step_finished_adain

        def cb(x, denoised, sigma, i):
            injected = vertex_average_injection(
                x, id_maps, ratio, num_segments=segs,
                weighting=weighting, normal_maps=normal_maps,
                adain_mode=adain_mode)
            if log_sigmas is None:
                return injected
            from stable_renderer_tpu.models.sampling.cfg import timestep_from_sigma

            t = timestep_from_sigma(log_sigmas, sigma)
            # reference: stop injecting once timestep drops below the threshold
            return jnp.where(t >= stop_t, injected, x)

        return cb
