"""GPipe-style pipeline parallelism (the ``pp`` mesh axis).

The reference is single-GPU and has no pipeline story at all (SURVEY.md §2.6);
this is the green-field TPU-native design for models whose weights outgrow one
chip (large text towers, DiT/video stacks): split a chain of UNIFORM stages
across devices, keep every chip busy by streaming microbatches through the
chain, and move activations over ICI with ``jax.lax.ppermute``.

Design (idiomatic XLA, no NCCL-style point-to-point):

  * Per-stage params are STACKED on a leading axis of size S and sharded over
    the mesh's ``pp`` axis — each device materializes exactly one stage's
    weights (1/S of the model).
  * One ``shard_map`` program: every device runs the same ``lax.scan`` over
    ``T = M + S - 1`` ticks (M microbatches). At each tick a device applies
    its stage to its current activation and ppermutes the result to the next
    stage. Stage 0 injects microbatch ``t`` while ``t < M``; the last stage
    collects microbatch ``t - (S-1)`` once valid. The classic GPipe bubble is
    ``(S-1)/(M+S-1)`` — amortized by more microbatches.
  * Activations may be arbitrary pytrees (e.g. ``(x, skip_stack)``) as long as
    their structure/shapes are identical at every stage boundary — the
    transformer-family contract. The UNet's shape-changing down/up path stays
    on the dp/tp axes (parallel/sharding.py); its uniform transformer middle
    could pipeline with this op unchanged.

Exactness: ``pipeline_apply(...) == fold(stage_fn, stages)(x)`` bit-for-bit in
f32 (asserted in tests/test_pipeline_parallel.py on the 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(per_stage: list) -> Any:
    """Stack S structurally-identical per-stage param pytrees along a new
    leading axis (the axis ``pipeline_apply`` shards over ``pp``)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage)


def pipeline_apply(
    stage_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: Any,
    mesh: Mesh,
    *,
    axis: str = "pp",
    num_microbatches: Optional[int] = None,
    batch_axis: Optional[str] = None,
) -> Any:
    """Apply ``S = mesh.shape[axis]`` stages to ``x`` as a GPipe pipeline.

    Args:
      stage_fn: ``(params_for_one_stage, activation) -> activation`` with the
        SAME activation structure/shapes in and out (uniform stages).
      stacked_params: pytree whose leaves carry a leading stage axis of size S
        (see ``stack_stage_params``); sharded over ``axis``.
      x: activation pytree whose leaves have a leading batch axis B.
      mesh: mesh containing ``axis`` (and optionally ``batch_axis``).
      num_microbatches: M; B must divide by it. Default: S (the minimum that
        keeps every stage busy once the pipeline fills).
      batch_axis: optional mesh axis to additionally data-shard each
        microbatch over (pp x dp grids).

    Returns the full-batch result, replicated over ``axis`` (one masked psum
    at the end — production callers that keep consuming on-device can drop it
    by reading from the last stage instead).
    """
    S = mesh.shape[axis]
    leaves = jax.tree.leaves(x)
    if not leaves:
        raise ValueError("pipeline_apply: empty activation pytree")
    B = leaves[0].shape[0]
    M = num_microbatches or S
    if B % M:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")

    # (B, ...) -> (M, B/M, ...)
    to_mb = lambda a: a.reshape((M, B // M) + a.shape[1:])
    from_mb = lambda a: a.reshape((B,) + a.shape[2:])
    x_mb = jax.tree.map(to_mb, x)

    # microbatch dim replicated over pp; within-microbatch batch dim optionally
    # dp-sharded
    act_spec = P(None, batch_axis)
    param_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    in_specs = (param_spec, jax.tree.map(lambda _: act_spec, x_mb))
    out_specs = jax.tree.map(lambda _: act_spec, x_mb)

    def local_fn(params, xs):
        stage = jax.lax.axis_index(axis)
        p = jax.tree.map(lambda a: a[0], params)  # this device's stage
        perm = [(i, (i + 1) % S) for i in range(S)]
        zeros_like_mb = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs)

        def tick(carry, t):
            recv, outbuf = carry
            # stage 0 injects microbatch t (clamped; t >= M injections never
            # reach the last stage before the loop ends)
            inject = jax.tree.map(
                lambda a: a[jnp.minimum(t, M - 1)], xs
            )
            cur = jax.tree.map(
                lambda i, r: jnp.where(stage == 0, i, r), inject, recv
            )
            out = stage_fn(p, cur)
            m = t - (S - 1)
            valid = jnp.logical_and(stage == S - 1, m >= 0)
            mc = jnp.maximum(m, 0)
            outbuf = jax.tree.map(
                lambda buf, o: jax.lax.dynamic_update_index_in_dim(
                    buf,
                    jnp.where(
                        valid,
                        o,
                        jax.lax.dynamic_index_in_dim(buf, mc, 0, keepdims=False),
                    ),
                    mc,
                    0,
                ),
                outbuf,
                out,
            )
            recv_next = jax.tree.map(
                lambda o: jax.lax.ppermute(o, axis, perm), out
            )
            return (recv_next, outbuf), None

        outbuf0 = jax.tree.map(jnp.zeros_like, xs)
        (_, outbuf), _ = jax.lax.scan(
            tick, (zeros_like_mb, outbuf0), jnp.arange(M + S - 1)
        )
        # result lives on the last stage; mask + psum replicates it over pp
        outbuf = jax.tree.map(
            lambda a: jnp.where(stage == S - 1, a, jnp.zeros_like(a)), outbuf
        )
        return jax.tree.map(partial(jax.lax.psum, axis_name=axis), outbuf)

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )
    return jax.tree.map(from_mb, fn(stacked_params, x_mb))


# ---------------------------------------------------------------------------
# CLIP text tower on the pipeline — the shipped demonstration model
# (uniform transformer layers; reference encoder loop sd1_clip.py /
# models/clip.py CLIPTextModel.apply).


def clip_pipeline_encode(
    model,
    params: dict,
    tokens: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "pp",
    num_microbatches: Optional[int] = None,
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """Run ``CLIPTextModel`` with its encoder layers pipeline-sharded.

    Embeddings and the final layer norm are tiny and stay replicated; the
    ``num_layers`` transformer blocks are grouped into ``S = mesh.shape[axis]``
    stages of ``num_layers // S`` layers each. Exact vs ``model.apply`` with
    ``clip_skip=-1`` (the full tower — early-exit clip_skip keeps the
    replicated path)."""
    from stable_renderer_tpu.models.layers import (
        attention,
        gelu_quick,
        layer_norm,
        linear,
    )

    cfg = model.config
    S = mesh.shape[axis]
    if cfg.num_layers % S:
        raise ValueError(f"{cfg.num_layers} layers not divisible into {S} stages")
    k = cfg.num_layers // S
    tm = params["text_model"]
    layer_list = [tm["encoder"]["layers"][str(i)] for i in range(cfg.num_layers)]
    # (S, k, ...) per leaf: stage axis outside, per-stage layer axis inside
    stages = [
        stack_stage_params(layer_list[s * k : (s + 1) * k]) for s in range(S)
    ]
    stacked = stack_stage_params(stages)

    vocab = tm["embeddings"]["token_embedding"]["weight"]
    x = vocab[jnp.maximum(tokens, 0)]
    pos = tm["embeddings"]["position_embedding"]["weight"][: tokens.shape[1]]
    x = x + pos[None]
    l = tokens.shape[1]
    causal = jnp.where(
        jnp.arange(l)[None, :] <= jnp.arange(l)[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)[None, None]

    def one_layer(x, lp):
        h = layer_norm(lp["layer_norm1"], x)
        q = linear(lp["self_attn"]["q_proj"], h)
        key = linear(lp["self_attn"]["k_proj"], h)
        v = linear(lp["self_attn"]["v_proj"], h)
        h = attention(q, key, v, cfg.num_heads, mask=causal)
        x = x + linear(lp["self_attn"]["out_proj"], h)
        h = layer_norm(lp["layer_norm2"], x)
        h = linear(lp["mlp"]["fc1"], h)
        h = gelu_quick(h)
        return x + linear(lp["mlp"]["fc2"], h), None

    def stage_fn(stage_params, x):
        out, _ = jax.lax.scan(
            lambda c, lp: one_layer(c, lp), x, stage_params
        )
        return out

    hidden = pipeline_apply(
        stage_fn, stacked, x, mesh,
        axis=axis, num_microbatches=num_microbatches, batch_axis=batch_axis,
    )
    return layer_norm(tm["final_layer_norm"], hidden)


# ---------------------------------------------------------------------------
# UNet middle block on the pipeline (VERDICT r4 next #5): the SDXL-class
# middle is a ResBlock -> SpatialTransformer(depth D, D=10 for SDXL,
# openaimodel.py transformer_depth_middle) -> ResBlock; the D
# BasicTransformerBlocks are UNIFORM (tokens, ctx) -> tokens stages — exactly
# the contract pipeline_apply ships. The shape-changing down/up path stays on
# dp/tp; this pipelines the deepest serial chain in the model.


def unet_middle_pipeline(
    unet,
    params: dict,
    h: jax.Array,         # (B, H, W, C) activation entering the middle block
    emb: jax.Array,       # (B, emb_dim) timestep embedding
    context: jax.Array,   # (B, L, D) text conditioning
    mesh: Mesh,
    *,
    axis: str = "pp",
    num_microbatches: Optional[int] = None,
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """Run ``params["middle_block"]`` with its transformer depth
    pipeline-sharded over ``axis``. Exact vs the sequential middle block
    (res_block -> spatial_transformer -> res_block) — asserted in
    tests/test_pipeline_parallel.py::test_unet_middle_pipeline_exact."""
    from stable_renderer_tpu.models.layers import conv2d, group_norm, linear
    from stable_renderer_tpu.models.unet import (
        AttnHooks,
        basic_transformer_block,
        res_block,
    )

    cfg = unet.config
    md = cfg.middle_depth()
    S = mesh.shape[axis]
    if md < 1 or md % S:
        raise ValueError(f"middle depth {md} not divisible into {S} stages")
    k = md // S
    mp = params["middle_block"]
    h = res_block(mp["0"], h, emb)

    p = mp["1"]
    b, hh, ww, c = h.shape
    x_in = h
    n = group_norm(p["norm"], h)
    use_conv_proj = ("w_hwio" in p["proj_in"]
                     or p["proj_in"]["weight"].ndim == 4)
    if use_conv_proj:
        n = conv2d(p["proj_in"], n).reshape(b, hh * ww, c)
    else:
        n = linear(p["proj_in"], n.reshape(b, hh * ww, c))

    blocks = [p["transformer_blocks"][str(i)] for i in range(md)]
    stages = [stack_stage_params(blocks[s * k: (s + 1) * k])
              for s in range(S)]
    stacked = stack_stage_params(stages)
    heads = cfg.heads_for(c)

    def stage_fn(stage_params, act):
        def one(carry, bp):
            tokens, ctx = carry
            out = basic_transformer_block(bp, tokens, ctx, heads, 0,
                                          AttnHooks())
            return (out, ctx), None

        out, _ = jax.lax.scan(one, act, stage_params)
        return out

    n, _ = pipeline_apply(
        stage_fn, stacked, (n, context), mesh,
        axis=axis, num_microbatches=num_microbatches, batch_axis=batch_axis,
    )
    if use_conv_proj:
        n = conv2d(p["proj_out"], n.reshape(b, hh, ww, c))
    else:
        n = linear(p["proj_out"], n).reshape(b, hh, ww, c)
    h = n + x_in
    return res_block(mp["2"], h, emb)
