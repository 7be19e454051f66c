"""Sharding rules: frame-DP over EngineData, head-TP over UNet params.

The reference has no distributed layer (SURVEY.md section 2.6); these rules are
the TPU-native scaling design:

  * Frame batch (EngineData leading axis) shards over 'dp' — the direct analogue
    of the reference's 8-frame bake batching, now across chips. The
    OverlapCorresponder's broadcast-KV injection becomes an implicit all_gather
    over 'dp' inserted by GSPMD (every frame attends to frame 0's K/V).
  * UNet attention/MLP weights shard over 'tp': q/k/v/ff-in column-parallel
    (output dim), to_out/ff-out row-parallel (input dim) — Megatron-style; XLA
    inserts the all_reduce after row-parallel matmuls.
  * Everything else (norms, convs, embeddings) replicates.

All functions are annotation-only: computation code stays sharding-agnostic and
GSPMD propagates.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stable_renderer_tpu.models.weights import flatten, nest

_TP_COL_SUFFIXES = (  # weight (out, in): shard out
    "attn1.to_q", "attn1.to_k", "attn1.to_v",
    "attn2.to_q", "attn2.to_k", "attn2.to_v",
    "ff.net.0.proj",
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "mlp.fc1",
)
_TP_ROW_SUFFIXES = (  # weight (out, in): shard in
    "attn1.to_out.0", "attn2.to_out.0",
    "ff.net.2",
    "self_attn.out_proj",
    "mlp.fc2",
)


def unet_param_specs(params: dict, tp_axis: str = "tp") -> dict:
    """PartitionSpec tree for a UNet/CLIP param tree (Megatron-style head TP)."""
    flat = flatten(params)
    specs = {}
    for path, value in flat.items():
        spec = P()
        if path.endswith(".weight") and getattr(value, "ndim", 0) == 2:
            base = path[: -len(".weight")]
            if base.endswith(_TP_COL_SUFFIXES):
                spec = P(tp_axis, None)
            elif base.endswith(_TP_ROW_SUFFIXES):
                spec = P(None, tp_axis)
        elif path.endswith(".bias"):
            base = path[: -len(".bias")]
            if base.endswith(_TP_COL_SUFFIXES):
                spec = P(tp_axis)
        specs[path] = spec
    return nest(specs, "")


def apply_param_sharding(params: dict, mesh: Mesh, tp_axis: str = "tp") -> dict:
    """device_put the param tree with TP specs over the mesh."""
    specs = unet_param_specs(params, tp_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate(tree: dict, mesh: Mesh) -> dict:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def shard_engine_data(engine_data, mesh: Mesh, axis: str = "dp"):
    """Shard every array leaf of an EngineData on its leading (frame) axis."""
    def put(x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    import dataclasses

    kwargs = {}
    for f in dataclasses.fields(engine_data):
        v = getattr(engine_data, f.name)
        if f.metadata.get("static"):
            kwargs[f.name] = v
        else:
            kwargs[f.name] = put(v) if v is not None else None
    return type(engine_data)(**kwargs)


def frame_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
