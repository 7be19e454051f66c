"""Device-mesh construction.

The reference is single-process single-GPU with no distributed layer at all
(SURVEY.md section 2.6); scaling here is green-field TPU-native:
``jax.sharding.Mesh`` over the chip grid, with axes

    dp — data parallel over the frame batch (the direct analogue of the
         reference's frame batching, baking_interval=8 frames per submit)
    tp — tensor parallel over attention heads / MLP of the UNet

Collectives are emitted by XLA GSPMD from sharding annotations; nothing here
wraps NCCL-style primitives.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh_shape(n_devices: int, prefer_tp: int = 1) -> Dict[str, int]:
    """Split n devices into dp x tp; tp only when it divides evenly."""
    tp = prefer_tp if prefer_tp > 1 and n_devices % prefer_tp == 0 else 1
    return {"dp": n_devices // tp, "tp": tp}


def create_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices=None,
) -> Mesh:
    """Create a Mesh with named axes from a {axis: size} dict (insertion order =
    mesh dims). Defaults to all local devices on a ('dp', 'tp') grid."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = default_mesh_shape(len(devices))
    total = int(np.prod(list(shape.values())))
    if total != len(devices):
        raise ValueError(f"mesh shape {shape} does not cover {len(devices)} devices")
    grid = np.asarray(devices).reshape(tuple(shape.values()))
    return Mesh(grid, tuple(shape.keys()))
