"""One-draw pooled random init for benchmark/test pipelines.

The per-model ``init()`` functions draw every tensor from its own PRNG fold —
the layout ground truth the weight-fidelity tests pin. But jitting them builds
one unrolled threefry chain per tensor (~700 for the SD1.5 UNet): a 20 MB
executable that costs ~20 s to deserialize+load per process even on a
persistent-cache hit (PERF.md "Compile time"). For pipelines built from random
weights (DiffusionPipeline.from_random — benchmarks, tests, offline fallbacks)
the value distribution details don't matter, so this module re-creates the
exact same tree STRUCTURE from ``jax.eval_shape`` and fills it from ONE pooled
normal draw with fan-in scaling: a single threefry + cheap slices, compiling
to a ~1 MB executable that loads in ~1 s.

Rules (matching the shape semantics of models/*.init):
  * float leaves with ndim >= 2 (linear/conv/embedding weights, OpenCLIP raw
    params like ``in_proj_weight`` / ``text_projection`` / ``positional_
    embedding``) -> pool slice * 1/sqrt(fan_in)
  * 1-D ``weight`` leaves (norm scales) -> ones
  * non-float leaves -> zeros of their dtype
  * everything else (biases, scalars, mix factors) -> zeros
The distribution differs from init() in detail (e.g. 0.02-scale embeddings) —
timing-irrelevant for benchmarks, never used for parity claims.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def pooled_random_init(init_fn: Callable[[jax.Array], dict], key: jax.Array) -> dict:
    """Same tree/shapes/dtypes as ``init_fn(key)``; values from one pooled draw."""
    struct = jax.eval_shape(init_fn, key)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(struct)

    plans = []  # (kind, shape, dtype, scale, offset)
    total = 0
    for path, leaf in leaves_with_path:
        name = str(getattr(path[-1], "key", path[-1])) if path else ""
        shape, dtype = tuple(leaf.shape), leaf.dtype
        if not jnp.issubdtype(dtype, jnp.floating):
            plans.append(("zeros", shape, dtype, 0.0, 0))
        elif len(shape) >= 2:
            n = math.prod(shape)
            plans.append(
                ("pool", shape, dtype, 1.0 / math.sqrt(math.prod(shape[1:])), total)
            )
            total += n
        elif name == "weight" and len(shape) == 1:
            plans.append(("ones", shape, dtype, 0.0, 0))
        else:
            plans.append(("zeros", shape, dtype, 0.0, 0))

    def build(k: jax.Array):
        pool = jax.random.normal(k, (max(total, 1),), jnp.float32)
        out = []
        for kind, shape, dtype, scale, off in plans:
            if kind == "pool":
                n = math.prod(shape)
                out.append(
                    (jax.lax.dynamic_slice_in_dim(pool, off, n) * scale)
                    .reshape(shape).astype(dtype)
                )
            elif kind == "ones":
                out.append(jnp.ones(shape, dtype))
            else:
                out.append(jnp.zeros(shape, dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    return jax.jit(build)(key)
