"""Sampling progress + latent previews.

Capability match for the reference's progress machinery (reference:
comfy/utils.py ProgressBar + latent_preview.py latent2rgb / TAESD previews,
hijacked by the server for websocket updates, comfyUI/main.py:187-195).

``latent2rgb`` converts an SD1.5 latent to an approximate RGB preview with the
standard linear factors (latent_preview.py Latent2RGBPreviewer). ``attach`` wires
a host callback into the jitted denoise scan via ``jax.experimental.io_callback``
— per-step progress without leaving jit (only when requested; zero cost
otherwise).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

# SD1.5 latent -> RGB linear factors (latent_preview.py). Host numpy ON
# PURPOSE: this module is imported lazily from inside jitted node bodies, and
# under omnistaging a module-level jnp constant created during an active
# trace becomes a tracer that leaks into every later caller
# (UnexpectedTracerError). numpy is never staged.
SD15_LATENT_RGB = np.asarray(
    [
        [0.3512, 0.2297, 0.3227],
        [0.3250, 0.4974, 0.2350],
        [-0.2829, 0.1762, 0.2721],
        [-0.2120, -0.2616, -0.7177],
    ],
    np.float32,
)


def latent2rgb(latent: jax.Array, factors: jax.Array = SD15_LATENT_RGB) -> jax.Array:
    """(..., h, w, 4) latent -> (..., h, w, 3) approximate RGB in [0, 1]."""
    rgb = latent.astype(jnp.float32) @ factors
    return jnp.clip((rgb + 1.0) / 2.0, 0.0, 1.0)


def progress_step_callback(
    on_step: Callable,
    total_steps: int,
    preview: bool = True,
    inner: Optional[Callable] = None,
) -> Callable:
    """Build a samplers.sample step_callback that reports progress to the host.

    ``on_step(step_index, total, preview_rgb_or_None)`` runs on host per step
    (ordered io_callback). Composes with an inner callback (e.g. the
    corresponder's) — inner runs first, then the report.
    """

    def cb(x, denoised, sigma, i):
        if inner is not None:
            x = inner(x, denoised, sigma, i)
        if preview:
            rgb = latent2rgb(denoised)
            io_callback(
                lambda ii, img: on_step(int(ii), total_steps, img),
                None,
                i,
                rgb,
                ordered=True,
            )
        else:
            io_callback(
                lambda ii: on_step(int(ii), total_steps, None), None, i, ordered=True
            )
        return x

    return cb


class ConsoleProgress:
    """Minimal tqdm-style console progress sink."""

    def __init__(self, label: str = "sampling"):
        self.label = label

    def __call__(self, step: int, total: int, preview) -> None:
        import sys

        pct = int(100 * (step + 1) / max(total, 1))
        sys.stderr.write(f"\r{self.label}: {step + 1}/{total} [{pct:3d}%]")
        if step + 1 >= total:
            sys.stderr.write("\n")
        sys.stderr.flush()
