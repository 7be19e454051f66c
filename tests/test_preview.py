"""Progress callback + latent preview tests."""

import jax
import jax.numpy as jnp
import numpy as np

from stable_renderer_tpu.models.sampling import ModelSampling, calculate_sigmas, sample
from stable_renderer_tpu.models.sampling.preview import (
    latent2rgb,
    progress_step_callback,
)


def test_latent2rgb_shape_range():
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    rgb = latent2rgb(z)
    assert rgb.shape == (2, 8, 8, 3)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0


def test_progress_callback_fires_each_step():
    seen = []

    def on_step(i, total, preview):
        seen.append((i, total, None if preview is None else np.asarray(preview).shape))

    target = jnp.zeros((1, 8, 8, 4))
    sigmas = jnp.asarray(calculate_sigmas(ModelSampling(), "karras", 5))
    cb = progress_step_callback(on_step, total_steps=5, preview=True)
    out = sample(lambda x, s: target, jnp.ones_like(target), sigmas,
                 sampler="euler", step_callback=cb)
    assert [s[0] for s in seen] == [0, 1, 2, 3, 4]
    assert all(s[1] == 5 for s in seen)
    assert seen[0][2] == (1, 8, 8, 3)


def test_progress_composes_with_inner_callback():
    calls = []

    def inner(x, denoised, sigma, i):
        calls.append("inner")
        return x + 1.0

    def on_step(i, total, preview):
        calls.append("report")

    sigmas = jnp.asarray(calculate_sigmas(ModelSampling(), "karras", 3))
    cb = progress_step_callback(on_step, 3, preview=False, inner=inner)
    out = sample(lambda x, s: jnp.zeros_like(x), jnp.zeros((1, 4, 4, 4)), sigmas,
                 sampler="euler", step_callback=cb)
    # inner offset applied: final x = 0 (target) + 1 per step? last step sets x=target then +1
    assert float(out.mean()) == 1.0
    assert calls.count("report") == 3
