"""k-diffusion samplers as one jitted lax.scan over sigmas.

Capability match for the reference's sampler zoo + CFG driver
(reference: comfy/k_diffusion/sampling.py:129-851 sample_euler/heun/dpmpp_2m/
ddpm/lcm..., comfy/samplers.py:175-358 calc_cond_uncond_batch + sampling_function).

Architecture difference (the core TPU win): the reference steps the sampler in a
Python loop, round-tripping through the node interpreter per step (its 2-3 fps
bottleneck, SURVEY.md section 6). Here the whole denoise loop is ONE ``lax.scan``
inside one jit — model calls, CFG mix, per-step correspondence callback and all —
so N steps never leave the chip.

The ``denoise_model`` passed in has signature (x, sigma) -> denoised (x0-space),
built by ``make_denoiser`` from the raw eps-model + CFG + hooks. The per-step
``step_callback`` is the Corresponder.step_finished hook
(reference: corresponder.py:298-376) as a pure function of the scan carry:
(x, denoised, sigma, step_index) -> x.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

SAMPLER_NAMES = [
    "euler",
    "euler_ancestral",
    "heun",
    "dpmpp_2m",
    "ddim",
    "ddpm",
    "lcm",
]


def _to_d(x: jax.Array, sigma: jax.Array, denoised: jax.Array) -> jax.Array:
    return (x - denoised) / jnp.maximum(sigma, 1e-8)


def _ancestral_step(sigma_from, sigma_to, eta=1.0):
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(
            jnp.maximum(sigma_to**2 * (sigma_from**2 - sigma_to**2) / jnp.maximum(sigma_from**2, 1e-12), 0.0)
        ),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


class SampleState(NamedTuple):
    x: jax.Array
    old_denoised: jax.Array  # multistep history (dpmpp_2m); zeros otherwise
    key: jax.Array


@partial(jax.jit, static_argnames=("denoise_model", "sampler", "step_callback", "eta"))
def sample(
    denoise_model: Callable,   # (x, sigma_scalar) -> denoised
    noise: jax.Array,          # (B, h, w, C) initial noise (unit variance)
    sigmas: jax.Array,         # (steps+1,) descending, ends at 0
    latent_image: Optional[jax.Array] = None,  # img2img init latent
    sampler: str = "euler",
    key: Optional[jax.Array] = None,
    step_callback: Optional[Callable] = None,  # (x, denoised, sigma, i) -> x
    eta: float = 1.0,
) -> jax.Array:
    """Run the full denoise loop; returns the final latent.

    Noise handling matches comfy.sample.sample: x0 = latent + noise * sigma_max
    (img2img) or noise * sigma_max (txt2img with empty latent).
    """
    if sampler not in SAMPLER_NAMES:
        raise ValueError(f"Unknown sampler '{sampler}' (have {SAMPLER_NAMES})")
    if key is None:
        key = jax.random.PRNGKey(0)

    x = noise * sigmas[0]
    if latent_image is not None:
        x = x + latent_image

    n_steps = sigmas.shape[0] - 1

    def step(state: SampleState, i):
        sigma = sigmas[i]
        sigma_next = sigmas[i + 1]
        x = state.x
        key, sub = jax.random.split(state.key)
        denoised = denoise_model(x, sigma)

        if sampler == "euler" or sampler == "ddim":
            d = _to_d(x, sigma, denoised)
            x_new = x + d * (sigma_next - sigma)
        elif sampler == "euler_ancestral" or sampler == "ddpm":
            sigma_down, sigma_up = _ancestral_step(sigma, sigma_next, eta)
            d = _to_d(x, sigma, denoised)
            x_new = x + d * (sigma_down - sigma)
            x_new = x_new + jax.random.normal(sub, x.shape, x.dtype) * sigma_up
        elif sampler == "heun":
            d = _to_d(x, sigma, denoised)
            x_eul = x + d * (sigma_next - sigma)
            def heun_correct(x_eul):
                denoised2 = denoise_model(x_eul, sigma_next)
                d2 = _to_d(x_eul, sigma_next, denoised2)
                return x + 0.5 * (d + d2) * (sigma_next - sigma)
            x_new = jax.lax.cond(sigma_next > 0, heun_correct, lambda x_eul: x_eul, x_eul)
        elif sampler == "dpmpp_2m":
            t, t_next = -jnp.log(jnp.maximum(sigma, 1e-8)), -jnp.log(jnp.maximum(sigma_next, 1e-8))
            h = t_next - t
            first = i == 0
            # previous step size approximated by schedule lookup
            sigma_prev = sigmas[jnp.maximum(i - 1, 0)]
            h_last = t - (-jnp.log(jnp.maximum(sigma_prev, 1e-8)))
            r = h_last / jnp.maximum(h, 1e-8)
            denoised_d = jnp.where(
                first,
                denoised,
                (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * state.old_denoised,
            )
            x_new = (sigma_next / jnp.maximum(sigma, 1e-8)) * x - jnp.expm1(-h) * denoised_d
            x_new = jnp.where(sigma_next > 0, x_new, denoised)
        elif sampler == "lcm":
            # sample_lcm (k_diffusion/sampling.py): jump to x0, renoise
            x_new = denoised
            x_new = jnp.where(
                sigma_next > 0,
                x_new + sigma_next * jax.random.normal(sub, x.shape, x.dtype),
                x_new,
            )
        else:  # pragma: no cover
            raise AssertionError(sampler)

        if step_callback is not None:
            x_new = step_callback(x_new, denoised, sigma, i)
        return SampleState(x_new, denoised, key), None

    init = SampleState(x, jnp.zeros_like(x), key)
    final, _ = jax.lax.scan(step, init, jnp.arange(n_steps))
    return final.x
