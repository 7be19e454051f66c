"""Sampler/schedule tests vs reference semantics (comfy/samplers.py,
comfy/k_diffusion/sampling.py, comfy/model_sampling.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_renderer_tpu.models import AttnHooks, TINY_UNET_CONFIG, UNetModel
from stable_renderer_tpu.models.sampling import ModelSampling, calculate_sigmas, sample
from stable_renderer_tpu.models.sampling.cfg import (
    calculate_denoised,
    make_denoiser,
    timestep_from_sigma,
)


@pytest.fixture(scope="module")
def ms():
    return ModelSampling()


def test_sd15_sigma_range(ms):
    # SD1.5 schedule endpoints (known values from ModelSamplingDiscrete)
    assert ms.sigma_min == pytest.approx(0.0292, abs=1e-3)
    assert ms.sigma_max == pytest.approx(14.61, abs=0.05)


def test_timestep_sigma_roundtrip(ms):
    for t in [0.0, 100.0, 500.0, 999.0]:
        sigma = ms.sigma(np.asarray(t))
        t2 = ms.timestep(np.asarray(sigma))
        assert t2 == pytest.approx(t, abs=0.51)
    # jittable version agrees
    ls = jnp.asarray(ms.log_sigmas)
    t3 = float(timestep_from_sigma(ls, jnp.asarray(float(ms.sigma(np.asarray(500.0))))))
    assert t3 == pytest.approx(500.0, abs=0.51)


@pytest.mark.parametrize(
    "sched", ["normal", "karras", "exponential", "sgm_uniform", "simple", "ddim_uniform"]
)
def test_schedules_descending_end_zero(ms, sched):
    sig = calculate_sigmas(ms, sched, 10)
    assert sig.shape == (11,)
    assert sig[-1] == 0.0
    assert (np.diff(sig) < 0).all()
    assert sig[0] <= ms.sigma_max * 1.001


def test_denoise_truncation(ms):
    full = calculate_sigmas(ms, "normal", 20)
    part = calculate_sigmas(ms, "normal", 10, denoise=0.5)
    assert part.shape == (11,)
    np.testing.assert_allclose(part, full[-11:], rtol=1e-5)
    assert part[0] < full[0]  # starts from mid-noise (img2img)


def test_calculate_denoised_eps():
    x = jnp.ones((1, 2, 2, 4)) * 3.0
    eps = jnp.ones_like(x) * 0.5
    out = calculate_denoised("eps", x, eps, jnp.asarray(2.0), jnp.asarray(500.0))
    np.testing.assert_allclose(np.asarray(out), 3.0 - 0.5 * 2.0)


def test_calculate_denoised_lcm_boundary():
    # at timestep ~0 LCM output ~= x0 (c_out -> 0 means c_skip -> 1? verify shape)
    x = jnp.ones((1, 2, 2, 4))
    eps = jnp.zeros_like(x)
    out_t0 = calculate_denoised("lcm", x, eps, jnp.asarray(0.01), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out_t0), 1.0, atol=1e-3)


@pytest.mark.parametrize("sampler", ["euler", "euler_ancestral", "heun", "dpmpp_2m", "lcm", "ddpm"])
def test_samplers_converge_to_target(sampler):
    """With the oracle denoiser D(x, sigma) = target, every sampler must land on
    (or near) the target after the loop."""
    target = jnp.full((1, 4, 4, 4), 0.7)

    def oracle(x, sigma):
        return target

    sigmas = jnp.asarray(calculate_sigmas(ModelSampling(), "karras", 12))
    noise = jax.random.normal(jax.random.PRNGKey(0), target.shape)
    out = sample(oracle, noise, sigmas, sampler=sampler, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=0.05)


def test_img2img_latent_offsets_start():
    init = jnp.full((1, 4, 4, 4), 2.0)

    def oracle(x, sigma):
        return x  # identity: x never changes from its start

    sigmas = jnp.asarray([1.0, 0.5, 0.0], jnp.float32)
    noise = jnp.zeros_like(init)
    out = sample(oracle, noise, sigmas, latent_image=init, sampler="euler")
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_step_callback_runs_per_step():
    target = jnp.zeros((1, 2, 2, 4))

    def oracle(x, sigma):
        return target

    marks = jnp.zeros((5,))

    def cb(x, denoised, sigma, i):
        return x + 1.0  # visible offset per step

    sigmas = jnp.asarray(calculate_sigmas(ModelSampling(), "karras", 5))
    out = sample(oracle, jnp.zeros_like(target), sigmas, sampler="euler", step_callback=cb)
    # euler with oracle: after final step x = target (=0) then +1 from callback
    assert float(out.mean()) == pytest.approx(1.0, abs=1e-5)


def test_cfg_denoiser_with_tiny_unet():
    unet = UNetModel(TINY_UNET_CONFIG)
    params = unet.init(jax.random.PRNGKey(0))
    ms = ModelSampling()
    cond = jnp.ones((1, 77, TINY_UNET_CONFIG.context_dim)) * 0.1
    uncond = jnp.zeros((1, 77, TINY_UNET_CONFIG.context_dim))
    den = make_denoiser(
        unet, params, cond, uncond, jnp.asarray(ms.log_sigmas), cfg_scale=3.0
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    out = jax.jit(den)(x, jnp.asarray(5.0))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # cfg=1-equivalent no-uncond path
    den1 = make_denoiser(unet, params, cond, None, jnp.asarray(ms.log_sigmas))
    out1 = den1(x, jnp.asarray(5.0))
    assert out1.shape == x.shape


def test_cfg_hooks_positive_rows_and_kv_broadcast():
    unet = UNetModel(TINY_UNET_CONFIG)
    params = unet.init(jax.random.PRNGKey(0))
    ms = ModelSampling()
    b = 2
    cond = jnp.ones((b, 77, TINY_UNET_CONFIG.context_dim)) * 0.1
    uncond = jnp.zeros((b, 77, TINY_UNET_CONFIG.context_dim))
    calls = []

    def pre(q, k, v, layer):
        # OverlapCorresponder-style: broadcast frame 0's K/V to all frames
        calls.append(("pre", int(q.shape[0])))
        k0 = jnp.broadcast_to(k[:1], k.shape)
        v0 = jnp.broadcast_to(v[:1], v.shape)
        return q, k0, v0

    def post(vals, layer):
        calls.append(("post", int(vals.shape[0])))
        return vals

    den = make_denoiser(
        unet, params, cond, uncond, jnp.asarray(ms.log_sigmas),
        cfg_scale=2.0, hooks=AttnHooks(pre=pre, post=post),
    )
    x = jnp.ones((b, 16, 16, 4)) * 0.2
    out = den(x, jnp.asarray(3.0))  # eager trace to observe hook shapes
    assert out.shape == x.shape
    # hooks see only the positive half (batch b), not 2b
    assert all(n == b for _, n in calls)
    assert any(tag == "pre" for tag, _ in calls) and any(tag == "post" for tag, _ in calls)
