"""k-diffusion samplers as one jitted lax.scan over sigmas.

Capability match for the reference's sampler zoo + CFG driver
(reference: comfy/k_diffusion/sampling.py:129-851 — euler :129, euler_ancestral
:160, heun :175, dpm_2 :203, dpm_2_ancestral :235, lms :278, dpmpp_2s_ancestral
:507, dpmpp_sde :563, dpmpp_2m :633, dpmpp_2m_sde :663, dpmpp_3m_sde :680,
heunpp2 :797, ddpm/lcm; comfy/extra_samplers/uni_pc.py:580-877 UniPC bh1/bh2;
comfy/samplers.py:175-358 calc_cond_uncond_batch + sampling_function).

Architecture difference (the core TPU win): the reference steps the sampler in a
Python loop, round-tripping through the node interpreter per step (its 2-3 fps
bottleneck, SURVEY.md section 6). Here the whole denoise loop is ONE ``lax.scan``
inside one jit — model calls, CFG mix, per-step correspondence callback and all —
so N steps never leave the chip. Second-order model evaluations (heun/dpm_2/...)
sit behind ``lax.cond`` so only the taken branch executes at runtime.

Deviations from the reference, by design:
- SDE samplers default to ``sde_noise="brownian"``: a deterministic Brownian
  bridge over the sigma range (``brownian_increment``) reproducing the
  BrownianTreeNoiseSampler semantics (k_diffusion/sampling.py:110-140,
  torchsde BrownianTree) — noise over an interval is a consistent function of
  the interval, so overlapping queries across different step grids correlate.
  torchsde's lazy tree is replaced by a fixed-depth dyadic bisection (traced,
  scan-compatible, no recompile); ``sde_noise="iid"`` gives per-step gaussians.
- s_churn/s_tmin/s_tmax are not exposed (comfy always calls with churn 0).
- LMS integrates the Lagrange basis polynomials in closed form on-device
  (degree <= 3) instead of scipy.integrate.quad host calls.

The ``denoise_model`` passed in has signature (x, sigma) -> denoised (x0-space),
built by ``make_denoiser`` from the raw eps-model + CFG + hooks. The per-step
``step_callback`` is the Corresponder.step_finished hook
(reference: corresponder.py:298-376) as a pure function of the scan carry:
(x, denoised, sigma, step_index) -> x.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

SAMPLER_NAMES = [
    "euler",
    "euler_ancestral",
    "heun",
    "heunpp2",
    "dpm_2",
    "dpm_2_ancestral",
    "lms",
    "dpmpp_2s_ancestral",
    "dpmpp_sde",
    "dpmpp_2m",
    "dpmpp_2m_sde",
    "dpmpp_3m_sde",
    "ddim",
    "ddpm",
    "lcm",
    "dpm_fast",
    "dpm_adaptive",
    "uni_pc",
    "uni_pc_bh2",
]

# samplers that share one generic scan body (everything but UniPC)
_KDIFF_SAMPLERS = [n for n in SAMPLER_NAMES if not n.startswith("uni_pc")]


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


def _log(s):
    return jnp.log(jnp.maximum(s, 1e-10))


def brownian_increment(
    root_key: jax.Array,
    s_from: jax.Array,   # scalar sigma (interval start)
    s_to: jax.Array,     # scalar sigma (interval end)
    t_lo: jax.Array,     # global sigma range of the motion
    t_hi: jax.Array,
    shape: tuple,
    dtype,
    depth: int = 26,
) -> jax.Array:
    """Unit-variance Brownian noise for the sigma interval [s_from, s_to].

    Returns (W(s_to) - W(s_from)) / sqrt(|s_to - s_from|) where W is a
    DETERMINISTIC Brownian motion on [t_lo, t_hi] keyed by ``root_key``
    (k_diffusion BrownianTreeNoiseSampler semantics, sampling.py:110-140;
    identity sigma transform). W(t) is built by dyadic Brownian-bridge
    bisection to ``depth`` levels: each bridge midpoint draws from
    ``fold_in(root_key, heap_index)``, so any t maps to the same value on
    every query — re-querying overlapping intervals (different step counts,
    restart samplers) yields correlated noise, unlike i.i.d. draws. The
    dyadic snap error is 2^-depth of the range (irrelevant at depth 26).
    """
    span = jnp.maximum(t_hi - t_lo, 1e-12)

    def W(t):
        u = jnp.clip((t - t_lo) / span, 0.0, 1.0)
        wa = jnp.zeros(shape, jnp.float32)
        wb = jax.random.normal(
            jax.random.fold_in(root_key, 1), shape, jnp.float32
        ) * jnp.sqrt(span)

        def body(_l, st):
            wa, wb, lo, hi, heap = st
            mid = 0.5 * (lo + hi)
            zm = jax.random.normal(
                jax.random.fold_in(root_key, heap), shape, jnp.float32
            )
            # bridge midpoint: mean of endpoints + N(0, len/4), len in sigma units
            wm = 0.5 * (wa + wb) + zm * (0.5 * jnp.sqrt((hi - lo) * span))
            right = u >= mid
            return (
                jnp.where(right, wm, wa),
                jnp.where(right, wb, wm),
                jnp.where(right, mid, lo),
                jnp.where(right, hi, mid),
                heap * 2 + right.astype(jnp.uint32),
            )

        wa, wb, lo, hi, _ = jax.lax.fori_loop(
            0, depth, body,
            (wa, wb, jnp.zeros(()), jnp.ones(()), jnp.uint32(2)),
        )
        frac = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)
        return wa + (wb - wa) * frac

    inc = W(s_to) - W(s_from)
    return (inc / jnp.sqrt(jnp.maximum(jnp.abs(s_to - s_from), 1e-12))).astype(dtype)


def _lms_coeffs(sigmas: jax.Array, i: jax.Array, cur_order: jax.Array, max_order: int = 4):
    """Exact linear-multistep coefficients (k_diffusion sampling.py:265-276).

    The basis polynomial prod_{k != j} (tau - t_{i-k}) / (t_{i-j} - t_{i-k}) has
    degree <= max_order-1, so its integral over [t_i, t_{i+1}] is closed-form;
    the reference shells out to scipy.integrate.quad instead. Returns
    (max_order,) coeffs, zero for j >= cur_order.
    """
    n = sigmas.shape[0]
    # roots t_{i-k}, k = 0..max_order-1 (clamped; masked out below)
    idx = jnp.clip(i - jnp.arange(max_order), 0, n - 1)
    t = sigmas[idx]  # (max_order,)
    t_i = sigmas[i]
    t_ip1 = sigmas[jnp.minimum(i + 1, n - 1)]

    def coeff_j(j):
        # polynomial coefficients (c0 + c1 tau + c2 tau^2 + c3 tau^3), start = 1
        poly = jnp.zeros((max_order,)).at[0].set(1.0)

        def apply_factor(k, poly):
            # multiply by (tau - t_k) / (t_j - t_k) when k != j and k < cur_order
            root = t[k]
            denom = t[j] - t[k]
            shifted = jnp.concatenate([jnp.zeros((1,)), poly[:-1]])  # * tau
            newp = (shifted - root * poly) / jnp.where(jnp.abs(denom) > 0, denom, 1.0)
            use = jnp.logical_and(k != j, k < cur_order)
            return jnp.where(use, newp, poly)

        poly = jax.lax.fori_loop(0, max_order, apply_factor, poly)
        # integrate: sum_m poly[m] * (t_ip1^(m+1) - t_i^(m+1)) / (m+1)
        m = jnp.arange(max_order)
        integral = jnp.sum(poly * (t_ip1 ** (m + 1) - t_i ** (m + 1)) / (m + 1))
        return jnp.where(j < cur_order, integral, 0.0)

    return jax.vmap(coeff_j)(jnp.arange(max_order))


@partial(jax.jit, static_argnames=("denoise_model", "sampler", "step_callback", "eta", "sde_noise"))
def sample(
    denoise_model: Callable,   # (x, sigma_scalar) -> denoised
    noise: jax.Array,          # (B, h, w, C) initial noise (unit variance)
    sigmas: jax.Array,         # (steps+1,) descending, ends at 0
    latent_image: Optional[jax.Array] = None,  # img2img init latent
    sampler: str = "euler",
    key: Optional[jax.Array] = None,
    step_callback: Optional[Callable] = None,  # (x, denoised, sigma, i) -> x
    eta: float = 1.0,
    sde_noise: str = "brownian",  # SDE samplers: "brownian" (reference
    # BrownianTree parity) | "iid" (per-step gaussians)
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

    if sampler.startswith("uni_pc"):
        variant = "bh2" if sampler == "uni_pc_bh2" else "bh1"
        return _sample_unipc(denoise_model, x, sigmas, step_callback, variant)
    if sampler == "dpm_fast":
        return _sample_dpm_fast(denoise_model, x, sigmas, step_callback)
    if sampler == "dpm_adaptive":
        return _sample_dpm_adaptive(denoise_model, x, sigmas, step_callback)

    n_steps = sigmas.shape[0] - 1

    # Brownian-tree SDE noise: one deterministic motion over the sigma range
    # per run (root key derived once from the run key, matching the
    # reference's one tree per sample() call; k_diffusion sampling.py:563+).
    # Statically gated on the sampler so non-SDE programs trace byte-identically
    # (keeps their persistent-compile-cache keys stable).
    use_brownian = sde_noise == "brownian" and sampler.endswith("sde")
    if use_brownian:
        bt_root = jax.random.fold_in(key, 0x42B)
        bt_hi = sigmas[0]
        bt_lo = sigmas[jnp.maximum(sigmas.shape[0] - 2, 0)]  # smallest positive

    zero_noise = sde_noise == "zero"

    def _sde_noise(s_from, s_to, fallback_key, x):
        if zero_noise:
            return jnp.zeros_like(x)
        if not use_brownian:
            return jax.random.normal(fallback_key, x.shape, x.dtype)
        return brownian_increment(
            bt_root, s_from, s_to, bt_lo, bt_hi, x.shape, x.dtype
        )

    def _step_noise(k, x):
        """Per-step gaussian for ancestral/ddpm/lcm renoising; ``sde_noise=
        'zero'`` statically silences it (deterministic replay / parity)."""
        if zero_noise:
            return jnp.zeros_like(x)
        return jax.random.normal(k, x.shape, x.dtype)

    def step(state: dict, i):
        sigma = sigmas[i]
        sigma_next = sigmas[i + 1]
        x = state["x"]
        key, sub = jax.random.split(state["key"])
        denoised = denoise_model(x, sigma)
        new = dict(state, key=key)

        if sampler == "euler" or sampler == "ddim":
            d = _to_d(x, sigma, denoised)
            x_new = x + d * (sigma_next - sigma)

        elif sampler == "euler_ancestral" or sampler == "ddpm":
            sigma_down, sigma_up = _ancestral_step(sigma, sigma_next, eta)
            d = _to_d(x, sigma, denoised)
            x_new = x + d * (sigma_down - sigma)
            x_new = x_new + _step_noise(sub, x) * sigma_up

        elif sampler == "heun":
            d = _to_d(x, sigma, denoised)
            x_eul = x + d * (sigma_next - sigma)

            def heun_correct(x_eul):
                denoised2 = denoise_model(x_eul, sigma_next)
                d2 = _to_d(x_eul, sigma_next, denoised2)
                return x + 0.5 * (d + d2) * (sigma_next - sigma)

            x_new = jax.lax.cond(sigma_next > 0, heun_correct, lambda x_eul: x_eul, x_eul)

        elif sampler == "heunpp2":
            # three regimes by distance from the end (sampling.py:797-851)
            d = _to_d(x, sigma, denoised)
            dt = sigma_next - sigma
            sigma_nn = sigmas[jnp.minimum(i + 2, n_steps)]

            def euler_br(_):
                return x + d * dt

            def heun_br(_):
                x_2 = x + d * dt
                denoised_2 = denoise_model(x_2, sigma_next)
                d_2 = _to_d(x_2, sigma_next, denoised_2)
                w = 2 * sigmas[0]
                w2 = sigma_next / w
                return x + (d * (1 - w2) + d_2 * w2) * dt

            def heunpp_br(_):
                x_2 = x + d * dt
                denoised_2 = denoise_model(x_2, sigma_next)
                d_2 = _to_d(x_2, sigma_next, denoised_2)
                dt_2 = sigma_nn - sigma_next
                x_3 = x_2 + d_2 * dt_2
                denoised_3 = denoise_model(x_3, sigma_nn)
                d_3 = _to_d(x_3, sigma_nn, denoised_3)
                w = 3 * sigmas[0]
                w2 = sigma_next / w
                w3 = sigma_nn / w
                return x + (d * (1 - w2 - w3) + d_2 * w2 + d_3 * w3) * dt

            s_end = sigmas[n_steps]
            branch = jnp.where(
                sigma_next == s_end, 0, jnp.where(sigma_nn == s_end, 1, 2)
            )
            x_new = jax.lax.switch(branch, [euler_br, heun_br, heunpp_br], None)

        elif sampler == "dpm_2":
            d = _to_d(x, sigma, denoised)

            def euler_br(_):
                return x + d * (sigma_next - sigma)

            def solver2_br(_):
                sigma_mid = jnp.exp(0.5 * (_log(sigma) + _log(sigma_next)))
                x_2 = x + d * (sigma_mid - sigma)
                denoised_2 = denoise_model(x_2, sigma_mid)
                d_2 = _to_d(x_2, sigma_mid, denoised_2)
                return x + d_2 * (sigma_next - sigma)

            x_new = jax.lax.cond(sigma_next > 0, solver2_br, euler_br, None)

        elif sampler == "dpm_2_ancestral":
            sigma_down, sigma_up = _ancestral_step(sigma, sigma_next, eta)
            d = _to_d(x, sigma, denoised)

            def euler_br(_):
                return x + d * (sigma_down - sigma)

            def solver2_br(_):
                sigma_mid = jnp.exp(0.5 * (_log(sigma) + _log(sigma_down)))
                x_2 = x + d * (sigma_mid - sigma)
                denoised_2 = denoise_model(x_2, sigma_mid)
                d_2 = _to_d(x_2, sigma_mid, denoised_2)
                x_o = x + d_2 * (sigma_down - sigma)
                return x_o + _step_noise(sub, x) * sigma_up

            x_new = jax.lax.cond(sigma_down > 0, solver2_br, euler_br, None)

        elif sampler == "lms":
            d = _to_d(x, sigma, denoised)
            # rolling history: d_hist[k] = d at step i-k (k=0 newest)
            d_hist = jnp.roll(state["d_hist"], 1, axis=0).at[0].set(d)
            cur_order = jnp.minimum(i + 1, 4)
            coeffs = _lms_coeffs(sigmas, i, cur_order)  # (4,)
            x_new = x + jnp.einsum("k,k...->...", coeffs, d_hist)
            new["d_hist"] = d_hist

        elif sampler == "dpmpp_2s_ancestral":
            sigma_down, sigma_up = _ancestral_step(sigma, sigma_next, eta)

            def euler_br(_):
                d = _to_d(x, sigma, denoised)
                return x + d * (sigma_down - sigma)

            def solver_br(_):
                t, t_next = -_log(sigma), -_log(sigma_down)
                h = t_next - t
                s = t + 0.5 * h
                x_2 = (jnp.exp(-s) / jnp.exp(-t)) * x - jnp.expm1(-h * 0.5) * denoised
                denoised_2 = denoise_model(x_2, jnp.exp(-s))
                x_o = (jnp.exp(-t_next) / jnp.exp(-t)) * x - jnp.expm1(-h) * denoised_2
                return x_o + _step_noise(sub, x) * sigma_up

            x_new = jax.lax.cond(sigma_down > 0, solver_br, euler_br, None)

        elif sampler == "dpmpp_sde":
            sub2 = jax.random.fold_in(sub, 1)

            def euler_br(_):
                d = _to_d(x, sigma, denoised)
                return x + d * (sigma_next - sigma)

            def solver_br(_):
                r = 0.5
                t, t_next = -_log(sigma), -_log(sigma_next)
                h = t_next - t
                s = t + h * r
                fac = 1 / (2 * r)
                # step 1
                sd, su = _ancestral_step(jnp.exp(-t), jnp.exp(-s), eta)
                s_ = -_log(sd)
                x_2 = (jnp.exp(-s_) / jnp.exp(-t)) * x - jnp.expm1(t - s_) * denoised
                x_2 = x_2 + _sde_noise(sigma, jnp.exp(-s), sub, x) * su
                denoised_2 = denoise_model(x_2, jnp.exp(-s))
                # step 2
                sd2, su2 = _ancestral_step(jnp.exp(-t), jnp.exp(-t_next), eta)
                t_next_ = -_log(sd2)
                denoised_d = (1 - fac) * denoised + fac * denoised_2
                x_o = (jnp.exp(-t_next_) / jnp.exp(-t)) * x - jnp.expm1(t - t_next_) * denoised_d
                return x_o + _sde_noise(sigma, sigma_next, sub2, x) * su2

            x_new = jax.lax.cond(sigma_next > 0, solver_br, euler_br, None)

        elif sampler == "dpmpp_2m":
            t, t_next = -_log(sigma), -_log(sigma_next)
            h = t_next - t
            first = i == 0
            sigma_prev = sigmas[jnp.maximum(i - 1, 0)]
            h_last = t - (-_log(sigma_prev))
            r = h_last / jnp.maximum(h, 1e-8)
            denoised_d = jnp.where(
                first,
                denoised,
                (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * state["old_denoised"],
            )
            x_new = (sigma_next / jnp.maximum(sigma, 1e-8)) * x - jnp.expm1(-h) * denoised_d
            x_new = jnp.where(sigma_next > 0, x_new, denoised)
            new["old_denoised"] = denoised

        elif sampler == "dpmpp_2m_sde":
            # midpoint solver_type (comfy default), sampling.py:663-719
            t, s = _log(sigma) * -1.0, _log(sigma_next) * -1.0
            h = s - t
            eta_h = eta * h
            x_sde = (sigma_next / jnp.maximum(sigma, 1e-8)) * jnp.exp(-eta_h) * x \
                + (-jnp.expm1(-h - eta_h)) * denoised
            have_old = i > 0
            r = state["h_last"] / jnp.maximum(h, 1e-8)
            mid = 0.5 * (-jnp.expm1(-h - eta_h)) * (1 / jnp.maximum(r, 1e-8)) * (
                denoised - state["old_denoised"]
            )
            x_sde = x_sde + jnp.where(have_old, mid, jnp.zeros_like(mid))
            if eta:
                noise_amt = sigma_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * eta_h), 0.0))
                x_sde = x_sde + _sde_noise(sigma, sigma_next, sub, x) * noise_amt
            x_new = jnp.where(sigma_next > 0, x_sde, denoised)
            new["old_denoised"] = denoised
            new["h_last"] = h

        elif sampler == "dpmpp_3m_sde":
            t, s = -_log(sigma), -_log(sigma_next)
            h = s - t
            h_eta = h * (eta + 1)
            x_sde = jnp.exp(-h_eta) * x + (-jnp.expm1(-h_eta)) * denoised
            phi_2 = jnp.expm1(-h_eta) / h_eta + 1
            phi_3 = phi_2 / h_eta - 0.5
            # two-history correction (order ramps 1 -> 2 -> 3)
            r0 = state["h_1"] / jnp.maximum(h, 1e-8)
            r1 = state["h_2"] / jnp.maximum(h, 1e-8)
            d1_0 = (denoised - state["den_1"]) / jnp.maximum(r0, 1e-8)
            d1_1 = (state["den_1"] - state["den_2"]) / jnp.maximum(r1, 1e-8)
            d1 = d1_0 + (d1_0 - d1_1) * r0 / jnp.maximum(r0 + r1, 1e-8)
            d2 = (d1_0 - d1_1) / jnp.maximum(r0 + r1, 1e-8)
            corr3 = phi_2 * d1 - phi_3 * d2
            corr2 = phi_2 * d1_0
            x_sde = x_sde + jnp.where(
                i >= 2, corr3, jnp.where(i >= 1, corr2, jnp.zeros_like(corr2))
            )
            if eta:
                noise_amt = sigma_next * jnp.sqrt(jnp.maximum(-jnp.expm1(-2 * h * eta), 0.0))
                x_sde = x_sde + _sde_noise(sigma, sigma_next, sub, x) * noise_amt
            x_new = jnp.where(sigma_next > 0, x_sde, denoised)
            new["den_2"] = state["den_1"]
            new["den_1"] = denoised
            new["h_2"] = state["h_1"]
            new["h_1"] = h

        elif sampler == "lcm":
            # sample_lcm (k_diffusion/sampling.py): jump to x0, renoise
            x_new = denoised
            x_new = jnp.where(
                sigma_next > 0,
                x_new + sigma_next * _step_noise(sub, x),
                x_new,
            )
        else:  # pragma: no cover
            raise AssertionError(sampler)

        if step_callback is not None:
            x_new = step_callback(x_new, denoised, sigma, i)
        new["x"] = x_new
        return new, None

    init = {"x": x, "key": key}
    if sampler == "dpmpp_2m":
        init["old_denoised"] = jnp.zeros_like(x)
    elif sampler == "dpmpp_2m_sde":
        init["old_denoised"] = jnp.zeros_like(x)
        init["h_last"] = jnp.zeros(())
    elif sampler == "dpmpp_3m_sde":
        init["den_1"] = jnp.zeros_like(x)
        init["den_2"] = jnp.zeros_like(x)
        init["h_1"] = jnp.zeros(())
        init["h_2"] = jnp.zeros(())
    elif sampler == "lms":
        init["d_hist"] = jnp.zeros((4,) + x.shape, x.dtype)

    final, _ = jax.lax.scan(step, init, jnp.arange(n_steps))
    return final["x"]


# ---------------------------------------------------------------------------
# DPM-Solver fast / adaptive (reference comfy/k_diffusion/sampling.py:327-534
# DPMSolver.dpm_solver_fast / dpm_solver_adaptive; comfy/samplers.py:692-694).
# Works in t = -log(sigma) space; eps(x, t) = (x - denoise(x, sigma)) / sigma.
# dpm_fast segments the run into static order-3/2/1 steps (unrolled — the
# order pattern depends only on the static step count); dpm_adaptive is a
# bounded lax.while_loop with the reference's PID step-size controller
# (order 3, rtol 0.05, atol 0.0078), deterministic (eta = 0).
# ---------------------------------------------------------------------------


def _dpm_eps(denoise_model, x, t):
    sigma = jnp.exp(-t)
    return (x - denoise_model(x, sigma)) / sigma


def _dpm_1_step(denoise_model, x, t, t_next, eps):
    h = t_next - t
    return x - jnp.exp(-t_next) * jnp.expm1(h) * eps


def _dpm_2_step(denoise_model, x, t, t_next, eps, r1=0.5, eps_r1=None):
    h = t_next - t
    s1 = t + r1 * h
    if eps_r1 is None:
        u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = _dpm_eps(denoise_model, u1, s1)
    x_2 = (x - jnp.exp(-t_next) * jnp.expm1(h) * eps
           - jnp.exp(-t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps))
    return x_2, eps_r1


def _dpm_3_step(denoise_model, x, t, t_next, eps, r1=1.0 / 3, r2=2.0 / 3,
                eps_r1=None):
    h = t_next - t
    s1, s2 = t + r1 * h, t + r2 * h
    if eps_r1 is None:
        u1 = x - jnp.exp(-s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = _dpm_eps(denoise_model, u1, s1)
    u2 = (x - jnp.exp(-s2) * jnp.expm1(r2 * h) * eps
          - jnp.exp(-s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1.0)
          * (eps_r1 - eps))
    eps_r2 = _dpm_eps(denoise_model, u2, s2)
    x_3 = (x - jnp.exp(-t_next) * jnp.expm1(h) * eps
           - jnp.exp(-t_next) / r2 * (jnp.expm1(h) / h - 1.0) * (eps_r2 - eps))
    return x_3


def _sample_dpm_fast(denoise_model, x, sigmas, step_callback):
    """sample_dpm_fast: nfe model evals split into order-3 segments."""
    import math

    nfe = int(sigmas.shape[0]) - 1
    sigma_max = sigmas[0]
    sigma_min = sigmas[-2]  # last nonzero sigma (schedule ends at 0)
    t_start = -_log(sigma_max)
    t_end = -_log(sigma_min)
    m = math.floor(nfe / 3) + 1
    ts = jnp.linspace(0.0, 1.0, m + 1) * (t_end - t_start) + t_start
    if nfe % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [nfe % 3]
    for i, order in enumerate(orders):
        t, t_next = ts[i], ts[i + 1]
        eps = _dpm_eps(denoise_model, x, t)
        denoised = x - jnp.exp(-t) * eps
        if order == 1:
            x_new = _dpm_1_step(denoise_model, x, t, t_next, eps)
        elif order == 2:
            x_new, _ = _dpm_2_step(denoise_model, x, t, t_next, eps)
        else:
            x_new = _dpm_3_step(denoise_model, x, t, t_next, eps)
        if step_callback is not None:
            x_new = step_callback(x_new, denoised, jnp.exp(-t), i)
        x = x_new
    return x


def _sample_dpm_adaptive(denoise_model, x, sigmas, step_callback,
                         rtol: float = 0.05, atol: float = 0.0078,
                         h_init: float = 0.05, accept_safety: float = 0.81,
                         max_iters: int = 64):
    """dpm_solver_adaptive (order 3): embedded 2/3 pair + PID control, as a
    bounded lax.while_loop (the reference's unbounded Python while)."""
    sigma_max = sigmas[0]
    sigma_min = sigmas[-2]
    t_start = -_log(sigma_max)
    t_end = -_log(sigma_min)
    numel = float(np_prod(x.shape))

    def cond(state):
        return jnp.logical_and(state["s"] < t_end - 1e-5,
                               state["iters"] < max_iters)

    def body(state):
        x_cur, x_prev, s, h = state["x"], state["x_prev"], state["s"], state["h"]
        t = jnp.minimum(t_end, s + h)
        eps = _dpm_eps(denoise_model, x_cur, s)
        denoised = x_cur - jnp.exp(-s) * eps
        # embedded pair sharing eps evaluations: low = order 2 (r1=1/3),
        # high = order 3 (reuses eps_r1 at s + h/3)
        x_low, eps_r1 = _dpm_2_step(denoise_model, x_cur, s, t, eps, r1=1.0 / 3)
        x_high = _dpm_3_step(denoise_model, x_cur, s, t, eps, eps_r1=eps_r1)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low), jnp.abs(x_prev)))
        error = jnp.sqrt(jnp.mean(((x_low - x_high) / delta) ** 2))
        # PID controller with pcoeff=0, icoeff=1, dcoeff=0, order=3
        inv_err = 1.0 / (error + 1e-8)
        factor = 1.0 + jnp.arctan(inv_err ** (1.0 / 3.0) - 1.0)
        accept = factor >= accept_safety
        x_acc = x_high
        if step_callback is not None:
            x_acc = step_callback(x_acc, denoised, jnp.exp(-s), state["iters"])
        new_x = jnp.where(accept, x_acc, x_cur)
        new_prev = jnp.where(accept, x_low, x_prev)
        new_s = jnp.where(accept, t, s)
        return dict(x=new_x, x_prev=new_prev, s=new_s, h=h * factor,
                    iters=state["iters"] + 1)

    init = dict(x=x, x_prev=x, s=t_start, h=jnp.asarray(h_init),
                iters=jnp.asarray(0))
    final = jax.lax.while_loop(cond, body, init)
    return final["x"]


def np_prod(shape) -> float:
    out = 1.0
    for s in shape:
        out *= s
    return out


# ---------------------------------------------------------------------------
# UniPC (predictor-corrector multistep), x0-prediction, bh1/bh2 variants.
# Reference: comfy/extra_samplers/uni_pc.py:580-877 (multistep_uni_pc_bh_update
# + sample_unipc). There t IS sigma (SigmaConvert): lambda = -log(sigma),
# alpha = 1/sqrt(1+sigma^2), std_vp = sigma * alpha; x is kept in VP space
# (x_vp = x_kdiff * alpha) and divided by alpha at the end.
# ---------------------------------------------------------------------------


def _unipc_coeffs(rks: jax.Array, hh: jax.Array, variant: str, order: jax.Array,
                  max_order: int = 3):
    """Solve the UniPC ``R @ rhos = b`` systems (uni_pc.py:610-655), padded.

    rks: (max_order,) with rks[k] = (lambda_prev_{k+1} - lambda_prev_0)/h for
    k < order-1 and 1.0 at k = order-1 (padding beyond must keep R nonsingular).
    Returns (rhos_p, rhos_c), both (max_order,), zeros beyond the active block.
    """
    h_phi_1 = jnp.expm1(hh)
    B_h = hh if variant == "bh1" else jnp.expm1(hh)

    # b_i = h_phi_k * factorial_i / B_h, following the reference's update order
    def build_b(carry, i):
        h_phi_k, factorial_i = carry
        b_i = h_phi_k * factorial_i / B_h
        factorial_next = factorial_i * (i + 2)
        h_phi_next = h_phi_k / hh - 1.0 / factorial_next
        return (h_phi_next, factorial_next), b_i

    _, b = jax.lax.scan(build_b, (h_phi_1 / hh - 1.0, 1.0), jnp.arange(max_order, dtype=jnp.float32))

    powers = jnp.arange(max_order)[:, None].astype(rks.dtype)
    R = rks[None, :] ** powers  # R[i, j] = rks[j]^i

    def solve_padded(k_active):
        # identity-pad R / zero-pad b outside the active k x k block so the
        # padded solution is [rhos_active, 0...]
        col = jnp.arange(max_order)[None, :]
        mask = (powers < k_active) & (col < k_active)
        Rp = jnp.where(mask, R, jnp.eye(max_order))
        bp = jnp.where(jnp.arange(max_order) < k_active, b, 0.0)
        return jnp.linalg.solve(Rp, bp)

    simplified = jnp.zeros((max_order,)).at[0].set(0.5)
    rhos_p = jnp.where(order == 2, simplified, solve_padded(order - 1))
    rhos_c = jnp.where(order == 1, simplified, solve_padded(order))
    return rhos_p, rhos_c


def _sample_unipc(denoise_model, x, sigmas, step_callback, variant, max_order: int = 3):
    """UniPC multistep predictor-corrector (uni_pc.py:580-877), as a lax.scan.

    t IS sigma (SigmaConvert :826-843): lambda = -log(sigma),
    alpha = 1/sqrt(1+sigma^2), VP std = sigma*alpha. x is carried in VP space
    (x_vp = x_kdiff * alpha) and divided by alpha(t_last) at the end (:874).
    One model call per step; the final step is predictor-only with no extra
    model call, matching `use_corrector=False` at the last step (:741).
    """
    steps = sigmas.shape[0] - 1
    order = max(1, min(max_order, steps - 1))
    # reference clamps the trailing 0 sigma to 0.001 (:853-857)
    ts = sigmas.at[-1].set(jnp.maximum(sigmas[-1], 1e-3))

    def alpha(s):
        return 1.0 / jnp.sqrt(1.0 + s * s)

    def lam(s):
        return -_log(s)

    bshape = (max_order,) + (1,) * (x.ndim)

    def model_x0(x_vp, sigma):
        return denoise_model(x_vp / alpha(sigma), sigma)  # k-diffusion space model

    x_vp = x * alpha(ts[0])
    m0 = model_x0(x_vp, ts[0])
    m_hist = jnp.stack([m0] * max_order)           # m_hist[k] = model at prev_k (0 newest)
    lam_hist = jnp.full((max_order,), lam(ts[0]))

    def predict(x_vp, m_hist, lam_hist, t_prev_sig, t_sig, step_order):
        """One bh-update; returns (x_t_, x_pred, rhos_c, d1s, coeffs...)."""
        lambda_t, lambda_p0 = lam(t_sig), lam(t_prev_sig)
        h = lambda_t - lambda_p0
        hh = -h  # predict_x0
        sigma_t = t_sig * alpha(t_sig)
        sigma_p0 = t_prev_sig * alpha(t_prev_sig)
        alpha_t = alpha(t_sig)
        h_phi_1 = jnp.expm1(hh)
        B_h = hh if variant == "bh1" else jnp.expm1(hh)

        ks = jnp.arange(max_order)
        lam_prev = lam_hist[jnp.minimum(ks + 1, max_order - 1)]
        rks = (lam_prev - lambda_p0) / jnp.where(h != 0, h, 1.0)
        rks = jnp.where(ks == step_order - 1, 1.0, rks)
        rks = jnp.where(ks > step_order - 1, 2.0 + ks, rks)  # nonsingular padding

        m_prev = m_hist[jnp.minimum(ks + 1, max_order - 1)]
        d1s = (m_prev - m_hist[0]) / rks.reshape(bshape)
        d1s = jnp.where((ks < step_order - 1).reshape(bshape), d1s, 0.0)

        rhos_p, rhos_c = _unipc_coeffs(rks, hh, variant, step_order, max_order)

        x_t_ = (sigma_t / jnp.maximum(sigma_p0, 1e-10)) * x_vp - alpha_t * h_phi_1 * m_hist[0]
        pred_res = jnp.einsum("k,k...->...", rhos_p, d1s)
        x_pred = x_t_ - alpha_t * B_h * jnp.where(step_order > 1, pred_res, 0.0)
        return x_t_, x_pred, rhos_c, d1s, alpha_t, B_h

    def body(carry, i):
        x_vp, m_hist, lam_hist = carry
        t_prev, t_cur = ts[i - 1], ts[i]
        # order ramp-up + lower_order_final (uni_pc.py:714-737)
        step_order = jnp.clip(jnp.minimum(jnp.minimum(i, order), steps + 1 - i), 1, order)
        x_t_, x_pred, rhos_c, d1s, alpha_t, B_h = predict(
            x_vp, m_hist, lam_hist, t_prev, t_cur, step_order
        )
        # corrector: one model eval at the predicted point; inactive d1s rows are
        # zero so einsum(rhos_c, d1s) covers exactly rhos_c[:order-1]
        model_t = model_x0(x_pred, t_cur)
        corr_res = jnp.einsum("k,k...->...", rhos_c, d1s)
        rho_last = rhos_c[jnp.clip(step_order - 1, 0, max_order - 1)]
        d1_t = model_t - m_hist[0]
        x_new = x_t_ - alpha_t * B_h * (corr_res + rho_last * d1_t)
        m_hist = jnp.roll(m_hist, 1, axis=0).at[0].set(model_t)
        lam_hist = jnp.roll(lam_hist, 1).at[0].set(lam(t_cur))
        if step_callback is not None:
            x_new = step_callback(x_new, model_t, t_cur, i - 1)
        return (x_new, m_hist, lam_hist), None

    if steps > 1:
        (x_vp, m_hist, lam_hist), _ = jax.lax.scan(
            body, (x_vp, m_hist, lam_hist), jnp.arange(1, steps)
        )
    # final step: predictor only, no corrector / extra model call (:741-744);
    # lower_order_final forces step_order = min(order, steps+1-steps) = 1
    _, x_pred, _, _, _, _ = predict(x_vp, m_hist, lam_hist, ts[-2], ts[-1], jnp.asarray(1))
    x_vp = x_pred
    if step_callback is not None:
        x_vp = step_callback(x_vp, m_hist[0], ts[-1], steps - 1)
    return x_vp / alpha(ts[-1])
