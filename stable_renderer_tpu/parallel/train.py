"""Distributed diffusion training step (fine-tuning / LoRA-style adaptation).

The reference is inference-only, but a production framework needs the training
loop for adapting checkpoints (the reference's realtime config depends on an
LCM-LoRA that was trained exactly this way). One jitted step:

    loss = || eps - UNet(z_t, t, ctx) ||^2   (noise prediction, eps-param)

sharded dp over the batch and tp over attention heads via GSPMD param specs
(parallel/sharding.py); optimizer = optax.adamw. This is the step
__graft_entry__.dryrun_multichip compiles over the virtual mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from stable_renderer_tpu.models.sampling.schedules import ModelSampling
from stable_renderer_tpu.models.unet import UNetModel


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array


def make_train_state(
    unet: UNetModel,
    params: dict,
    learning_rate: float = 1e-5,
    weight_decay: float = 1e-2,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def diffusion_loss(
    unet: UNetModel,
    params: dict,
    ms_sigmas: jax.Array,  # (1000,) schedule sigmas
    latents: jax.Array,    # (B, h, w, 4) clean latents
    context: jax.Array,    # (B, L, D)
    key: jax.Array,
    remat: bool = False,
) -> jax.Array:
    b = latents.shape[0]
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (b,), 0, ms_sigmas.shape[0])
    sigma = ms_sigmas[t][:, None, None, None]
    eps = jax.random.normal(k_n, latents.shape, latents.dtype)
    noised = latents + sigma * eps
    c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    fwd = unet.apply
    if remat:
        # rematerialize the UNet forward: trade FLOPs for activation memory at
        # large batch/resolution (jax.checkpoint over the whole apply)
        fwd = jax.checkpoint(unet.apply, static_argnums=())
    pred = fwd(params, noised * c_in, t.astype(jnp.float32), context)
    return jnp.mean((pred - eps) ** 2)


@partial(jax.jit, static_argnames=("unet", "tx", "remat"), donate_argnums=(2,))
def diffusion_train_step(
    unet: UNetModel,
    tx: optax.GradientTransformation,
    state: TrainState,
    ms_sigmas: jax.Array,
    latents: jax.Array,
    context: jax.Array,
    key: jax.Array,
    remat: bool = False,
) -> Tuple[TrainState, jax.Array]:
    loss, grads = jax.value_and_grad(
        lambda p: diffusion_loss(unet, p, ms_sigmas, latents, context, key, remat=remat)
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss
