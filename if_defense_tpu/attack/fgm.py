"""FGM-family gradient attacks: FGM, I-FGM, MI-FGM, PGD.

Parity with `baselines/attack/FGM/FGM.py:70-281` on channel-last [B, K, 3]:
descend the (globally L2-normalised) gradient of the targeted adversarial
loss, clipping back into the budget ball each step; MI-FGM accumulates
L1-normalised gradients with momentum; PGD = I-FGM + uniform random init
scaled by budget / sqrt(K * 3). Iterations run as one on-device scan.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from if_defense_tpu.attack.clip import clip_points_l2
from if_defense_tpu.attack.losses import logits_adv_loss


def _global_l2(x):
    return jnp.sqrt(jnp.sum(x * x, axis=(1, 2)))


def _adv_grad(logits_fn, adv_fn, pc, target, normalize=True):
    def loss(p):
        return jnp.mean(adv_fn(logits_fn(p), target))

    g = jax.grad(loss)(pc)
    if normalize:
        g = g / (_global_l2(g)[:, None, None] + 1e-9)
    return g


@functools.partial(
    jax.jit, static_argnames=("logits_fn", "adv_fn", "budget")
)
def fgm(
    logits_fn: Callable,
    data: jax.Array,
    target: jax.Array,
    budget: float,
    adv_fn: Callable = logits_adv_loss,
):
    """Single-step FGM. Returns (adv_pc, success_mask)."""
    g = _adv_grad(logits_fn, adv_fn, data, target)
    adv = data - g * budget
    pred = jnp.argmax(logits_fn(adv), axis=-1)
    return adv, pred == target


def _iterative(
    logits_fn, adv_fn, data, target, key, budget, step_size, num_iter,
    momentum_mu=None,
):
    ori = data + jax.random.normal(key, data.shape) * 1e-7

    def step(carry, _):
        pc, mom = carry
        if momentum_mu is None:
            g = _adv_grad(logits_fn, adv_fn, pc, target, normalize=True)
            direction = g
        else:
            g = _adv_grad(logits_fn, adv_fn, pc, target, normalize=False)
            l1 = jnp.sum(jnp.abs(g), axis=(1, 2))
            g = g / (l1[:, None, None] + 1e-9)
            mom = momentum_mu * mom + g
            direction = mom / (_global_l2(mom)[:, None, None] + 1e-9)
        pc = pc - step_size * direction
        pc = clip_points_l2(pc, ori, budget)
        return (pc, mom), None

    (adv, _), _ = jax.lax.scan(
        step, (ori, jnp.zeros_like(ori)), None, length=num_iter
    )
    pred = jnp.argmax(logits_fn(adv), axis=-1)
    return adv, pred == target


@functools.partial(
    jax.jit,
    static_argnames=("logits_fn", "adv_fn", "budget", "step_size", "num_iter"),
)
def ifgm(
    logits_fn, data, target, key,
    budget: float, step_size: float, num_iter: int = 50,
    adv_fn: Callable = logits_adv_loss,
):
    """Iterative FGM with per-step L2 clip. Returns (adv_pc, success)."""
    return _iterative(
        logits_fn, adv_fn, data, target, key, budget, step_size, num_iter
    )


@functools.partial(
    jax.jit,
    static_argnames=("logits_fn", "adv_fn", "budget", "step_size",
                     "num_iter", "mu"),
)
def mifgm(
    logits_fn, data, target, key,
    budget: float, step_size: float, num_iter: int = 50, mu: float = 1.0,
    adv_fn: Callable = logits_adv_loss,
):
    """Momentum iterative FGM. Returns (adv_pc, success)."""
    return _iterative(
        logits_fn, adv_fn, data, target, key, budget, step_size, num_iter,
        momentum_mu=mu,
    )


@functools.partial(
    jax.jit,
    static_argnames=("logits_fn", "adv_fn", "budget", "step_size", "num_iter"),
)
def pgd(
    logits_fn, data, target, key,
    budget: float, step_size: float, num_iter: int = 50,
    adv_fn: Callable = logits_adv_loss,
):
    """PGD = I-FGM from a uniform random start within the budget ball."""
    k1, k2 = jax.random.split(key)
    eps = budget / (data.shape[1] * data.shape[2]) ** 0.5
    init = data + jax.random.uniform(
        k1, data.shape, minval=-eps, maxval=eps
    )
    return _iterative(
        logits_fn, adv_fn, init, target, k2, budget, step_size, num_iter
    )
