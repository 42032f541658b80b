"""Saliency-map point-dropping attack (ICCV'19), untargeted.

Parity with `baselines/attack/Saliency/Drop.py:12-109`: per round, saliency
= -r^alpha * <p - median, dL/dp>; the k highest-saliency points are removed
and the loop repeats until `num_drop` points are gone.

Shape policy: the cloud physically shrinks every round (that IS the attack),
so each round is a jitted step at its own static shape — num_drop/k (~20-40)
small compiles of the victim forward+backward, then steady-state reuse
across batches. The per-round drop (top-k + gather) stays on device.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("logits_fn", "k", "alpha"))
def _drop_round(logits_fn: Callable, pc, label, k: int, alpha: float):
    """One saliency round: returns ([B, K-k, 3] kept points, success [B])."""

    def loss(p):
        logp = jax.nn.log_softmax(logits_fn(p), -1)
        return -jnp.mean(jnp.take_along_axis(logp, label[:, None], -1))

    grad = jax.grad(loss)(pc)                              # [B, K, 3]
    logits = logits_fn(pc)
    pred = jnp.argmax(logits, -1)

    center = jnp.median(pc, axis=1, keepdims=True)         # [B, 1, 3]
    rel = pc - center
    r = jnp.sqrt(jnp.sum(rel * rel, axis=-1))              # [B, K]
    saliency = -(r**alpha) * jnp.sum(rel * grad, axis=-1)  # [B, K]

    K = pc.shape[1]
    _, keep_idx = jax.lax.top_k(-saliency, K - k)          # lowest saliency
    kept = jax.vmap(lambda p, i: p[i])(pc, keep_idx)
    return kept, pred == label


def saliency_drop(
    logits_fn: Callable,
    data: jax.Array,
    label: jax.Array,
    num_drop: int,
    k: int = 5,
    alpha: float = 1.0,
):
    """Drop `num_drop` points over ceil(num_drop / k) rounds.

    Args:
        logits_fn: [B, N, 3] -> [B, C] (must accept any N).
        data: [B, K, 3]; label: [B] ground-truth labels (untargeted).
    Returns:
        (pc [B, K - num_drop, 3], success_mask [B]) where success means the
        model still predicts the true label (i.e. attack FAILED for that
        example — same convention as the reference's printed success count).
    """
    pc = data
    dropped = 0
    while dropped < num_drop:
        step = min(k, num_drop - dropped)
        pc, _ = _drop_round(logits_fn, pc, label, step, alpha)
        dropped += step
    logits = logits_fn(pc)
    pred = jnp.argmax(logits, -1)
    return pc, pred == label
