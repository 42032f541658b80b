"""Saliency-map point-dropping attack (ICCV'19), untargeted.

Parity with `baselines/attack/Saliency/Drop.py:12-109`: per round, saliency
= -r^alpha * <p - median, dL/dp>; the k highest-saliency points are removed
and the loop repeats until `num_drop` points are gone.

Shape policy (TPU-first): the cloud does NOT physically shrink. Dropped
points are masked out and the victims run mask-aware forwards
(`models/*(..., mask=)`) that are exact vs the compacted cloud in eval
mode — masked global pools, masked kNN/FPS/ball-query candidates, masked
KDE density. The whole attack is therefore ONE jitted function per
(victim, K): a `fori_loop` over rounds at a single static shape, instead
of the reference's ~num_drop/k re-jitted shrinking shapes (each a full
victim fwd+bwd compile — minutes of overhead per model at ModelNet scale).

`saliency_drop_shrink` keeps the physically-shrinking variant; the two
produce identical kept sets (asserted in tests/test_attack_drop.py).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def _masked_median(pc: jax.Array, mask: jax.Array, cnt: jax.Array):
    """Median over valid points per coordinate, [B, 1, 3].

    `cnt` is the per-round valid count (same for every example). Matches
    jnp.median's mean-of-two-middles convention.
    """
    big = jnp.asarray(jnp.inf, pc.dtype)
    vals = jnp.where(mask[..., None] > 0, pc, big)
    vals = jnp.sort(vals, axis=1)                          # [B, K, 3]
    lo = (cnt - 1) // 2
    hi = cnt // 2
    take = lambda i: jnp.take_along_axis(
        vals, jnp.full((pc.shape[0], 1, 3), i), axis=1)
    return 0.5 * (take(lo) + take(hi))                     # [B, 1, 3]


@functools.partial(
    jax.jit, static_argnames=("logits_fn", "num_drop", "k", "alpha"))
def saliency_drop_masked(
    logits_fn: Callable,
    data: jax.Array,
    label: jax.Array,
    num_drop: int,
    k: int = 5,
    alpha: float = 1.0,
):
    """Fixed-shape Drop: returns (pc [B, K, 3], keep_mask [B, K], success).

    Args:
        logits_fn: (pc [B, K, 3], mask [B, K]) -> [B, C] mask-aware victim.
        data: [B, K, 3]; label: [B] true labels (untargeted).
    Returns:
        (data unchanged, keep_mask with exactly K - num_drop ones per
        cloud, still_correct [B] — the model still predicts the true
        label on the masked cloud).
    """
    B, K, _ = data.shape
    rounds = -(-num_drop // k)

    def loss(p, m):
        logp = jax.nn.log_softmax(logits_fn(p, m), -1)
        return -jnp.mean(jnp.take_along_axis(logp, label[:, None], -1))

    grad_fn = jax.grad(loss)

    def round_body(r, mask):
        dropped = r * k
        step = jnp.minimum(k, num_drop - dropped)          # last round may
        cnt = K - dropped                                  # be partial
        grad = grad_fn(data, mask)                         # [B, K, 3]
        center = _masked_median(data, mask, cnt)
        rel = data - center
        rad = jnp.sqrt(jnp.sum(rel * rel, axis=-1))        # [B, K]
        saliency = -(rad**alpha) * jnp.sum(rel * grad, axis=-1)
        saliency = jnp.where(mask > 0, saliency, -jnp.inf)
        _, idx = jax.lax.top_k(saliency, k)                # [B, k]
        live = (jnp.arange(k) < step).astype(mask.dtype)   # partial round
        drop = jnp.sum(
            jax.nn.one_hot(idx, K, dtype=mask.dtype) * live[None, :, None],
            axis=1,
        )
        return mask * (1.0 - drop)

    mask = jax.lax.fori_loop(
        0, rounds, round_body, jnp.ones((B, K), data.dtype))
    pred = jnp.argmax(logits_fn(data, mask), -1)
    return data, mask, pred == label


def compact_kept(pc, mask, num_drop: int):
    """Gather the kept points into a dense [B, K - num_drop, 3] array."""
    order = jnp.argsort(-mask, axis=1, stable=True)        # kept first,
    keep = order[:, : pc.shape[1] - num_drop]              # original order
    return jax.vmap(lambda p, i: p[i])(pc, keep)


def saliency_drop(
    logits_fn: Callable,
    data: jax.Array,
    label: jax.Array,
    num_drop: int,
    k: int = 5,
    alpha: float = 1.0,
):
    """Drop `num_drop` points; returns ([B, K - num_drop, 3], success).

    Args:
        logits_fn: (pc, mask) -> [B, C] mask-aware victim forward.
        data: [B, K, 3]; label: [B] ground-truth labels (untargeted).
    Returns:
        (compacted kept points, success_mask [B]) where success means the
        model still predicts the true label (i.e. attack FAILED for that
        example — same convention as the reference's printed count).
    """
    pc, mask, still_correct = saliency_drop_masked(
        logits_fn, data, label, num_drop, k, alpha)
    return compact_kept(pc, mask, num_drop), still_correct


@functools.partial(jax.jit, static_argnames=("logits_fn", "k", "alpha"))
def _drop_round(logits_fn: Callable, pc, label, k: int, alpha: float):
    """One shrinking round: ([B, K-k, 3] kept points, success [B])."""

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


def saliency_drop_shrink(
    logits_fn: Callable,
    data: jax.Array,
    label: jax.Array,
    num_drop: int,
    k: int = 5,
    alpha: float = 1.0,
):
    """Physically-shrinking Drop (the reference's shape policy).

    One victim fwd+bwd compile per round shape — kept as the
    cross-validation twin of `saliency_drop` (identical kept sets) and
    for victims without mask-aware forwards.

    Args:
        logits_fn: [B, N, 3] -> [B, C] (must accept any N).
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
