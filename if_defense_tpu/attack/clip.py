"""Perturbation clipping / projection ops.

Parity with `baselines/attack/util/clip_utils.py` on channel-last [B, K, 3]
arrays. All are meant to run under stop_gradient (the reference wraps them
in no_grad); callers apply them between optimisation steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_points_l2(pc: jax.Array, ori: jax.Array, budget: float) -> jax.Array:
    """Scale the whole perturbation into a global-L2 ball."""
    diff = pc - ori
    norm = jnp.sqrt(jnp.sum(diff * diff, axis=(1, 2)))   # [B]
    scale = jnp.minimum(budget / (norm + 1e-9), 1.0)
    return ori + diff * scale[:, None, None]


def clip_points_linf(pc: jax.Array, ori: jax.Array, budget: float) -> jax.Array:
    """Scale each point's offset into an L2-per-point ('l_inf') ball."""
    diff = pc - ori
    norm = jnp.sqrt(jnp.sum(diff * diff, axis=-1))       # [B, K]
    scale = jnp.minimum(budget / (norm + 1e-9), 1.0)
    return ori + diff * scale[..., None]


def project_inner_points(
    pc: jax.Array, ori: jax.Array, normal: jax.Array | None
) -> jax.Array:
    """Project points perturbed to the object's inside back to the surface.

    Reproduces the reference formula (`clip_utils.py:63-113`) including its
    elementwise `diff * vref / |vref|` step (NOT a true vector projection —
    kept as-is for behavioural parity with the published attack).
    """
    if normal is None:
        return pc
    diff = pc - ori
    inner = jnp.sum(diff * normal, axis=-1) < 0.0        # [B, K]
    vng = jnp.cross(normal, diff)                        # [B, K, 3]
    vng_norm = jnp.sqrt(jnp.sum(vng * vng, axis=-1))
    vref = jnp.cross(vng, normal)
    vref_norm = jnp.sqrt(jnp.sum(vref * vref, axis=-1))
    diff_proj = diff * vref / (vref_norm[..., None] + 1e-9)
    opposite = inner & (vng_norm < 1e-6)
    diff_proj = jnp.where(opposite[..., None], 0.0, diff_proj)
    diff = jnp.where(inner[..., None], diff_proj, diff)
    return ori + diff


def project_inner_clip_linf(
    pc: jax.Array, ori: jax.Array, normal: jax.Array | None, budget: float
) -> jax.Array:
    """Surface projection followed by the L_inf clip (kNN attack)."""
    pc = project_inner_points(pc, ori, normal)
    return clip_points_linf(pc, ori, budget)
