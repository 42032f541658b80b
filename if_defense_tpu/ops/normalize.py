"""Point-cloud normalisation helpers.

Matches the reference's two conventions:
- unit sphere: center at centroid, divide by max radius
  (`ConvONet/opt_defense.py:74-81` `normalize_batch_pc`).
- unit cube: center, divide by the largest axis extent, optional padding
  (`ConvONet/opt_defense.py:114-146` `preprocess_pc`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_unit_sphere(pc: jax.Array, mask: jax.Array | None = None):
    """Center at the (masked) centroid and scale max radius to 1.

    Args:
        pc: [B, N, 3]
        mask: optional [B, N] validity mask (1 = real point). Masked-out
            points are ignored for the statistics but still transformed.
    Returns:
        [B, N, 3]
    """
    if mask is None:
        centroid = jnp.mean(pc, axis=1, keepdims=True)
        centered = pc - centroid
        r = jnp.sqrt(jnp.sum(centered**2, axis=-1))
        max_r = jnp.max(r, axis=1)
    else:
        m = mask[..., None]
        cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        centroid = jnp.sum(pc * m, axis=1, keepdims=True) / cnt[..., None]
        centered = pc - centroid
        r = jnp.sqrt(jnp.sum(centered**2, axis=-1)) * mask
        max_r = jnp.max(r, axis=1)
    return centered / jnp.maximum(max_r, 1e-12)[:, None, None]


def normalize_unit_cube(
    pc: jax.Array, padding_scale: float = 1.0, mask: jax.Array | None = None
):
    """Center at the (masked) mean and scale the largest axis extent to
    `padding_scale` within the unit cube [-0.5, 0.5].

    Args:
        pc: [B, N, 3]
        padding_scale: shrink factor inside the unit cube (reference uses
            0.9 for defense preprocessing).
        mask: optional [B, N] validity mask.
    Returns:
        [B, N, 3] scaled points (masked-out points transformed too).
    """
    if mask is None:
        center = jnp.mean(pc, axis=1, keepdims=True)
        centered = pc - center
        extent = jnp.max(centered, axis=1) - jnp.min(centered, axis=1)  # [B, 3]
    else:
        m = mask[..., None]
        cnt = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)[..., None]
        center = jnp.sum(pc * m, axis=1, keepdims=True) / cnt
        centered = pc - center
        big = jnp.where(m > 0, centered, -jnp.inf)
        small = jnp.where(m > 0, centered, jnp.inf)
        extent = jnp.max(big, axis=1) - jnp.min(small, axis=1)
    scale = jnp.max(extent, axis=-1)                        # [B]
    return centered / jnp.maximum(scale, 1e-12)[:, None, None] * padding_scale
