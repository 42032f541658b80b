"""3D evaluation metrics.

`compute_iou` mirrors `ConvONet/src/common.py:8-36` (volumetric IoU over
occupancy indicators at p >= 0.5), used for implicit-network validation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_iou(occ1: jax.Array, occ2: jax.Array) -> jax.Array:
    """Volumetric IoU of two occupancy sets, [B, ...] -> [B]."""
    o1 = (occ1 >= 0.5).reshape(occ1.shape[0], -1)
    o2 = (occ2 >= 0.5).reshape(occ2.shape[0], -1)
    union = jnp.sum(o1 | o2, axis=-1).astype(jnp.float32)
    inter = jnp.sum(o1 & o2, axis=-1).astype(jnp.float32)
    return inter / jnp.maximum(union, 1.0)
