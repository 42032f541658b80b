"""Repulsion loss pushing restored points toward uniform spacing.

Parity with `ONet/defense/repulsion_loss.py:7-74` (= ConvONet copy):
k=5 nearest neighbours (self excluded, graph under stop_gradient),
loss = mean over points/neighbours of (radius - dist) * exp(-(dist/h)^2)
with radius 0.07, h 0.03, eps 1e-12 floor before the sqrt.

The reference's OOM-adaptive kNN batch halving (:25-42) is unnecessary
here: the kNN is one [B, N, N] matmul + top_k that XLA tiles to fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from if_defense_tpu.ops import index_points, knn_self


def repulsion_loss(
    pc: jax.Array,
    nn_size: int = 5,
    radius: float = 0.07,
    h: float = 0.03,
    eps: float = 1e-12,
) -> jax.Array:
    """Per-example repulsion loss, [B, N, 3] -> [B].

    The kNN graph is built under stop_gradient (reference: no_grad);
    gradients flow through the distances to the fixed neighbour set.
    """
    idx = jax.lax.stop_gradient(knn_self(nn_size, pc))
    grouped = index_points(pc, idx)                     # [B, N, k, 3]
    diff = grouped - pc[:, :, None, :]
    dist2 = jnp.maximum(jnp.sum(diff * diff, axis=-1), eps)
    dist = jnp.sqrt(dist2)                              # [B, N, k]
    weight = jnp.exp(-((dist / h) ** 2))
    uniform = (radius - dist) * weight
    return jnp.mean(uniform, axis=(1, 2))               # [B]
