"""Simple Random Sampling defense (arXiv:1902.10899).

Parity with `baselines/defense/drop_points/SRS.py:8-39`: drop `drop_num`
random points per cloud (without replacement). Output shape is static
[B, K - drop_num, 3]; randomness is an explicit PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def srs_defense(pc: jax.Array, drop_num: int, key: jax.Array) -> jax.Array:
    """Randomly keep K - drop_num points of each cloud.

    Args:
        pc: [B, K, 3]
        drop_num: number of points to drop (static).
        key: PRNG key.
    Returns:
        [B, K - drop_num, 3]
    """
    B, K, _ = pc.shape
    keep = K - drop_num
    if keep <= 0:
        raise ValueError(f"drop_num {drop_num} >= cloud size {K}")

    def one(p, k):
        idx = jax.random.permutation(k, K)[:keep]
        return p[idx]

    return jax.vmap(one)(pc, jax.random.split(key, B))
