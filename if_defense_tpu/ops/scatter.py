"""Batched scatter-reduce onto flat cell grids.

TPU-native replacement for the reference's `torch_scatter.scatter_mean/max`
dependency (`ConvONet/src/encoder/pointnet.py:5`): implemented with
`jax.ops.segment_sum`-style `.at[].add/.max` updates, vmapped over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_mean_2d(feat: jax.Array, index: jax.Array, num_cells: int) -> jax.Array:
    """Per-batch mean-scatter of point features into grid cells.

    Args:
        feat: [B, N, C] per-point features.
        index: [B, N] int cell index in [0, num_cells).
        num_cells: static number of cells.
    Returns:
        [B, num_cells, C]; empty cells are zero.
    """

    def one(f, i):
        s = jnp.zeros((num_cells, f.shape[-1]), f.dtype).at[i].add(f)
        cnt = jnp.zeros((num_cells,), f.dtype).at[i].add(1.0)
        return s / jnp.maximum(cnt, 1.0)[:, None]

    return jax.vmap(one)(feat, index)


def scatter_max_2d(feat: jax.Array, index: jax.Array, num_cells: int) -> jax.Array:
    """Per-batch max-scatter of point features into grid cells.

    torch_scatter 2.x semantics: the max over the scattered features only
    (it can be negative); cells no point maps to are zero.
    """

    def one(f, i):
        neg_inf = jnp.full((num_cells, f.shape[-1]), -jnp.inf, f.dtype)
        out = neg_inf.at[i].max(f)
        return jnp.where(jnp.isinf(out), 0.0, out)

    return jax.vmap(one)(feat, index)
