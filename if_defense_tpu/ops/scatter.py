"""Batched scatter-reduce onto flat cell grids.

TPU-native replacement for the reference's `torch_scatter.scatter_mean/max`
dependency (`ConvONet/src/encoder/pointnet.py:5`).

Implementation note: XLA's TPU scatter lowering is both slow and — at some
batch shapes (observed at B=40) — pathologically slow to COMPILE, wedging
the backend. The mean-scatter is therefore a one-hot MXU contraction and
the per-point pooled max a pairwise same-cell masked reduction; both are
scatter-free, fully differentiable, and exact. `scatter_max_2d` (the dense
per-cell max, rarely on the hot path) keeps the `.at[].max` form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_mean_2d(feat: jax.Array, index: jax.Array, num_cells: int) -> jax.Array:
    """Per-batch mean-scatter of point features into grid cells.

    One-hot matmul formulation (MXU): sums at HIGH precision (bf16x3,
    ~f32-exact for these magnitudes), counts exact.

    Args:
        feat: [B, N, C] per-point features.
        index: [B, N] int cell index in [0, num_cells).
        num_cells: static number of cells.
    Returns:
        [B, num_cells, C]; empty cells are zero.
    """
    onehot = jax.nn.one_hot(index, num_cells, dtype=feat.dtype)  # [B, N, K]
    sums = jnp.einsum(
        "bnk,bnc->bkc", onehot, feat, precision=jax.lax.Precision.HIGH
    )
    counts = jnp.sum(onehot, axis=1)                             # [B, K]
    return sums / jnp.maximum(counts, 1.0)[..., None]


def pooled_max_by_cell(feat: jax.Array, index: jax.Array) -> jax.Array:
    """Per-POINT max over all points sharing the same cell.

    Scatter-free equivalent of scatter_max + gather-back (the ConvONet
    encoder's pool_local, `src/encoder/pointnet.py:104-122`): a pairwise
    same-cell mask + masked max reduction. O(N^2 C) VPU work — fine for
    the encoder's N<=600 once-per-batch usage.

    Args:
        feat: [B, N, C]; index: [B, N].
    Returns:
        [B, N, C] pooled features.
    """
    same = index[:, :, None] == index[:, None, :]                # [B, N, N]
    big = jnp.where(same[..., None], feat[:, None, :, :], -jnp.inf)
    return jnp.max(big, axis=2)


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


def pooled_mean_by_cell(feat: jax.Array, index: jax.Array) -> jax.Array:
    """Per-POINT mean over all points sharing the same cell.

    The scatter_mean + gather-back twin of `pooled_max_by_cell`
    (PatchLocalPoolPointnet's scatter_type='mean' pooling,
    `ConvONet/src/encoder/pointnet.py:282-299`).

    Args:
        feat: [B, N, C]; index: [B, N].
    Returns:
        [B, N, C] pooled features.
    """
    same = (index[:, :, None] == index[:, None, :]).astype(feat.dtype)
    sums = jnp.einsum(
        "bnm,bmc->bnc", same, feat, precision=jax.lax.Precision.HIGH
    )
    counts = jnp.sum(same, axis=-1, keepdims=True)               # [B, N, 1]
    return sums / jnp.maximum(counts, 1.0)
