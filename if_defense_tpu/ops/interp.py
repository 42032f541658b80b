"""Bilinear feature-plane sampling (grid_sample equivalent).

TPU-native replacement for `F.grid_sample(..., padding_mode='border',
align_corners=True, mode='bilinear')` as used by the ConvONet decoder
(`ConvONet/src/conv_onet/models/decoder.py:51-58`).

Implementation: bilinear interpolation is separable, so the 4-corner
gather+lerp is expressed as two weighted one-hot contractions —
`rows = rowsel @ plane`, `out = colsel . rows` — which land on the MXU
instead of lowering to TPU gathers (measured ~6.5x faster at the defense
shapes, and the backward pass is two more matmuls instead of scatters).
Gradients flow through the interpolation weights only, identical to
grid_sample (corner indices are piecewise-constant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_plane_sample(plane: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample 2D feature planes at continuous coordinates.

    With align_corners=True, a coordinate u in [0, 1] maps to pixel position
    u * (R - 1). Out-of-range coordinates clamp to the border.

    Args:
        plane: [B, H, W, C] feature planes (channel-last).
        uv: [B, Q, 2] coordinates in [0, 1]; uv[..., 0] indexes W (x),
            uv[..., 1] indexes H (y) — matching grid_sample's (x, y) order.
    Returns:
        [B, Q, C] sampled features.
    """
    B, H, W, C = plane.shape
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (W - 1)             # [B, Q]
    y = jnp.clip(uv[..., 1], 0.0, 1.0) * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]                                 # [B, Q, 1]
    wy = (y - y0)[..., None]

    x0i = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, H - 1).astype(jnp.int32)

    # weighted two-hot row/column selectors (the lerp folded in)
    rowsel = (
        jax.nn.one_hot(y0i, H, dtype=plane.dtype) * (1 - wy)
        + jax.nn.one_hot(y1i, H, dtype=plane.dtype) * wy
    )                                                        # [B, Q, H]
    colsel = (
        jax.nn.one_hot(x0i, W, dtype=plane.dtype) * (1 - wx)
        + jax.nn.one_hot(x1i, W, dtype=plane.dtype) * wx
    )                                                        # [B, Q, W]

    # HIGH (bf16x3) reproduces f32 to ~2e-4 relative on these selection
    # matmuls at ~1.5x the speed of HIGHEST (measured on v5e); the
    # selector entries are exact in any precision
    rows = jnp.einsum(
        "bqh,bhwc->bqwc", rowsel, plane,
        precision=jax.lax.Precision.HIGH,
    )                                                        # [B, Q, W, C]
    return jnp.einsum(
        "bqw,bqwc->bqc", colsel, rows,
        precision=jax.lax.Precision.HIGH,
    )


def _axis_selector(coord, size, dtype):
    """Weighted two-hot selector for one interpolation axis, [B, Q, size]."""
    i0 = jnp.floor(coord)
    w = (coord - i0)[..., None]
    lo = jnp.clip(i0, 0, size - 1).astype(jnp.int32)
    hi = jnp.clip(i0 + 1, 0, size - 1).astype(jnp.int32)
    return (
        jax.nn.one_hot(lo, size, dtype=dtype) * (1 - w)
        + jax.nn.one_hot(hi, size, dtype=dtype) * w
    )


def trilinear_grid_sample(grid: jax.Array, uvw: jax.Array) -> jax.Array:
    """Sample a 3D feature volume at continuous coordinates.

    The volumetric analogue of `bilinear_plane_sample` (grid_sample on a
    5D input with align_corners=True / border padding — the ConvONet
    'grid' plane type, `decoder.py:60-67`): three separable weighted
    two-hot contractions.

    Args:
        grid: [B, D, H, W, C] channel-last feature volume.
        uvw: [B, Q, 3] coordinates in [0, 1]; uvw[..., 0] indexes W (x),
            uvw[..., 1] indexes H (y), uvw[..., 2] indexes D (z) —
            grid_sample's (x, y, z) order.
    Returns:
        [B, Q, C]
    """
    B, D, H, W, C = grid.shape
    x = jnp.clip(uvw[..., 0], 0.0, 1.0) * (W - 1)
    y = jnp.clip(uvw[..., 1], 0.0, 1.0) * (H - 1)
    z = jnp.clip(uvw[..., 2], 0.0, 1.0) * (D - 1)
    dsel = _axis_selector(z, D, grid.dtype)                  # [B, Q, D]
    hsel = _axis_selector(y, H, grid.dtype)
    wsel = _axis_selector(x, W, grid.dtype)
    p = jax.lax.Precision.HIGH
    g = jnp.einsum("bqd,bdhwc->bqhwc", dsel, grid, precision=p)
    g = jnp.einsum("bqh,bqhwc->bqwc", hsel, g, precision=p)
    return jnp.einsum("bqw,bqwc->bqc", wsel, g, precision=p)
