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


def plane_sample(plane: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear plane sampling with kernel dispatch.

    The fused Pallas kernel (`ops/pallas_interp.py` — no HBM [B, Q, W, C]
    intermediate) is OPT-IN via IFDEF_ENABLE_PALLAS_INTERP=1: measured on
    v5e it is ~1.3x SLOWER than XLA's two-einsum pipeline at the defense
    shapes (2.7 vs 2.1 ms/plane fwd+bwd; the einsums already run at the
    HBM roofline ~750 GB/s and the kernel's expansion matmuls at K=64
    waste MXU). Kept as a correct, tested alternative for future shapes
    where the intermediate dominates harder.
    """
    import os

    if (
        os.environ.get("IFDEF_ENABLE_PALLAS_INTERP")
        and plane.dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
    ):
        from if_defense_tpu.ops.pallas_interp import (
            fused_bilinear_plane_sample,
            fused_sample_supported,
        )

        if fused_sample_supported(plane.shape):
            return fused_bilinear_plane_sample(plane, uv)
    return bilinear_plane_sample(plane, uv)


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


def plane_corner_features(plane: jax.Array, uv: jax.Array):
    """Gather the 4 bilinear corner features per query (cache builder).

    The amortisation trick for iterative optimisation over a frozen plane:
    the expensive part of `bilinear_plane_sample` is the [B, Q, W, C]
    selection einsums, but the CORNER INDICES barely change while points
    move ~1e-3/step — so gather the 4 corner features once and re-lerp
    them cheaply for R steps (`cached_bilinear_sample`).

    Args:
        plane: [B, H, W, C]; uv: [B, Q, 2] in [0, 1] (x, y order).
    Returns:
        (corners [B, Q, 4, C] in (y0x0, y0x1, y1x0, y1x1) order,
         x0f [B, Q] float floor column, y0f [B, Q] float floor row).
    """
    B, H, W, C = plane.shape
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (W - 1)
    y = jnp.clip(uv[..., 1], 0.0, 1.0) * (H - 1)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0i = jnp.clip(x0f, 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x0f + 1, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0f, 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y0f + 1, 0, H - 1).astype(jnp.int32)

    p = jax.lax.Precision.HIGH
    rows0 = jnp.einsum(
        "bqh,bhwc->bqwc", jax.nn.one_hot(y0i, H, dtype=plane.dtype), plane,
        precision=p)
    rows1 = jnp.einsum(
        "bqh,bhwc->bqwc", jax.nn.one_hot(y1i, H, dtype=plane.dtype), plane,
        precision=p)
    c0 = jax.nn.one_hot(x0i, W, dtype=plane.dtype)
    c1 = jax.nn.one_hot(x1i, W, dtype=plane.dtype)
    f00 = jnp.einsum("bqw,bqwc->bqc", c0, rows0, precision=p)
    f01 = jnp.einsum("bqw,bqwc->bqc", c1, rows0, precision=p)
    f10 = jnp.einsum("bqw,bqwc->bqc", c0, rows1, precision=p)
    f11 = jnp.einsum("bqw,bqwc->bqc", c1, rows1, precision=p)
    corners = jnp.stack([f00, f01, f10, f11], axis=2)   # [B, Q, 4, C]
    return corners, x0f, y0f


def cached_bilinear_sample(
    corners: jax.Array, x0f: jax.Array, y0f: jax.Array,
    uv: jax.Array, plane_hw,
) -> jax.Array:
    """Re-lerp cached corner features at the CURRENT coordinates.

    Equal to `bilinear_plane_sample` while each query stays inside its
    cached cell; when a point crosses a cell boundary before the next
    refresh the lerp extrapolates linearly (weights leave [0, 1]) — a
    first-order-accurate surrogate of the neighbouring cell. Gradients
    to the coordinates are exact for the surrogate. O(B*Q*C) VPU work —
    no [B, Q, W, C] intermediate.

    Args:
        corners/x0f/y0f: from `plane_corner_features` (stop-gradient).
        uv: [B, Q, 2] current coordinates; plane_hw: (H, W).
    Returns:
        [B, Q, C]
    """
    H, W = plane_hw
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (W - 1)
    y = jnp.clip(uv[..., 1], 0.0, 1.0) * (H - 1)
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]
    f00, f01, f10, f11 = (corners[:, :, i] for i in range(4))
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy
