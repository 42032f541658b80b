"""Bilinear feature-plane sampling (grid_sample equivalent).

TPU-native replacement for `F.grid_sample(..., padding_mode='border',
align_corners=True, mode='bilinear')` as used by the ConvONet decoder
(`ConvONet/src/conv_onet/models/decoder.py:51-58`): a 4-corner gather + lerp
written so the channel axis stays the trailing (lane) dimension.
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

    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = x - x0
    wy = y - y0

    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    def gather(p, yi, xi):
        # p: [H, W, C]; yi/xi: [Q]
        return p[yi, xi]                                     # [Q, C]

    g = jax.vmap(gather)
    f00 = g(plane, y0i, x0i)
    f01 = g(plane, y0i, x1i)
    f10 = g(plane, y1i, x0i)
    f11 = g(plane, y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy
