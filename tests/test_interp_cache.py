"""Corner-cache bilinear sampling (the interp_refresh fast path).

While a query stays inside its cached cell, re-lerping the 4 cached
corner features must reproduce `bilinear_plane_sample` exactly; the
defense loop with a refresh window must track the exact loop closely.
"""

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.defense import convonet_opt_defense
from if_defense_tpu.implicit import ConvOccupancyNetwork
from if_defense_tpu.ops.interp import (
    bilinear_plane_sample,
    cached_bilinear_sample,
    plane_corner_features,
)


def _plane_uv(B=2, H=16, W=16, C=4, Q=64, seed=0):
    rng = np.random.default_rng(seed)
    plane = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    # keep uv in cell interiors so small moves cannot cross an edge
    cell = np.floor(rng.uniform(0, W - 1, (B, Q, 2)))
    uv = (cell + 0.5 + rng.uniform(-0.2, 0.2, (B, Q, 2))) / (W - 1)
    return plane, jnp.asarray(uv, jnp.float32)


def test_cached_equals_exact_at_cache_point():
    plane, uv = _plane_uv()
    corners, x0f, y0f = plane_corner_features(plane, uv)
    out = cached_bilinear_sample(corners, x0f, y0f, uv, plane.shape[1:3])
    ref = bilinear_plane_sample(plane, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cached_tracks_moves_within_cell():
    plane, uv = _plane_uv(seed=1)
    corners, x0f, y0f = plane_corner_features(plane, uv)
    moved = uv + 0.1 / 15                       # < 0.3 cells: no crossing
    out = cached_bilinear_sample(corners, x0f, y0f, moved,
                                 plane.shape[1:3])
    ref = bilinear_plane_sample(plane, moved)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_cached_gradients_flow_to_uv_not_cache():
    plane, uv = _plane_uv(seed=2)

    def loss(u):
        corners, x0f, y0f = plane_corner_features(plane, u)
        out = cached_bilinear_sample(corners, x0f, y0f, u,
                                     plane.shape[1:3])
        return jnp.sum(out**2)

    def loss_ref(u):
        return jnp.sum(bilinear_plane_sample(plane, u) ** 2)

    g = jax.grad(loss)(uv)
    g_ref = jax.grad(loss_ref)(uv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_defense_with_interp_refresh_matches_exact_loop():
    conv = ConvOccupancyNetwork()
    init_pc = jnp.zeros((2, 32, 3))
    variables = conv.init(jax.random.key(0), init_pc, init_pc)
    rng = np.random.default_rng(3)
    pc = jnp.asarray(rng.normal(size=(4, 96, 3)), jnp.float32) * 0.3
    key = jax.random.key(1)

    kwargs = dict(iterations=3, input_npoint=32, sample_npoint=64)
    exact = convonet_opt_defense(conv, variables, **kwargs)
    cached = convonet_opt_defense(
        conv, variables, interp_refresh=4, **kwargs)
    out_exact = np.asarray(exact(pc, key))
    out_cached = np.asarray(cached(pc, key))
    assert np.isfinite(out_cached).all()
    # points that start near a cell edge cross within the window and take
    # the (first-order) extrapolated lerp — trajectories deviate at the
    # 1e-2 level there; the bulk must track the exact loop tightly
    diff = np.abs(out_cached - out_exact)
    assert diff.max() < 0.05
    assert np.mean(diff) < 2e-3
