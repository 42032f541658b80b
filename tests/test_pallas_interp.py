"""Fused bilinear Pallas kernel vs the XLA reference path.

Runs through the Pallas interpreter on the CPU test mesh (the kernel
selects interpret mode off-TPU), asserting forward and gradient parity
with `bilinear_plane_sample` — including gradients to the query
coordinates (through the selector construction) and to the plane
features (the in-kernel grad_plane accumulation).
"""

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.ops.interp import bilinear_plane_sample
from if_defense_tpu.ops.pallas_interp import (
    fused_bilinear_plane_sample,
    fused_sample_supported,
)


def _data(B=2, H=8, W=8, C=4, Q=40, seed=0):
    rng = np.random.default_rng(seed)
    plane = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    uv = jnp.asarray(rng.uniform(-0.1, 1.1, (B, Q, 2)), jnp.float32)
    return plane, uv


def test_forward_matches_xla():
    plane, uv = _data()
    ref = bilinear_plane_sample(plane, uv)
    out = fused_bilinear_plane_sample(plane, uv)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_q_multiple_of_tile():
    plane, uv = _data(Q=256)
    ref = bilinear_plane_sample(plane, uv)
    out = fused_bilinear_plane_sample(plane, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla():
    plane, uv = _data(Q=96, seed=1)

    def loss(fn, plane, uv):
        out = fn(plane, uv)
        return jnp.sum(jnp.sin(out) * out)

    g_ref = jax.grad(lambda p, u: loss(bilinear_plane_sample, p, u),
                     argnums=(0, 1))(plane, uv)
    g_out = jax.grad(lambda p, u: loss(fused_bilinear_plane_sample, p, u),
                     argnums=(0, 1))(plane, uv)
    for a, b, name in zip(g_ref, g_out, ("plane", "uv")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-4,
            err_msg=f"grad mismatch for {name}")


def test_supported_gate():
    assert fused_sample_supported((4, 64, 64, 32))
    assert not fused_sample_supported((4, 64, 256, 32))  # W*C too large
