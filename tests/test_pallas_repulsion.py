"""Fused repulsion kernel vs the exact XLA reference path.

Runs through the Pallas interpreter on CPU. Random continuous points have
no distance ties, so the fused threshold selection must agree exactly
with the sort-based exact kNN path — forward loss AND gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.defense.repulsion import repulsion_loss
from if_defense_tpu.ops.pallas_repulsion import (
    _tile_rows,
    fused_repulsion_loss,
    fused_repulsion_supported,
)


NT = _tile_rows(512)


def _points(B=2, N=NT * 2, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, (B, N, 3)), jnp.float32)


def test_forward_matches_exact():
    pc = _points()
    ref = repulsion_loss(pc, exact=True)
    out = fused_repulsion_loss(pc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-5)


def test_gradients_match_exact():
    pc = _points(seed=1)

    g_ref = jax.grad(lambda p: jnp.sum(repulsion_loss(p, exact=True)))(pc)
    g_out = jax.grad(lambda p: jnp.sum(fused_repulsion_loss(p)))(pc)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-4)


def test_per_example_grad_scaling():
    pc = _points(seed=2)
    w = jnp.asarray([1.0, 3.0])

    g_ref = jax.grad(
        lambda p: jnp.sum(w * repulsion_loss(p, exact=True)))(pc)
    g_out = jax.grad(lambda p: jnp.sum(w * fused_repulsion_loss(p)))(pc)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-4)


def test_duplicate_points_finite_and_close():
    """Resampled clouds duplicate points: zero distances must not blow up
    the loss or gradient (eps floor), and tied terms are equal so the
    fractional tie weights keep the loss at the reference value."""
    pc = np.array(_points(seed=3))
    pc[:, NT:] = pc[:, :NT]          # every point duplicated once
    pc = jnp.asarray(pc)

    ref = repulsion_loss(pc, exact=True)
    out = fused_repulsion_loss(pc)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-4)

    g = jax.grad(lambda p: jnp.sum(fused_repulsion_loss(p)))(pc)
    assert np.isfinite(np.asarray(g)).all()


def test_supported_gate():
    assert fused_repulsion_supported(1024)
    assert not fused_repulsion_supported(1000)   # not tile-divisible
    assert not fused_repulsion_supported(8192)   # tiles too large
