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


def test_masked_kernels_match_xla_fallback():
    """Pallas mask builder + masked loss/grad == the XLA fallbacks
    (same semantics by construction; interpret mode on CPU)."""
    from if_defense_tpu.defense.repulsion import (
        repulsion_loss_masked,
        repulsion_mask,
    )
    from if_defense_tpu.ops.pallas_repulsion import (
        fused_repulsion_loss_masked,
        fused_repulsion_mask,
    )

    pc = _points(seed=4)
    m_ref = np.asarray(repulsion_mask(pc))
    m_out = np.asarray(fused_repulsion_mask(pc))
    np.testing.assert_array_equal(m_out, m_ref)

    mask = jnp.asarray(m_ref)
    l_ref = repulsion_loss_masked(pc, mask)
    l_out = fused_repulsion_loss_masked(pc, mask)
    np.testing.assert_allclose(np.asarray(l_out), np.asarray(l_ref),
                               atol=1e-6, rtol=1e-5)

    g_ref = jax.grad(lambda p: jnp.sum(repulsion_loss_masked(p, mask)))(pc)
    g_out = jax.grad(
        lambda p: jnp.sum(fused_repulsion_loss_masked(p, mask)))(pc)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-4)


def test_masked_loss_equals_unmasked_at_fresh_mask():
    """With a just-built mask and no ties, the cached-graph loss equals
    the per-step fused loss (the graph IS the current kNN graph)."""
    from if_defense_tpu.ops.pallas_repulsion import (
        fused_repulsion_loss_masked,
        fused_repulsion_mask,
    )

    pc = _points(seed=5)
    mask = fused_repulsion_mask(pc)
    out = fused_repulsion_loss_masked(pc, mask)
    ref = fused_repulsion_loss(pc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-5)

    g_ref = jax.grad(lambda p: jnp.sum(fused_repulsion_loss(p)))(pc)
    g_out = jax.grad(
        lambda p: jnp.sum(fused_repulsion_loss_masked(p, mask)))(pc)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-4)


def test_defense_runs_with_rep_graph_cache():
    """make_opt_defense(rep_graph_cache=True) composes with the corner
    cache; output finite, shape right; the invalid combination raises."""
    import pytest

    from if_defense_tpu.defense import convonet_opt_defense
    from if_defense_tpu.defense.ifdefense import make_opt_defense
    from if_defense_tpu.implicit import ConvOccupancyNetwork

    model = ConvOccupancyNetwork(plane_resolution=16)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    rng = np.random.default_rng(6)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 128, 3)), jnp.float32)

    defend = convonet_opt_defense(
        model, variables, iterations=4, input_npoint=32,
        sample_npoint=64, interp_refresh=2, rep_graph_cache=True)
    out = np.asarray(defend(pc, jax.random.key(1)))
    assert out.shape == (2, 64, 3)
    assert np.isfinite(out).all()

    with pytest.raises(ValueError, match="interp_refresh"):
        make_opt_defense(lambda *a: None, lambda *a: None,
                         rep_graph_cache=True)
