"""Pallas fused ball-query kernel vs the XLA paths (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.ops import query_ball_point
from if_defense_tpu.ops.pallas_ballquery import ballquery_pallas


def _clouds(b=4, n=256, scale=0.3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, n, 3)) * scale, jnp.float32)


def test_ballquery_pallas_matches_xla_paths():
    xyz = _clouds()
    q = xyz[:, :128]
    ref_count = np.asarray(
        query_ball_point(0.2, 32, xyz, q, method="count"))
    ref_sort = np.asarray(
        query_ball_point(0.2, 32, xyz, q, method="sort"))
    got = np.asarray(ballquery_pallas(0.2, 32, xyz, q, interpret=True))
    np.testing.assert_array_equal(ref_count, ref_sort)
    np.testing.assert_array_equal(got, ref_count)


def test_ballquery_pallas_no_hit_fallback():
    """Centres with zero in-radius points fall back to index 0, exactly
    like the XLA paths (reference `baselines/model/pointnet2.py:77-98`
    fill semantics)."""
    xyz = _clouds(seed=1)
    q = xyz[:, :128] + 50.0
    ref = np.asarray(query_ball_point(0.2, 32, xyz, q, method="count"))
    got = np.asarray(ballquery_pallas(0.2, 32, xyz, q, interpret=True))
    assert (got == 0).all()
    np.testing.assert_array_equal(got, ref)


def test_ballquery_pallas_small_tile():
    """S not divisible by 128 runs with a smaller centre tile."""
    xyz = _clouds(seed=2)
    q = xyz[:, :24]
    ref = np.asarray(query_ball_point(0.3, 16, xyz, q, method="count"))
    got = np.asarray(
        ballquery_pallas(0.3, 16, xyz, q, tile_s=8, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_ballquery_grad_through_pallas_branch(monkeypatch):
    """Ball-query selection is discrete; the stop_gradient inside
    ballquery_pallas keeps tangents out of pallas_call (which has no JVP
    rule — same failure mode as grad-through-FPS on TPU). Force the
    pallas branch and differentiate through the downstream gather."""
    import if_defense_tpu.ops.pallas_ballquery as pb
    import if_defense_tpu.ops.pointops as po

    real = pb.ballquery_pallas
    monkeypatch.setattr(
        pb, "ballquery_pallas",
        lambda r, k, x, q, tile_s=128: real(
            r, k, x, q, tile_s=tile_s, interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    xyz = _clouds(b=8, n=128)

    def loss(x):
        idx = po.query_ball_point(0.2, 16, x, x[:, :16])
        sel = po.gather_neighbors(x, idx)
        return (sel ** 2).sum()

    g = np.asarray(jax.grad(loss)(xyz))
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).any()


def test_gather_neighbors_vjp_matches_index_points():
    """gather_neighbors (one-hot fwd, one-hot einsum bwd) is
    grad-identical to the plain indexed gather, composes with remat,
    and emits a float0 cotangent for the integer indices."""
    from if_defense_tpu.ops import gather_neighbors, index_points

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(3, 64, 7)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 64, size=(3, 10, 5)), jnp.int32)

    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(gather_neighbors(p, idx))))(pts)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(index_points(p, idx))))(pts)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)

    f = jax.checkpoint(
        lambda p: jnp.sum(gather_neighbors(p, idx) ** 2),
        policy=jax.checkpoint_policies.nothing_saveable)
    assert np.isfinite(np.asarray(jax.grad(f)(pts))).all()
