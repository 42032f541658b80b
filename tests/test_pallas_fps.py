"""Pallas FPS kernel vs the lax reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from if_defense_tpu.ops import farthest_point_sample
from if_defense_tpu.ops.pallas_fps import fps_pallas


def test_fps_pallas_matches_lax():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(8, 128, 3)), jnp.float32)
    a = np.asarray(farthest_point_sample(pts, 32))
    b = np.asarray(fps_pallas(pts, 32, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_fps_pallas_v2_matches_v1():
    """The packed-coords / fewer-reductions candidate kernel is
    index-identical to v1 and the lax reference (incl. tie-breaking)."""
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(8, 128, 3)), jnp.float32)
    a = np.asarray(farthest_point_sample(pts, 32))
    v2 = np.asarray(fps_pallas(pts, 32, interpret=True, variant=2))
    np.testing.assert_array_equal(a, v2)
    # duplicated points force distance ties on the argmax
    dup = jnp.concatenate([pts[:, :64], pts[:, :64]], axis=1)
    a = np.asarray(farthest_point_sample(dup, 16))
    v2 = np.asarray(fps_pallas(dup, 16, interpret=True, variant=2))
    np.testing.assert_array_equal(a, v2)


def test_fps_pallas_selects_distinct_points():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    idx = np.asarray(fps_pallas(pts, 16, interpret=True))
    for b in range(2):
        assert len(set(idx[b].tolist())) == 16


def test_farthest_point_sample_grad_through_pallas_branch(monkeypatch):
    """Differentiating a forward that selects-and-gathers via FPS must
    not differentiate the kernel itself: pallas_call has no JVP rule
    (AssertionError on TPU — hit by CW x PointNet++). The product fix is
    the stop_gradient inside farthest_point_sample; force the pallas
    branch (interpret mode) and take a gradient through the gather."""
    import jax
    import jax.numpy as jnp

    import if_defense_tpu.ops.pallas_fps as pf
    from if_defense_tpu.ops.pointops import farthest_point_sample

    real = pf.fps_pallas
    monkeypatch.setattr(
        pf, "fps_pallas", lambda xyz, n: real(xyz, n, interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(8, 128, 3)), jnp.float32)

    def loss(x):
        idx = farthest_point_sample(x, 16)      # pallas branch (forced)
        sel = jnp.take_along_axis(x, idx[..., None].repeat(3, -1), 1)
        return (sel ** 2).sum()

    g = np.asarray(jax.grad(loss)(pts))
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).any()                # gather gradient flows
