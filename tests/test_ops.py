"""Golden tests for the point-op kernel library vs plain-numpy references.

The numpy oracles re-derive the reference formulas (cited per-op in the
implementation docstrings) independently.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from if_defense_tpu import ops


def _np_square_distance(a, b):
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_square_distance(rng):
    a = rng.normal(size=(2, 17, 3)).astype(np.float32)
    b = rng.normal(size=(2, 23, 3)).astype(np.float32)
    got = np.asarray(ops.square_distance(jnp.array(a), jnp.array(b)))
    want = _np_square_distance(a, b)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points(rng):
    pts = rng.normal(size=(3, 10, 3)).astype(np.float32)
    idx = rng.integers(0, 10, size=(3, 4, 5))
    got = np.asarray(ops.index_points(jnp.array(pts), jnp.array(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(3)])
    np.testing.assert_allclose(got, want)


def test_knn_points(rng):
    pts = rng.normal(size=(2, 32, 3)).astype(np.float32)
    idx = np.asarray(ops.knn_points(4, jnp.array(pts)))
    d = _np_square_distance(pts, pts)
    want = np.argsort(d, axis=-1, kind="stable")[..., :4]
    # compare sets (ordering ties can differ)
    got_d = np.take_along_axis(d, idx, axis=-1)
    want_d = np.take_along_axis(d, want, axis=-1)
    np.testing.assert_allclose(np.sort(got_d, -1), np.sort(want_d, -1), atol=1e-5)


def test_knn_self_excludes_self(rng):
    pts = rng.normal(size=(2, 16, 3)).astype(np.float32)
    idx = np.asarray(ops.knn_self(3, jnp.array(pts)))
    own = np.arange(16)[None, :, None]
    assert not (idx == own).any()


def test_fps_greedy_property(rng):
    """Each selected point must be the farthest from the selected set."""
    pts = rng.normal(size=(1, 64, 3)).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample(jnp.array(pts), 8))[0]
    assert idx[0] == 0
    assert len(set(idx.tolist())) == 8
    # replay greedy FPS in numpy
    p = pts[0]
    sel = [0]
    dist = np.full(64, np.inf)
    for step in range(1, 8):
        d = ((p - p[sel[-1]]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        sel.append(int(dist.argmax()))
    assert sel == idx.tolist()


def test_query_ball_point(rng):
    pts = rng.uniform(-1, 1, size=(2, 64, 3)).astype(np.float32)
    centers = pts[:, :8]
    r, ns = 0.5, 16
    idx = np.asarray(
        ops.query_ball_point(r, ns, jnp.array(pts), jnp.array(centers))
    )
    d = _np_square_distance(centers, pts)
    for b in range(2):
        for s in range(8):
            inr = np.where(d[b, s] <= r * r)[0]
            take = inr[:ns]
            if len(take) == 0:
                continue
            want = np.concatenate([take, np.full(ns - len(take), take[0])])
            np.testing.assert_array_equal(idx[b, s], want)


def test_query_ball_point_count_matches_sort(rng):
    """The cumsum-rank ("count") selection is index-identical to the
    full-sort path on dense, sparse, and empty-group regimes, with and
    without validity masks."""
    for radius, ns in [(0.2, 8), (0.5, 16), (1.5, 4), (0.01, 8)]:
        pts = rng.uniform(-1, 1, size=(3, 96, 3)).astype(np.float32)
        centers = pts[:, ::7][:, :12]
        a = ops.query_ball_point(
            radius, ns, jnp.array(pts), jnp.array(centers), method="sort")
        b = ops.query_ball_point(
            radius, ns, jnp.array(pts), jnp.array(centers), method="count")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mask = (rng.uniform(size=(3, 96)) > 0.3).astype(np.float32)
        am = ops.query_ball_point(
            radius, ns, jnp.array(pts), jnp.array(centers),
            mask=jnp.array(mask), method="sort")
        bm = ops.query_ball_point(
            radius, ns, jnp.array(pts), jnp.array(centers),
            mask=jnp.array(mask), method="count")
        np.testing.assert_array_equal(np.asarray(am), np.asarray(bm))


def test_chamfer_hausdorff(rng):
    a = rng.normal(size=(2, 12, 3)).astype(np.float32)
    b = rng.normal(size=(2, 20, 3)).astype(np.float32)
    d = _np_square_distance(a, b)
    c1, c2 = ops.chamfer_distance(jnp.array(a), jnp.array(b))
    np.testing.assert_allclose(np.asarray(c1), d.min(2).mean(1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), d.min(1).mean(1), atol=1e-5)
    h1, h2 = ops.hausdorff_distance(jnp.array(a), jnp.array(b))
    np.testing.assert_allclose(np.asarray(h1), d.min(2).max(1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), d.min(1).max(1), atol=1e-5)


def test_scatter_mean_max(rng):
    feat = rng.normal(size=(2, 30, 4)).astype(np.float32)
    idx = rng.integers(0, 5, size=(2, 30))
    got_mean = np.asarray(ops.scatter_mean_2d(jnp.array(feat), jnp.array(idx), 5))
    got_max = np.asarray(ops.scatter_max_2d(jnp.array(feat), jnp.array(idx), 5))
    for b in range(2):
        for c in range(5):
            m = idx[b] == c
            if m.any():
                np.testing.assert_allclose(
                    got_mean[b, c], feat[b][m].mean(0), atol=1e-5
                )
                np.testing.assert_allclose(
                    got_max[b, c], feat[b][m].max(0), atol=1e-5
                )
            else:
                np.testing.assert_allclose(got_mean[b, c], 0.0)


def test_bilinear_plane_sample_matches_manual():
    # 2x2 plane, 1 channel: corners 0,1,2,3 -> center = mean
    plane = jnp.array([[[[0.0], [1.0]], [[2.0], [3.0]]]])  # [1, 2, 2, 1]
    uv = jnp.array([[[0.5, 0.5], [0.0, 0.0], [1.0, 1.0], [1.0, 0.0]]])
    out = np.asarray(ops.bilinear_plane_sample(plane, uv))[0, :, 0]
    np.testing.assert_allclose(out, [1.5, 0.0, 3.0, 1.0], atol=1e-6)


def test_bilinear_plane_sample_grad():
    plane = jnp.ones((1, 4, 4, 2))
    uv = jnp.array([[[0.3, 0.7]]])
    g = jax.grad(lambda u: ops.bilinear_plane_sample(plane, u).sum())(uv)
    assert np.isfinite(np.asarray(g)).all()


def test_normalize_unit_sphere(rng):
    pc = rng.normal(size=(2, 50, 3)).astype(np.float32) * 5 + 2
    out = np.asarray(ops.normalize_unit_sphere(jnp.array(pc)))
    np.testing.assert_allclose(out.mean(1), 0.0, atol=1e-5)
    r = np.sqrt((out**2).sum(-1)).max(1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)


def test_normalize_unit_cube(rng):
    pc = rng.normal(size=(2, 50, 3)).astype(np.float32) * 3
    out = np.asarray(ops.normalize_unit_cube(jnp.array(pc), padding_scale=0.9))
    extent = out.max(1) - out.min(1)
    np.testing.assert_allclose(extent.max(-1), 0.9, atol=1e-5)


def test_normalize_unit_cube_masked(rng):
    pc = rng.normal(size=(1, 20, 3)).astype(np.float32)
    mask = np.ones((1, 20), np.float32)
    mask[0, 15:] = 0
    pc_out = np.asarray(
        ops.normalize_unit_cube(jnp.array(pc), 0.9, jnp.array(mask))
    )
    ref = np.asarray(ops.normalize_unit_cube(jnp.array(pc[:, :15]), 0.9))
    np.testing.assert_allclose(pc_out[:, :15], ref, atol=1e-5)
