"""Hard synthetic family: geometry, normals, schema, sampling density.

The discriminative benchmark (tools/accuracy_benchmark.py) rests on this
generator; these tests pin its contracts.
"""

import numpy as np
import pytest

from tools.synthetic_dataset import (
    HARD_CLASSES,
    _hard_f,
    _hard_normals,
    _hard_surface,
    make_classification_npz,
    make_occupancy_npz,
)


@pytest.mark.parametrize("cls", HARD_CLASSES)
def test_surface_points_on_level_set_with_outward_normals(cls):
    rng = np.random.default_rng(0)
    p, params = _hard_surface(cls, 256, rng)
    f = _hard_f(cls, params, p)
    assert np.abs(f).max() < 1e-6
    n = _hard_normals(cls, params, p)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)
    eps = 1e-3
    assert ((_hard_f(cls, params, p + eps * n) > 0)
            & (_hard_f(cls, params, p - eps * n) < 0)).all()


def test_pairs_share_coarse_scale_but_differ():
    """Pair members (2i, 2i+1) draw from the same coarse parameter
    distributions; their surfaces differ by a bounded smooth amount."""
    rng = np.random.default_rng(1)
    for a, b in ((0, 1), (2, 3), (4, 5), (6, 7)):
        pa, _ = _hard_surface(HARD_CLASSES[a], 512, rng)
        pb, _ = _hard_surface(HARD_CLASSES[b], 512, rng)
        # same order of magnitude extents
        ra = np.linalg.norm(pa, axis=1).max()
        rb = np.linalg.norm(pb, axis=1).max()
        assert 0.3 < ra < 1.5 and 0.3 < rb < 1.5


def test_classification_npz_schema(tmp_path):
    path = make_classification_npz(
        str(tmp_path / "hard.npz"), train_per_class=3, test_per_class=2,
        num_points=64, seed=0, family="hard")
    d = np.load(path)
    assert d["train_pc"].shape == (24, 64, 3)
    # test clouds carry unit normals (ModelNet40Normal* schema)
    assert d["test_pc"].shape == (16, 64, 6)
    nrm = d["test_pc"][..., 3:]
    np.testing.assert_allclose(
        np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)
    # targeted attacks aim at the confusable pair partner
    np.testing.assert_array_equal(
        d["target_label"], d["test_label"] ^ 1)
    # xyz unit-sphere normalised
    r = np.linalg.norm(d["test_pc"][..., :3], axis=-1).max(axis=1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)


def test_occupancy_npz_consistency(tmp_path):
    path = make_occupancy_npz(
        str(tmp_path / "occ.npz"), per_class=2, surface_n=128,
        query_n=256, seed=1, family="hard")
    d = np.load(path)
    assert d["pointcloud"].shape == (16, 128, 3)
    assert d["points"].shape == (16, 256, 3)
    occ = d["points_occ"]
    assert occ.shape == (16, 256)
    # mix of inside and outside labels overall
    assert 0.02 < occ.mean() < 0.8


def test_uniform_sampling_density_on_sphere():
    """The importance resampler undoes the ray-sampling bias: on a
    sphere, octant point counts are near-uniform (a biased sampler
    would not matter for a sphere — so check an ellipsoid's
    pole-vs-equator balance instead of octants)."""
    rng = np.random.default_rng(3)
    n = 8192
    # force an ellipsoid with known aspect
    from tools import synthetic_dataset as S

    params = {"r": 0.8, "q": 0.8}
    m = n * 4
    d = S._unit_dirs(rng, m)
    lo = np.zeros(m)
    hi = np.full(m, 3.0)
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        inside = S._hard_f("ellipsoid", params, mid[:, None] * d) < 0
        lo = np.where(inside, mid, lo)
        hi = np.where(inside, hi, mid)
    t = 0.5 * (lo + hi)
    p = t[:, None] * d
    nrm = S._hard_normals("ellipsoid", params, p)
    cos = np.abs(np.sum(nrm * d, axis=1))
    w = t * t / np.maximum(cos, 0.05)
    idx = rng.choice(m, size=n, p=w / w.sum())
    pts = p[idx]
    # area-uniform: the fraction of points with |y| > 0.5 * (q*r) should
    # match the analytic area fraction ~ computed by dense MC on the
    # surface via fine param integration; compare resampled vs a
    # heavily-oversampled weighted estimate
    frac = np.mean(np.abs(pts[:, 1]) > 0.5 * params["q"] * params["r"])
    ref = float(np.sum(w * (np.abs(p[:, 1])
                            > 0.5 * params["q"] * params["r"])) / w.sum())
    assert abs(frac - ref) < 0.03
