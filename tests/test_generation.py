"""Mesh-generation tests: analytic-SDF isosurface, refinement, sampling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from if_defense_tpu.implicit.generation import (
    eval_points_batched,
    generate_meshes,
    logit_threshold,
    sample_surface,
)
from if_defense_tpu.native import marching_isosurface


def sphere_decode(variables, points, c):
    """Analytic occupancy: logits positive inside radius c (per example)."""
    r = jnp.sqrt(jnp.sum(points**2, axis=-1))
    return 20.0 * (c[:, None] - r)


def test_isosurface_sphere_watertight():
    n = 32
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vol = 0.6 - np.sqrt(X**2 + Y**2 + Z**2)
    verts, tris = marching_isosurface(vol, 0.0)
    assert len(verts) > 100
    world = verts / (n - 1) * 2 - 1
    r = np.sqrt((world**2).sum(-1))
    np.testing.assert_allclose(r, 0.6, atol=0.01)
    # watertight: undirected edges used exactly twice, directed once
    from collections import Counter
    und, dr = Counter(), Counter()
    for t in tris:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            und[(min(a, b), max(a, b))] += 1
            dr[(a, b)] += 1
    assert set(und.values()) == {2}
    assert max(dr.values()) == 1


def test_eval_points_batched_chunking():
    c = jnp.array([0.3, 0.4])
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-0.5, 0.5, (2, 1000, 3)),
        jnp.float32)
    full = sphere_decode(None, pts, c)
    chunked = eval_points_batched(sphere_decode, None, c, pts, chunk=128)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("refine", [False, True])
def test_generate_meshes_sphere(refine):
    c = jnp.array([0.25, 0.35])  # two spheres of different radii
    meshes = generate_meshes(
        sphere_decode, None, c,
        threshold=0.5, resolution0=16, upsample=2, refine=refine,
        max_active=2048, chunk=4096,
    )
    assert len(meshes) == 2
    for (verts, tris), radius in zip(meshes, [0.25, 0.35]):
        assert len(tris) > 50
        r = np.sqrt((verts**2).sum(-1))
        # iso at p=0.5 -> logit 0 -> surface at |p| = radius
        tol = 0.08 if not refine else 0.04
        np.testing.assert_allclose(r.mean(), radius, atol=tol)


def test_refinement_improves_accuracy():
    c = jnp.array([0.3])
    err = {}
    for refine in (False, True):
        (verts, _), = generate_meshes(
            sphere_decode, None, c, threshold=0.5, resolution0=12,
            upsample=4, refine=refine, max_active=2048, chunk=4096,
        )
        r = np.sqrt((verts**2).sum(-1))
        err[refine] = np.abs(r - 0.3).mean()
    assert err[True] < err[False]


def test_sample_surface_on_sphere():
    c = jnp.array([0.3])
    (verts, tris), = generate_meshes(
        sphere_decode, None, c, threshold=0.5, resolution0=16,
        upsample=2, refine=True, max_active=2048, chunk=4096,
    )
    pts = sample_surface(verts, tris, 500, np.random.default_rng(0))
    assert pts.shape == (500, 3)
    r = np.sqrt((pts**2).sum(-1))
    np.testing.assert_allclose(r.mean(), 0.3, atol=0.03)


def test_sample_surface_empty_mesh_raises():
    with pytest.raises(ValueError):
        sample_surface(np.zeros((0, 3)), np.zeros((0, 3), np.int64), 10,
                       np.random.default_rng(0))


def test_logit_threshold():
    assert abs(logit_threshold(0.5)) < 1e-9
    assert logit_threshold(0.2) < 0


def test_simplify_mesh_preserves_sphere():
    from if_defense_tpu.native import marching_isosurface, simplify_mesh

    n = 32
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vol = 0.6 - np.sqrt(X**2 + Y**2 + Z**2)
    verts, tris = marching_isosurface(vol, 0.0)
    sv, st = simplify_mesh(verts, tris, target_faces=len(tris) // 6)
    assert len(st) <= len(tris) // 4  # made real progress
    world = sv / (n - 1) * 2 - 1
    r = np.sqrt((world**2).sum(-1))
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)


def test_generate_meshes_with_simplify():
    c = jnp.array([0.3])
    (verts, tris), = generate_meshes(
        sphere_decode, None, c, threshold=0.5, resolution0=16,
        upsample=2, refine=False, chunk=4096, simplify_nfaces=200,
    )
    assert len(tris) <= 400
    r = np.sqrt((verts**2).sum(-1))
    np.testing.assert_allclose(r.mean(), 0.3, atol=0.05)
