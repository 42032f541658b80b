"""Mesh export/import (utils/meshio.py) — the reference's exporter
capability (`ONet/im2mesh/utils/libmcubes/exporter.py:1-63`)."""

import numpy as np
import pytest

from if_defense_tpu.utils import meshio

VERTS = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
TRIS = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int64)


def test_off_roundtrip(tmp_path):
    p = str(tmp_path / "m.off")
    meshio.export_off(p, VERTS, TRIS)
    v, t = meshio.load_off(p)
    np.testing.assert_allclose(v, VERTS, atol=1e-6)
    np.testing.assert_array_equal(t, TRIS)


def test_obj_roundtrip(tmp_path):
    p = str(tmp_path / "m.obj")
    meshio.export_obj(p, VERTS, TRIS)
    v, t = meshio.load_obj(p)
    np.testing.assert_allclose(v, VERTS, atol=1e-6)
    np.testing.assert_array_equal(t, TRIS)


def test_ply_binary_layout(tmp_path):
    p = str(tmp_path / "m.ply")
    meshio.export_ply(p, VERTS, TRIS)
    raw = open(p, "rb").read()
    header, _, body = raw.partition(b"end_header\n")
    assert b"element vertex 4" in header
    assert b"element face 4" in header
    assert len(body) == 4 * 3 * 4 + 4 * (1 + 3 * 4)
    v = np.frombuffer(body[: 4 * 3 * 4], "<f4").reshape(4, 3)
    np.testing.assert_allclose(v, VERTS, atol=1e-6)


def test_export_mesh_dispatch(tmp_path):
    meshio.export_mesh(str(tmp_path / "m.off"), VERTS, TRIS)
    meshio.export_mesh(str(tmp_path / "m.obj"), VERTS, TRIS)
    meshio.export_mesh(str(tmp_path / "m.ply"), VERTS, TRIS)
    with pytest.raises(ValueError, match="unsupported mesh extension"):
        meshio.export_mesh(str(tmp_path / "m.stl"), VERTS, TRIS)


def test_mesh_from_value_grid_matches_sampler_frame():
    """The exported mesh must live in the same world frame as the fused
    sampler's points: a sphere's mesh vertices and its surface samples
    have the same radius."""
    from if_defense_tpu.implicit.generation import (
        mesh_from_value_grid, sample_value_grid)

    R = 24
    g = np.linspace(-0.55, 0.55, R + 1, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vol = 0.35 - np.sqrt(X**2 + Y**2 + Z**2)  # >0 inside radius 0.35
    verts, tris = mesh_from_value_grid(vol, 0.0, 1.1)
    assert len(verts) and len(tris)
    assert tris.min() >= 0 and tris.max() < len(verts)
    r_mesh = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r_mesh.mean(), 0.35, atol=0.02)
    pts = sample_value_grid(vol, 0.0, 1.1, 256, seed=0)
    r_pts = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r_pts.mean(), r_mesh.mean(), atol=0.02)
