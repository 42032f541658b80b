"""Build an occupancy training dataset from watertight meshes.

Functional equivalent of the reference's offline pipeline
(`ONet/data_proc/build.sh` + `make_watertight.py` + sample_mesh step):
given watertight OFF meshes (one directory per class, as produced by
Manifold), emit one npz with
    pointcloud [S, N, 3]   surface samples (normalised to the padded cube)
    points     [S, P, 3]   uniform query points in the padded cube
    points_occ [S, P]      inside/outside labels
    labels     [S]         class index

Inside-testing uses +z ray-crossing parity with a 2D (x, y) triangle
binning (no external geometry deps). Meshes are normalised the ONet way:
centred, max extent scaled to 1, queries drawn from the (1 + padding) box.

Usage:
    python tools/build_occupancy_dataset.py --mesh_root MN40_watertight \
        --out occ_mn40.npz [--surface_n 10000 --query_n 10000]

For environments without ModelNet40 meshes, --synthetic N generates N
random union-of-spheres shapes (analytic occupancy) — enough to exercise
the full training + defense pipeline end-to-end.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_off(path: str):
    """Minimal OFF mesh reader -> (verts [V,3] f32, faces [F,3] i64)."""
    with open(path) as f:
        tokens = f.read().split()
    i = 0
    if tokens[0] == "OFF":
        i = 1
    nv, nf = int(tokens[i]), int(tokens[i + 1])
    i += 3
    verts = np.array(tokens[i : i + 3 * nv], np.float32).reshape(nv, 3)
    i += 3 * nv
    faces = []
    for _ in range(nf):
        k = int(tokens[i])
        poly = [int(t) for t in tokens[i + 1 : i + 1 + k]]
        i += 1 + k
        for j in range(1, k - 1):  # fan-triangulate
            faces.append([poly[0], poly[j], poly[j + 1]])
    return verts, np.array(faces, np.int64)


def normalize_mesh(verts: np.ndarray) -> np.ndarray:
    """Centre and scale the max extent to 1 (ONet unit-cube convention)."""
    center = (verts.max(0) + verts.min(0)) / 2
    v = verts - center
    scale = (verts.max(0) - verts.min(0)).max()
    return v / max(scale, 1e-12)


def sample_mesh_surface(verts, faces, n, rng):
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    probs = areas / areas.sum()
    choice = rng.choice(len(faces), size=n, p=probs)
    u, v = rng.random((n, 1)), rng.random((n, 1))
    flip = (u + v) > 1
    u, v = np.where(flip, 1 - u, u), np.where(flip, 1 - v, v)
    return v0[choice] + u * (v1[choice] - v0[choice]) + v * (
        v2[choice] - v0[choice])


def occupancy_ray_parity(verts, faces, queries, grid=32):
    """Inside test by +z ray-crossing parity with (x, y) triangle bins."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    lo = verts.min(0)[:2]
    hi = verts.max(0)[:2]
    span = np.maximum(hi - lo, 1e-9)

    def cell_of(xy):
        c = np.floor((xy - lo) / span * grid).astype(int)
        return np.clip(c, 0, grid - 1)

    tmin = cell_of(np.minimum(np.minimum(v0[:, :2], v1[:, :2]), v2[:, :2]))
    tmax = cell_of(np.maximum(np.maximum(v0[:, :2], v1[:, :2]), v2[:, :2]))
    bins = [[[] for _ in range(grid)] for _ in range(grid)]
    for t in range(len(faces)):
        for cx in range(tmin[t, 0], tmax[t, 0] + 1):
            for cy in range(tmin[t, 1], tmax[t, 1] + 1):
                bins[cx][cy].append(t)

    occ = np.zeros(len(queries), bool)
    qc = cell_of(queries[:, :2])
    for qi, q in enumerate(queries):
        tris = bins[qc[qi, 0]][qc[qi, 1]]
        if not tris:
            continue
        t = np.array(tris)
        a, b, c = v0[t], v1[t], v2[t]
        # 2D barycentric in (x, y)
        d = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (
            c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1])
        ok = np.abs(d) > 1e-12
        w0 = ((b[:, 1] - c[:, 1]) * (q[0] - c[:, 0]) +
              (c[:, 0] - b[:, 0]) * (q[1] - c[:, 1])) / np.where(ok, d, 1)
        w1 = ((c[:, 1] - a[:, 1]) * (q[0] - c[:, 0]) +
              (a[:, 0] - c[:, 0]) * (q[1] - c[:, 1])) / np.where(ok, d, 1)
        w2 = 1 - w0 - w1
        hit = ok & (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = w0 * a[:, 2] + w1 * b[:, 2] + w2 * c[:, 2]
        crossings = int((hit & (z > q[2])).sum())
        occ[qi] = crossings % 2 == 1
    return occ


def synthetic_shape(rng, surface_n, query_n, padding):
    """Union of 2-4 random spheres with analytic occupancy."""
    k = rng.integers(2, 5)
    centers = rng.uniform(-0.25, 0.25, (k, 3))
    radii = rng.uniform(0.1, 0.25, k)
    # surface: sample sphere points, keep those not inside another sphere
    pts = []
    while sum(len(p) for p in pts) < surface_n:
        i = rng.integers(0, k)
        d = rng.normal(size=(surface_n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        p = centers[i] + radii[i] * d
        inside_other = np.zeros(len(p), bool)
        for j in range(k):
            if j != i:
                inside_other |= (
                    np.linalg.norm(p - centers[j], axis=1) < radii[j])
        pts.append(p[~inside_other])
    surface = np.concatenate(pts)[:surface_n]
    queries = rng.uniform(-0.5 * (1 + padding), 0.5 * (1 + padding),
                          (query_n, 3))
    occ = np.zeros(query_n, bool)
    for j in range(k):
        occ |= np.linalg.norm(queries - centers[j], axis=1) < radii[j]
    return surface.astype(np.float32), queries.astype(np.float32), occ


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mesh_root", default=None,
                   help="root dir of watertight OFF meshes (class subdirs)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic shapes instead")
    p.add_argument("--out", required=True)
    p.add_argument("--surface_n", type=int, default=10000)
    p.add_argument("--query_n", type=int, default=10000)
    p.add_argument("--padding", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    rng = np.random.default_rng(args.seed)

    pcs, qs, occs, labels = [], [], [], []
    if args.synthetic:
        for _ in range(args.synthetic):
            s, q, o = synthetic_shape(
                rng, args.surface_n, args.query_n, args.padding)
            pcs.append(s), qs.append(q), occs.append(o), labels.append(0)
    else:
        classes = sorted(os.listdir(args.mesh_root))
        for ci, cls in enumerate(classes):
            croot = os.path.join(args.mesh_root, cls)
            for fname in sorted(os.listdir(croot)):
                if not fname.endswith(".off"):
                    continue
                verts, faces = load_off(os.path.join(croot, fname))
                verts = normalize_mesh(verts)
                surface = sample_mesh_surface(
                    verts, faces, args.surface_n, rng)
                queries = rng.uniform(
                    -0.5 * (1 + args.padding), 0.5 * (1 + args.padding),
                    (args.query_n, 3)).astype(np.float32)
                occ = occupancy_ray_parity(verts, faces, queries)
                pcs.append(surface.astype(np.float32))
                qs.append(queries)
                occs.append(occ)
                labels.append(ci)

    np.savez_compressed(
        args.out,
        pointcloud=np.stack(pcs),
        points=np.stack(qs),
        points_occ=np.stack(occs).astype(np.float32),
        labels=np.array(labels, np.int32),
    )
    print(f"wrote {len(pcs)} shapes to {args.out}")
    return args.out


if __name__ == "__main__":
    main()
