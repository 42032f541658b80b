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


def _sphere_vol(n=65, radius=0.4, sharp=20.0, box=1.1):
    g = (np.arange(n) / (n - 1) - 0.5) * box
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return (sharp * (radius - np.sqrt(X**2 + Y**2 + Z**2))).astype(
        np.float32)


def test_sample_value_grid_matches_mesh_sampling():
    """The fused native sampler (sample.cpp: triangle soup + in-kernel
    area sampling) draws from the SAME surface as marching + sample: the
    radius distribution on an analytic sphere matches to grid tolerance,
    f32 and int8-quantised wire alike."""
    from if_defense_tpu.implicit.generation import (
        quantize_wire_int8,
        sample_value_grid,
    )

    vol = _sphere_vol()
    iso = 0.0
    box = 1.1

    # reference path: indexed mesh + python area sampling
    vol_pad = np.pad(vol, 1, constant_values=-1e6)
    verts, tris = marching_isosurface(vol_pad, iso)
    pts_ref = sample_surface(
        verts.astype(np.float32), tris, 4000, np.random.default_rng(0))
    world_ref = ((pts_ref - 1.0) / (vol.shape[0] - 1) - 0.5) * box
    r_ref = np.linalg.norm(world_ref, axis=1)

    pts = sample_value_grid(vol, iso, box, 4000, seed=1)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r.mean(), r_ref.mean(), atol=1e-3)
    np.testing.assert_allclose(r.max(), r_ref.max(), atol=2e-3)
    np.testing.assert_allclose(r.min(), r_ref.min(), atol=2e-3)

    # int8 quantised grid marches directly (iso at q == 0); vertices
    # shift by <= one quantum like the dequantise-then-march path
    q = np.asarray(quantize_wire_int8(jnp.asarray(vol), iso))
    pts_q = sample_value_grid(q, iso, box, 4000, seed=2)
    rq = np.linalg.norm(pts_q, axis=1)
    np.testing.assert_allclose(rq.mean(), r_ref.mean(), atol=3e-3)


def test_sparse_wire_matches_dense_int8():
    """Sparse active-block wire reproduces the dense int8 wire EXACTLY:
    same signs everywhere, identical surface samples (crossing-cube
    corner values are transferred exactly; filler only fills uniform
    regions the marcher never interpolates in)."""
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import (
        assemble_sparse_grid,
        make_convonet_dense_eval,
        make_convonet_sparse_eval,
        quantize_wire_int8,
        sample_value_grid,
    )

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(11)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(3), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 64, 3)), jnp.float32)
    c = model.apply(variables, pc, method="encode_inputs")

    rf, box, thr = 16, 1.1, 0.2
    iso = logit_threshold(thr)
    dense_fn = make_convonet_dense_eval(model, rf, box)
    q_dense = np.asarray(quantize_wire_int8(dense_fn(variables, c), iso))

    sparse_fn = make_convonet_sparse_eval(model, rf, box, thr, block=4,
                                          max_blocks=128,
                                          auto_demote=False)
    meta = sparse_fn.sparse_meta
    out = {k: np.asarray(v) for k, v in sparse_fn(variables, c).items()}

    crossings = 0
    for b in range(3):
        vol = assemble_sparse_grid(
            out, b, block=meta["block"], nb=meta["nb"], rp=meta["rp"])
        assert vol.shape == q_dense[b].shape
        np.testing.assert_array_equal(vol > 0, q_dense[b] > 0)
        try:
            s_dense = sample_value_grid(q_dense[b], iso, box, 256, seed=b)
            crossings += 1
        except ValueError:
            with pytest.raises(ValueError):
                sample_value_grid(vol, iso, box, 256, seed=b)
            continue
        s_sparse = sample_value_grid(vol, iso, box, 256, seed=b)
        np.testing.assert_array_equal(s_dense, s_sparse)
    assert crossings > 0  # the random field must actually have surface


def test_sparse_wire_adaptive_bucket_and_cap():
    """The uncapped sparse wire sizes its transfer to the batch's actual
    active-block count (next power of two, floor 64, ceil nb^3) — no
    static budget to tune, no clipping. A user cap below the need still
    raises in assemble_sparse_grid."""
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import (
        assemble_sparse_grid,
        make_convonet_sparse_eval,
    )

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(12)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(4), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 64, 3)), jnp.float32)
    c = model.apply(variables, pc, method="encode_inputs")

    rf, box, thr = 16, 1.1, 0.2
    sparse_fn = make_convonet_sparse_eval(model, rf, box, thr, block=4,
                                          auto_demote=False)
    meta = sparse_fn.sparse_meta
    out = sparse_fn(variables, c)
    need = int(np.asarray(out["n_need"]).max())
    m = out["blocks"].shape[1]
    nb3 = meta["nb"] ** 3
    assert need <= m <= nb3          # budget always fits the need
    if need > 0:
        assert m <= max(64, 2 * need)  # ...and doesn't grossly overshoot
    # every genuinely needed block made it into the gathered set
    for b in range(2):
        assemble_sparse_grid(out, b, block=meta["block"],
                             nb=meta["nb"], rp=meta["rp"])

    # a hard cap below the need must surface as the documented error
    if need > 1:
        capped = make_convonet_sparse_eval(model, rf, box, thr, block=4,
                                           max_blocks=need - 1,
                                           auto_demote=False)
        out_c = capped(variables, c)
        worst = int(np.argmax(np.asarray(out_c["n_need"])))
        with pytest.raises(RuntimeError, match="sparse wire clipped"):
            assemble_sparse_grid(out_c, worst, block=meta["block"],
                                 nb=meta["nb"], rp=meta["rp"])


def test_sample_value_grid_degenerate_raises():
    from if_defense_tpu.implicit.generation import sample_value_grid

    empty = np.full((17, 17, 17), -5.0, np.float32)
    with pytest.raises(ValueError):
        sample_value_grid(empty, 0.0, 1.1, 16, seed=0)


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


def test_lattice_eval_matches_decode():
    """The lattice fast path (resize-once + gather) must equal the exact
    bilinear decode at lattice points."""
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import (
        eval_points_batched,
        make_convonet_lattice_eval,
    )

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(0)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 64, 3)), jnp.float32)
    c = model.apply(variables, pc, method="encode_inputs")

    rf, box = 8, 1.1
    fidx = jnp.asarray(
        rng.integers(0, rf + 1, (3, 40, 3)), jnp.int32)
    pts = (fidx.astype(jnp.float32) / rf - 0.5) * box

    def decode_fn(v, p, cc):
        return model.apply(v, p, cc, method="decode")

    exact = eval_points_batched(decode_fn, variables, c, pts, 64)
    lattice_fn = make_convonet_lattice_eval(model, rf, box, chunk=32)
    fast = lattice_fn(variables, c, fidx)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(exact), rtol=2e-4, atol=2e-5)


def test_generate_meshes_lattice_path_matches_exact():
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import (
        make_convonet_lattice_eval,
    )

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(1)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 64, 3)), jnp.float32)
    c = model.apply(variables, pc, method="encode_inputs")

    def decode_fn(v, p, cc):
        return model.apply(v, p, cc, method="decode")

    kw = dict(threshold=0.4, resolution0=8, upsample=2, chunk=512,
              max_active=64)
    ref = generate_meshes(decode_fn, variables, c, **kw)
    lattice_fn = make_convonet_lattice_eval(model, 16, 1.1, chunk=512)
    fast = generate_meshes(decode_fn, variables, c,
                           lattice_eval_fn=lattice_fn, **kw)
    for (v0, t0), (v1, t1) in zip(ref, fast):
        assert t0.shape == t1.shape
        # values only differ by bf16 rounding on the wire + reassociation
        if len(v0):
            np.testing.assert_allclose(v0, v1, atol=2e-2)


def test_dense_lattice_eval_matches_decode():
    """Gather-free dense slab evaluation must equal the exact bilinear
    decode at every lattice point."""
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import (
        eval_points_batched,
        make_convonet_dense_eval,
        make_grid,
    )

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(2)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 64, 3)), jnp.float32)
    c = model.apply(variables, pc, method="encode_inputs")

    rf, box = 8, 1.1
    dense_fn = make_convonet_dense_eval(model, rf, box)
    dense = np.asarray(dense_fn(variables, c))        # [B, rp, rp, rp]

    grid = make_grid(rf, box)
    pts = jnp.broadcast_to(
        jnp.asarray(grid.reshape(1, -1, 3)), (3, (rf + 1) ** 3, 3))

    def decode_fn(v, p, cc):
        return model.apply(v, p, cc, method="decode")

    exact = np.asarray(eval_points_batched(
        decode_fn, variables, c, pts, 128)).reshape(dense.shape)
    np.testing.assert_allclose(dense, exact, rtol=2e-4, atol=2e-5)


def test_generate_meshes_dense_path_matches_exact():
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import make_convonet_dense_eval

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(3)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 64, 3)), jnp.float32)
    c = model.apply(variables, pc, method="encode_inputs")

    def decode_fn(v, p, cc):
        return model.apply(v, p, cc, method="decode")

    kw = dict(threshold=0.4, resolution0=8, upsample=2, chunk=512)
    # exact reference: dense fine grid via refine=False at Rf
    ref = generate_meshes(decode_fn, variables, c, threshold=0.4,
                          resolution0=16, upsample=1, refine=False,
                          chunk=512)
    dense_fn = make_convonet_dense_eval(model, 16, 1.1)
    fast = generate_meshes(decode_fn, variables, c,
                           dense_eval_fn=dense_fn, **kw)
    for (v0, t0), (v1, t1) in zip(ref, fast):
        assert t0.shape == t1.shape
        if len(v0):
            np.testing.assert_allclose(v0, v1, atol=2e-2)


def test_dense_path_int8_wire_close_to_bf16():
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import make_convonet_dense_eval

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(4)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 64, 3)), jnp.float32)
    c = model.apply(variables, pc, method="encode_inputs")

    def decode_fn(v, p, cc):
        return model.apply(v, p, cc, method="decode")

    dense_fn = make_convonet_dense_eval(model, 16, 1.1)
    kw = dict(threshold=0.4, resolution0=8, upsample=2,
              dense_eval_fn=dense_fn)
    ref = generate_meshes(decode_fn, variables, c, wire="bf16", **kw)
    q = generate_meshes(decode_fn, variables, c, wire="int8", **kw)
    cell = 1.1 / 16
    for (v0, t0), (v1, t1) in zip(ref, q):
        # same topology, vertices within one fine cell
        assert abs(len(t0) - len(t1)) <= max(10, len(t0) // 20)
        if len(v0) and len(v0) == len(v1):
            assert np.abs(v0 - v1).max() < cell


def test_dense_eval_gate_requires_all_three_planes():
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import make_convonet_dense_eval

    assert make_convonet_dense_eval(
        ConvOccupancyNetwork(plane_type=("xz",)), 8, 1.1) is None
    assert make_convonet_dense_eval(
        ConvOccupancyNetwork(plane_type=("grid",)), 8, 1.1) is None
    assert make_convonet_dense_eval(
        ConvOccupancyNetwork(), 8, 1.1) is not None


def test_refine_int8_wire_signs_and_quantum():
    """int8 refinement wire (ONet / grid-latent path): occupancy signs
    match the default wire exactly at every fine-grid point and values
    shift by <= one quantum (1/16) — the same contract the dense int8
    wire proves in test_generate_meshes_wire_int8."""
    from if_defense_tpu.implicit.generation import compute_value_grids

    c = jnp.array([0.27, 0.33])
    kw = dict(threshold=0.5, resolution0=12, upsample=4,
              max_active=4096, chunk=4096)
    v_ref, iso = compute_value_grids(sphere_decode, None, c,
                                     wire="bf16", **kw)
    v_q, iso_q = compute_value_grids(sphere_decode, None, c,
                                     wire="int8", **kw)
    assert iso == iso_q
    assert v_q.dtype == np.float32 and v_q.shape == v_ref.shape
    np.testing.assert_array_equal(v_q > iso, v_ref > iso)
    # one quantum + bf16 slack inside the quantiser's range; outside it
    # the int8 wire saturates at iso +- 127/16 (signs still exact above,
    # and saturated values only ever feed the sign test)
    unclipped = np.abs(v_ref - iso) < 127.0 / 16 - 1.0 / 16
    assert np.abs(v_q - v_ref)[unclipped].max() <= 1.0 / 16 + 1e-2


def test_refine_adaptive_bucket_matches_full_budget():
    """The adaptive power-of-two voxel bucket is output-invariant: any
    budget >= the true active count assembles the identical fine grid
    (padding slots were always masked out)."""
    from if_defense_tpu.implicit.generation import (
        active_voxel_refinement, eval_points_batched, logit_threshold,
        make_grid,
    )

    c = jnp.array([0.3])
    R0, U, box = 10, 2, 1.1
    iso = logit_threshold(0.5)
    grid = make_grid(R0, box)
    pts = jnp.broadcast_to(jnp.asarray(grid.reshape(1, -1, 3)),
                           (1, (R0 + 1) ** 3, 3))
    coarse = eval_points_batched(sphere_decode, None, c, pts, 512)
    coarse = coarse.reshape(1, R0 + 1, R0 + 1, R0 + 1)

    tm_small, tm_big = {}, {}
    fine_small = active_voxel_refinement(
        sphere_decode, None, c, coarse, R0, U, box, iso,
        max_active=R0 ** 3, chunk=512, timings=tm_small)
    fine_big = active_voxel_refinement(
        sphere_decode, None, c, coarse, R0, U, box, iso,
        max_active=R0 ** 3, chunk=4096, timings=tm_big)
    np.testing.assert_array_equal(fine_small, fine_big)
    # the bucket followed the actual surface size, not the budget
    assert tm_small["refine_k"] == tm_big["refine_k"] <= 512
    assert tm_small["refine_k"] < R0 ** 3

    # a tight cap still clips (legacy static-budget semantics)
    tm_cap = {}
    active_voxel_refinement(
        sphere_decode, None, c, coarse, R0, U, box, iso,
        max_active=64, chunk=512, timings=tm_cap)
    assert tm_cap["refine_k"] == 64


def test_refine_int8_wire_is_smaller():
    from if_defense_tpu.implicit.generation import (
        active_voxel_refinement, eval_points_batched, logit_threshold,
        make_grid,
    )

    c = jnp.array([0.3])
    R0, U, box = 10, 2, 1.1
    iso = logit_threshold(0.5)
    grid = make_grid(R0, box)
    pts = jnp.broadcast_to(jnp.asarray(grid.reshape(1, -1, 3)),
                           (1, (R0 + 1) ** 3, 3))
    coarse = eval_points_batched(sphere_decode, None, c, pts, 512)
    coarse = coarse.reshape(1, R0 + 1, R0 + 1, R0 + 1)

    tm8, tm16 = {}, {}
    f8 = active_voxel_refinement(
        sphere_decode, None, c, coarse, R0, U, box, iso,
        max_active=512, chunk=512, timings=tm8, wire="int8")
    f16 = active_voxel_refinement(
        sphere_decode, None, c, coarse, R0, U, box, iso,
        max_active=512, chunk=512, timings=tm16, wire="bf16")
    assert tm8["wire_bytes"] < tm16["wire_bytes"]
    np.testing.assert_array_equal(f8 > iso, f16 > iso)


def test_sparse_wire_auto_demotes_to_dense_int8():
    """On an active-everywhere field the sparse wire would ship >= the
    dense grid's bytes (power-of-two bucket -> nb^3); the evaluator must
    auto-demote to the dense int8 wire, with the IDENTICAL int8
    quantisation the dense wire produces (BENCH_MESH r4 inversion fix)."""
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit.generation import (
        make_convonet_dense_eval,
        make_convonet_sparse_eval,
        quantize_wire_int8,
    )

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(13)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(5), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 64, 3)), jnp.float32)
    c = model.apply(variables, pc, method="encode_inputs")

    rf, box, thr = 16, 1.1, 0.2
    iso = logit_threshold(thr)
    dense_fn = make_convonet_dense_eval(model, rf, box)
    q_dense = np.asarray(quantize_wire_int8(dense_fn(variables, c), iso))

    # a random-init decoder's field is sign-mixed nearly everywhere:
    # need > 64 blocks at block=4 (nb^3 = 125) trips the byte-parity
    # demotion threshold m*64 + 125 >= 17^3
    sparse_fn = make_convonet_sparse_eval(model, rf, box, thr, block=4)
    out = sparse_fn(variables, c)
    if "dense" not in out:
        # field happened to be compact enough that sparse still wins —
        # the demotion must then NOT fire (byte check is the contract)
        m = out["blocks"].shape[1]
        assert m * 4**3 + 5**3 < 17**3
        return
    np.testing.assert_array_equal(np.asarray(out["dense"]), q_dense)
