"""Per-phase profile of the ONet-Mesh generation path on real TPU.

Times each stage of `generate_meshes` separately so the mesh-defense
bottleneck is visible (reference anchor: the sequential MISE loop in
`ONet/im2mesh/onet/generation.py:88-136`):

  - encode (once per batch)
  - dense coarse occupancy eval (resolution0^3)
  - refinement: device eval / device->host transfer / native assembly
  - marching tetrahedra (native)
  - surface resampling (+ optional QEM simplification)

Usage: python tools/profile_mesh.py [--batch 40] [--resolution0 32]
       [--upsample 4] [--simplify_nfaces 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=40)
    p.add_argument("--resolution0", type=int, default=32)
    p.add_argument("--upsample", type=int, default=4)
    p.add_argument("--max_active", type=int, default=8192)
    p.add_argument("--chunk", type=int, default=8192)
    p.add_argument("--simplify_nfaces", type=int, default=0,
                   help="QEM target per mesh (0 = off)")
    p.add_argument("--wire", default="bf16",
                   choices=["bf16", "int8", "sparse"])
    p.add_argument("--sparse_blocks", type=int, default=None)
    p.add_argument("--sample_mode", default="mesh",
                   choices=["mesh", "direct"],
                   help="direct = fused native marching+sampling "
                        "(sample.cpp), skipping the indexed mesh")
    p.add_argument("--mode", default="dense",
                   choices=["dense", "lattice", "exact"],
                   help="dense = gather-free slab eval (product path); "
                        "lattice = refine via row gathers; exact = "
                        "refine via selection einsums")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.implicit import generation as G
    from if_defense_tpu.native import marching_isosurface, simplify_mesh

    B = args.batch
    R0, U = args.resolution0, args.upsample
    model = ConvOccupancyNetwork()
    rng = np.random.default_rng(0)
    init_pc = jnp.zeros((2, 64, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    # sphere-ish clouds so the decoder yields non-trivial surfaces
    pts = rng.normal(size=(B, 600, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True) * 3.0
    pc = jnp.asarray(pts)

    encode = jax.jit(lambda v, x: model.apply(v, x, method="encode_inputs"))

    def decode_fn(v, p, c):
        return model.apply(v, p, c, method="decode")

    iso = G.logit_threshold(0.2)
    box_size = 1.0 + G.DEFAULT_PADDING

    print(f"mesh profile: B={B} R0={R0} U={U} max_active={args.max_active}")

    # encode
    t0 = time.perf_counter()
    c = encode(variables, pc)
    sync(jax.tree_util.tree_leaves(c)[0])
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    c = encode(variables, pc)
    sync(jax.tree_util.tree_leaves(c)[0])
    print(f"encode:            {time.perf_counter()-t0:7.2f} s "
          f"(cold {t_cold:.2f})")

    if args.mode == "dense" and args.wire == "sparse":
        # sparse active-block wire + fused direct sampling (the fast
        # ConvONet product path)
        sparse_fn = G.make_convonet_sparse_eval(
            model, R0 * U, box_size, max_blocks=args.sparse_blocks,
            auto_demote=False)  # profile the block path even on noisy
        #                         fields (product auto-demotes there)
        meta = sparse_fn.sparse_meta
        out = sparse_fn(variables, c)
        sync(out["n_need"])                           # incl. compile
        t0 = time.perf_counter()
        out = sparse_fn(variables, c)
        sync(out["n_need"])
        t1 = time.perf_counter()
        out_np = {k: np.asarray(v) for k, v in out.items()}
        t2 = time.perf_counter()
        nbytes = sum(a.size * a.dtype.itemsize for a in out_np.values())
        print(f"sparse eval:       {t1-t0:7.2f} s; transfer "
              f"{t2-t1:7.2f} s ({nbytes/1e6:.1f} MB; "
              f"n_need max {out_np['n_need'].max()} of M={meta['M']})")
        t0 = time.perf_counter()
        n_ok = 0
        for b in range(B):
            vol = G.assemble_sparse_grid(
                out_np, b, block=meta["block"], nb=meta["nb"],
                rp=meta["rp"])
            try:
                G.sample_value_grid(vol, meta["iso"], box_size, 1024,
                                    seed=b)
                n_ok += 1
            except ValueError:
                pass
        print(f"assemble+sample:   {time.perf_counter()-t0:7.2f} s "
              f"({n_ok}/{B} ok)")
        raise SystemExit(0)

    if args.mode == "dense":
        # gather-free dense slab evaluation (the ConvONet product path)
        dense_fn = G.make_convonet_dense_eval(model, R0 * U, box_size)

        # reuse the product quantiser (away-from-zero rounding) so the
        # profiled marching topology matches generate_meshes exactly
        def to_wire(v):
            if args.wire == "int8":
                return G.quantize_wire_int8(v, iso)
            return v.astype(jnp.bfloat16)

        vals_dev = to_wire(dense_fn(variables, c))
        sync(vals_dev)                                # incl. compile
        t0 = time.perf_counter()
        vals_dev = to_wire(dense_fn(variables, c))
        sync(vals_dev)
        t1 = time.perf_counter()
        raw = np.asarray(vals_dev)
        t2 = time.perf_counter()
        nbytes = vals_dev.size * vals_dev.dtype.itemsize
        if args.sample_mode == "direct":
            t_s = time.perf_counter()
            n_ok = 0
            for b in range(B):
                try:
                    G.sample_value_grid(
                        raw[b] if raw.dtype == np.int8
                        else raw[b].astype(np.float32),
                        iso, box_size, 1024, seed=b)
                    n_ok += 1
                except ValueError:
                    pass
            print(f"dense eval:        {t1-t0:7.2f} s; transfer "
                  f"{t2-t1:7.2f} s ({nbytes/1e6:.0f} MB {args.wire}); "
                  f"direct sample {time.perf_counter()-t_s:7.2f} s "
                  f"({n_ok}/{B} ok)")
            raise SystemExit(0)
        fine = (G.dequantize_wire_int8(raw, iso)
                if raw.dtype == np.int8 else raw.astype(np.float32))
        print(f"dense eval:        {t1-t0:7.2f} s "
              f"({B * (R0*U+1)**3 / 1e6:.0f}M pts); transfer+cast "
              f"{time.perf_counter()-t1:7.2f} s "
              f"({nbytes/1e6:.0f} MB {args.wire} wire)")
    else:
        # coarse eval
        grid = G.make_grid(R0, box_size)
        R0p = R0 + 1
        qpts = jnp.broadcast_to(
            jnp.asarray(grid.reshape(1, -1, 3)), (B, R0p ** 3, 3))
        coarse = G.eval_points_batched(
            decode_fn, variables, c, qpts, args.chunk)
        sync(coarse)
        t0 = time.perf_counter()
        coarse = G.eval_points_batched(
            decode_fn, variables, c, qpts, args.chunk)
        sync(coarse)
        print(f"coarse eval:       {time.perf_counter()-t0:7.2f} s "
              f"({B * R0p**3 / 1e6:.1f}M pts)")
        coarse = coarse.reshape(B, R0p, R0p, R0p)

        # refinement, per-phase instrumented
        lattice_fn = (
            G.make_convonet_lattice_eval(model, R0 * U, box_size)
            if args.mode == "lattice" else None)
        tm = {}
        t0 = time.perf_counter()
        fine = G.active_voxel_refinement(
            decode_fn, variables, c, coarse, R0, U, box_size, iso,
            args.max_active, args.chunk, timings=tm,
            lattice_eval_fn=lattice_fn,
            wire=args.wire if args.wire in ("bf16", "int8") else "bf16")
        t_refine = time.perf_counter() - t0
        print(f"refinement total:  {t_refine:7.2f} s "
              f"(eval {tm.get('eval_s', 0):.2f} / transfer "
              f"{tm.get('transfer_s', 0):.2f} / assemble "
              f"{tm.get('assemble_s', 0):.2f}; K={tm.get('refine_k')} "
              f"wire {tm.get('wire_bytes', 0)/1e6:.1f} MB; fine grid "
              f"{fine.nbytes/1e6:.0f} MB)")

    # marching
    t0 = time.perf_counter()
    meshes = []
    Rf = fine.shape[1] - 1
    for b in range(B):
        vol = np.pad(fine[b], 1, constant_values=-1e6)
        verts, tris = marching_isosurface(vol, iso)
        meshes.append((verts, tris))
    t_march = time.perf_counter() - t0
    ntri = np.mean([len(t_) for _, t_ in meshes])
    print(f"marching tets:     {t_march:7.2f} s "
          f"({ntri/1e3:.0f}k tris/mesh avg)")

    if args.simplify_nfaces:
        t0 = time.perf_counter()
        meshes = [
            simplify_mesh(v.astype(np.float32), t_, args.simplify_nfaces)
            if len(t_) > args.simplify_nfaces else (v, t_)
            for v, t_ in meshes]
        print(f"QEM simplify:      {time.perf_counter()-t0:7.2f} s "
              f"(target {args.simplify_nfaces})")

    t0 = time.perf_counter()
    nrng = np.random.default_rng(1)
    n_ok = 0
    for v, t_ in meshes:
        try:
            G.sample_surface(np.asarray(v, np.float32), t_, 1024, nrng)
            n_ok += 1
        except ValueError:
            pass
    print(f"surface sampling:  {time.perf_counter()-t0:7.2f} s "
          f"({n_ok}/{B} ok)")
