"""Per-phase profile of the ConvONet-Opt restoration loop on real TPU.

Times the pieces of the 201-step loop separately (jitted in isolation so
each number is a true device wall-clock through the axon tunnel):

  - full fused defense (the bench workload)
  - decode forward+backward alone (bilinear + decoder ResNets)
  - repulsion forward+backward alone (kNN selection + gather + loss)
  - kNN selection alone (approx_max_k path)
  - encoder (once per batch)

Usage: python tools/profile_defense.py [--batch 48] [--f32] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    """Reliable device barrier through the axon tunnel (scalar fetch).

    Extract ONE element on device first — np.asarray(whole_leaf) would
    drag the full array across the ~20 MB/s tunnel and pollute timings.
    """
    import jax.numpy as jnp

    flat = jnp.ravel(x)[0]
    return float(flat)


def bench_fn(fn, *args, warmup=2, reps=5, inner=1):
    for _ in range(warmup):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        times.append((time.perf_counter() - t0) / inner)
    return min(times)


def cost_of(jitted, *args, inner=1, batch=1):
    """XLA cost-analysis (bytes accessed, flops) per `inner` unit per
    cloud — the roofline numerator for each phase. Pallas custom calls
    report ~0 here; their true traffic is their operands (counted)."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        by = c.get("bytes accessed", 0.0) / inner / batch
        fl = c.get("flops", 0.0) / inner / batch
        return by, fl
    except Exception as e:
        print(f"  (cost analysis unavailable: {type(e).__name__})")
        return 0.0, 0.0


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--iters", type=int, default=20,
                   help="loop iterations per timing rep")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from if_defense_tpu.defense.ifdefense import make_opt_defense
    from if_defense_tpu.defense.repulsion import (
        repulsion_knn,
        repulsion_loss_with_idx,
    )
    from if_defense_tpu.implicit import ConvOccupancyNetwork

    cd = None if args.f32 else "bfloat16"
    B, K, Q = args.batch, 1024, 1024
    model = ConvOccupancyNetwork()
    rng = np.random.default_rng(0)
    init_pc = jnp.zeros((2, 64, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.uniform(-0.4, 0.4, (B, K, 3)), jnp.float32)
    key = jax.random.key(1)

    def encode(v, x):
        return model.apply(v, x, method="encode_inputs")

    def decode(v, p, c):
        return model.apply(v, p, c, method="decode")

    print(f"profile: B={B} compute_dtype={cd or 'float32'}")

    # --- encoder (once per batch) ---
    enc_j = jax.jit(encode)
    sel = pc[:, :600]
    t = bench_fn(enc_j, variables, sel)
    print(f"encode (600 pts): {t*1e3:8.2f} ms / batch")
    c = enc_j(variables, sel)

    if cd is not None:
        castf = lambda t_: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t_)
        lv, lc = castf(variables), castf(c)
    else:
        lv, lc = variables, c

    pts = pc[:, :Q]
    if cd is not None:
        pts_c = pts.astype(jnp.bfloat16)
    else:
        pts_c = pts

    # --- decode fwd+bwd, N iters back to back ---
    def dec_loss(p):
        occ = decode(lv, p, lc)
        return jnp.sum(occ.astype(jnp.float32) ** 2)

    dec_g = jax.grad(dec_loss)

    @jax.jit
    def dec_loop(p0):
        def body(p, _):
            g = dec_g(p)
            return p - 1e-4 * g.astype(p.dtype), None
        out, _ = jax.lax.scan(body, p0, None, length=args.iters)
        return out

    t = bench_fn(dec_loop, pts_c, inner=args.iters)
    by, fl = cost_of(dec_loop, pts_c, inner=args.iters, batch=B)
    print(f"decode fwd+bwd:   {t*1e3:8.2f} ms / iter   "
          f"[{by/1e6:6.3f} MB/cl/iter, {fl/1e9:5.2f} GF/cl/iter, "
          f"{by*B/t/1e9:5.0f} GB/s]")

    # --- repulsion fwd+bwd (selection + gather + loss grad) ---
    def rep_loss(p):
        idx = repulsion_knn(p)
        return jnp.sum(repulsion_loss_with_idx(p, idx).astype(jnp.float32))

    rep_g = jax.grad(rep_loss)

    @jax.jit
    def rep_loop(p0):
        def body(p, _):
            g = rep_g(p)
            return p - 1e-4 * g.astype(p.dtype), None
        out, _ = jax.lax.scan(body, p0, None, length=args.iters)
        return out

    t = bench_fn(rep_loop, pts_c, inner=args.iters)
    by, fl = cost_of(rep_loop, pts_c, inner=args.iters, batch=B)
    print(f"repuls fwd+bwd:   {t*1e3:8.2f} ms / iter   "
          f"[{by/1e6:6.3f} MB/cl/iter, {fl/1e9:5.2f} GF/cl/iter, "
          f"{by*B/t/1e9:5.0f} GB/s]")

    # --- kNN selection alone ---
    @jax.jit
    def knn_loop(p0):
        def body(s, _):
            idx = repulsion_knn(p0 + s * 0)
            return jnp.sum(idx).astype(jnp.float32) * 0, None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
        return out

    t = bench_fn(knn_loop, pts_c, inner=args.iters)
    by, fl = cost_of(knn_loop, pts_c, inner=args.iters, batch=B)
    print(f"knn select:       {t*1e3:8.2f} ms / iter   "
          f"[{by/1e6:6.3f} MB/cl/iter, {fl/1e9:5.2f} GF/cl/iter]")

    # --- full fused defense ---
    defend = make_opt_defense(
        decode, encode, compute_dtype=cd, iterations=200)
    t = bench_fn(lambda: defend(variables, pc, key), warmup=1, reps=3)
    print(f"full defense:     {t:8.2f} s / batch "
          f"({B / t:6.2f} clouds/s)")

    # --- corner-cache path: refresh cost + cached-step cost ---
    from if_defense_tpu.defense.ifdefense import _convonet_corner_fns
    from if_defense_tpu.defense import convonet_opt_defense

    cache_fn, cached_fn = _convonet_corner_fns(model)

    @jax.jit
    def refresh_loop(p0):
        def body(cache, _):
            cache = jax.tree_util.tree_map(
                lambda a, b: b * 1.0, cache, cache_fn(lv, p0, lc))
            return cache, None
        c0 = cache_fn(lv, p0, lc)
        out, _ = jax.lax.scan(body, c0, None, length=args.iters)
        return out["xz"][0]

    t = bench_fn(refresh_loop, pts_c, inner=args.iters)
    by, fl = cost_of(refresh_loop, pts_c, inner=args.iters, batch=B)
    print(f"corner refresh:   {t*1e3:8.2f} ms / refresh   "
          f"[{by/1e6:6.3f} MB/cl/refresh, {fl/1e9:5.2f} GF/cl/refresh, "
          f"{by*B/t/1e9:5.0f} GB/s]")

    cache0 = jax.jit(cache_fn)(lv, pts_c, lc)

    def cached_loss(p):
        occ = cached_fn(lv, p, lc, cache0)
        rep = repulsion_loss_auto(p)
        return (jnp.sum(occ.astype(jnp.float32) ** 2)
                + jnp.sum(rep.astype(jnp.float32)))

    from if_defense_tpu.defense.repulsion import repulsion_loss_auto
    cached_g = jax.grad(cached_loss)

    @jax.jit
    def cached_loop(p0):
        def body(p, _):
            g = cached_g(p)
            return p - 1e-4 * g.astype(p.dtype), None
        out, _ = jax.lax.scan(body, p0, None, length=args.iters)
        return out

    t = bench_fn(cached_loop, pts_c, inner=args.iters)
    by, fl = cost_of(cached_loop, pts_c, inner=args.iters, batch=B)
    print(f"cached step:      {t*1e3:8.2f} ms / iter (lerp+head+rep bwd)   "
          f"[{by/1e6:6.3f} MB/cl/iter, {fl/1e9:5.2f} GF/cl/iter, "
          f"{by*B/t/1e9:5.0f} GB/s]")

    # --- full cached defense at interp_refresh=8 (bench workload) ---
    defend8 = convonet_opt_defense(
        model, variables, iterations=200, compute_dtype=cd,
        interp_refresh=8)
    t = bench_fn(lambda: defend8(pc, key), warmup=1, reps=3)
    by, fl = cost_of(defend8.func, variables, pc, key, inner=201, batch=B)
    print(f"full defense R=8: {t:8.2f} s / batch "
          f"({B / t:6.2f} clouds/s)   "
          f"[{by/1e6:6.3f} MB/cl/iter, {fl/1e9:5.2f} GF/cl/iter, "
          f"{by*B*201/t/1e9:5.0f} GB/s avg]")
