"""Microbenchmark: fused bilinear kernel vs XLA einsum pipeline (TPU).

Times forward and forward+backward of one plane sample at the defense
shapes for several query-tile sizes.

Usage: python tools/bench_interp_kernel.py [--batch 48]
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


def timeit(fn, *args, warmup=2, reps=5, inner=1):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts.append((time.perf_counter() - t0) / inner)
    return min(ts)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import if_defense_tpu.ops.pallas_interp as pi
    from if_defense_tpu.ops.interp import bilinear_plane_sample

    B, H, W, C, Q = args.batch, 64, 64, 32, 1024
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    uv = jnp.asarray(rng.uniform(0, 1, (B, Q, 2)), jnp.bfloat16)
    ITERS = 20

    def loop(fn):
        @jax.jit
        def run(plane, uv):
            def body(u, _):
                out = fn(plane, u.reshape(B, Q, 2)[..., :2])
                return u + jnp.float32(1e-6).astype(u.dtype), out
            u, outs = jax.lax.scan(body, uv, None, length=ITERS)
            return outs[-1]
        return run

    def loop_grad(fn):
        @jax.jit
        def run(plane, uv):
            def loss(u):
                out = fn(plane, u)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            def body(u, _):
                g = jax.grad(loss)(u)
                return u - (1e-6 * g).astype(u.dtype), None
            u, _ = jax.lax.scan(body, uv, None, length=ITERS)
            return u
        return run

    t = timeit(loop(bilinear_plane_sample), plane, uv, inner=ITERS)
    print(f"XLA fwd:          {t*1e3:7.3f} ms/iter")
    t = timeit(loop_grad(bilinear_plane_sample), plane, uv, inner=ITERS)
    print(f"XLA fwd+bwd:      {t*1e3:7.3f} ms/iter")

    for qt in (128, 256, 512):
        pi.QT = qt
        t = timeit(loop(pi.fused_bilinear_plane_sample), plane, uv,
                   inner=ITERS)
        print(f"pallas QT={qt:4d} fwd: {t*1e3:7.3f} ms/iter")
        t = timeit(loop_grad(pi.fused_bilinear_plane_sample), plane, uv,
                   inner=ITERS)
        print(f"pallas QT={qt:4d} f+b: {t*1e3:7.3f} ms/iter")
