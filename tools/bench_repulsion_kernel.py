"""Microbenchmark: fused repulsion kernel vs XLA path (TPU).

Usage: python tools/bench_repulsion_kernel.py [--batch 48]
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
    p.add_argument("--n", type=int, default=1024)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from if_defense_tpu.defense.repulsion import repulsion_loss
    from if_defense_tpu.ops.pallas_repulsion import fused_repulsion_loss

    B, N = args.batch, args.n
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (B, N, 3)), jnp.bfloat16)
    ITERS = 20

    def loop_grad(fn):
        @jax.jit
        def run(p0):
            def body(p, _):
                g = jax.grad(lambda q: jnp.sum(fn(q)))(p)
                return p - (1e-4 * g).astype(p.dtype), None
            out, _ = jax.lax.scan(body, p0, None, length=ITERS)
            return out
        return run

    t = timeit(loop_grad(repulsion_loss), pts, inner=ITERS)
    print(f"XLA approx fwd+bwd:   {t*1e3:7.3f} ms/iter")
    t = timeit(loop_grad(fused_repulsion_loss), pts, inner=ITERS)
    print(f"pallas fused fwd+bwd: {t*1e3:7.3f} ms/iter")
