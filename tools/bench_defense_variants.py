"""Defense-layer throughput across variants on real TPU.

Complements bench.py (ConvONet-Opt, the headline) with the other defense
rows: ONet-Opt (the heavier CBN decoder), DUP-Net (SOR + PU-Net x4
upsample), SOR and SRS alone. Random-init weights — throughput is
weight-independent.

Usage: python tools/bench_defense_variants.py [--batch 48]
       [--out BENCH_DEFENSES.json]
"""

from __future__ import annotations

import argparse
import json
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
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from if_defense_tpu.defense import (
        DUPNet,
        onet_opt_defense,
        sor_defense,
        srs_defense,
    )
    from if_defense_tpu.implicit import OccupancyNetwork

    B, K = args.batch, 1024
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(B, K, 3)) * 0.3, jnp.float32)
    key = jax.random.key(1)
    results = {}

    def run(name, fn, reps=3):
        out = fn()
        sync(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            sync(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        results[name] = round(B / dt, 2)
        print(f"{name:16s} {B / dt:9.2f} clouds/s  ({dt*1e3:.1f} ms/batch)")

    # ONet-Opt: 201 Adam iters, 300-pt encoder input, CBN decoder.
    # Both precisions recorded (VERDICT r2 item 8: give ONet-Opt a
    # profiling round) — the CBN decoder is MXU-bound so bf16 is the
    # lever; there is no corner-cache analog (the decoder has no spatial
    # interpolation to cache, its cost IS the per-point MLP).
    onet = OccupancyNetwork()
    init_pc = jnp.zeros((2, 64, 3))
    ov = onet.init(jax.random.key(0), init_pc, init_pc[:, :8])
    defend_onet = onet_opt_defense(
        onet, ov, iterations=200, compute_dtype="bfloat16")
    run("onet_opt", lambda: defend_onet(pc, key), reps=2)
    defend_onet_f32 = onet_opt_defense(onet, ov, iterations=200)
    run("onet_opt_f32", lambda: defend_onet_f32(pc, key), reps=2)

    # DUP-Net: SOR -> PU-Net x4 upsample (random-init PU-Net weights)
    dup = DUPNet(npoint=K, up_ratio=4)
    pv = dup.init(jax.random.key(0))
    dup_j = jax.jit(lambda v, x, k_: dup(v, x, k_))
    run("dupnet", lambda: dup_j(pv, pc, key))

    sor_j = jax.jit(lambda x: sor_defense(x)[0])
    run("sor", lambda: sor_j(pc))
    srs_j = jax.jit(lambda x, k_: srs_defense(x, 500, k_))
    run("srs", lambda: srs_j(pc, key))

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "metric": "defense_clouds_per_sec",
                "batch": B, "num_points": K, "results": results,
                "note": "v5e single chip; ONet-Opt at reference "
                        "hyperparameters (201 iters), DUP-Net with x4 "
                        "PU-Net upsample. ConvONet-Opt (headline) is "
                        "bench.py; mesh variants are BENCH_MESH.json.",
            }, f, indent=1)
