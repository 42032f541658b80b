"""Quick on-chip A/B of rep_graph_cache (+ f32 fast path) on the bench
workload. Pause the queue around this (tools/with_queue_paused.py)."""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=48)
    p.add_argument("--num_batches", type=int, default=6)
    p.add_argument("--modes", nargs="*", default=[
        "bf16_r16", "bf16_r16_repc", "f32_r16_repc", "f32_r16"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from if_defense_tpu.defense import convonet_opt_defense
    from if_defense_tpu.implicit import ConvOccupancyNetwork

    B, K, iters, inp, samp = args.batch_size, 1024, 200, 600, 1024
    model = ConvOccupancyNetwork()
    rng = np.random.default_rng(0)
    init_pc = jnp.asarray(
        rng.uniform(-0.45, 0.45, (2, inp, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.normal(size=(B, K, 3)) * 0.3, jnp.float32)
    key = jax.random.key(1)

    cfg = {
        "bf16_r16": ("bfloat16", 16, False),
        "bf16_r16_repc": ("bfloat16", 16, True),
        "f32_r16_repc": (None, 16, True),
        "f32_r16": (None, 16, False),
        "f32_exact": (None, 1, False),
    }
    for mode in args.modes:
        cd, r, repc = cfg[mode]
        defend = convonet_opt_defense(
            model, variables, iterations=iters, input_npoint=inp,
            sample_npoint=samp, compute_dtype=cd, interp_refresh=r,
            rep_graph_cache=repc)
        out = defend(pc, key)
        float(out[0, 0, 0])
        t0 = time.time()
        for i in range(args.num_batches):
            out = defend(pc, jax.random.fold_in(key, i))
        float(out[0, 0, 0])
        cps = args.num_batches * B / (time.time() - t0)
        print(f"{mode}: {cps:.2f} clouds/s "
              f"({1000 * B / cps / 201:.3f} ms/iter at B={B})",
              flush=True)


if __name__ == "__main__":
    main()
