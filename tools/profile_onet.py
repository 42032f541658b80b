"""ONet-Opt profiling round (VERDICT r2 item 8).

Breaks the ONet-Opt defense iteration into its phases on the real chip —
encoder (once per batch), CBN-decoder grad step, fused-repulsion grad
step — at f32 vs bf16 and a couple of batch sizes, so the accept/reject
note for further ONet fast paths is measured, not guessed.

Context: the ConvONet headline got corner-cache interpolation because
its decoder cost IS bilinear plane gathering (cacheable). The ONet CBN
decoder has no spatial interpolation to cache — its cost is the
per-point conditional-ResNet MLP (`implicit/onet.py:44-70`, reference
`ONet/im2mesh/onet/models/decoder.py:77-131`), which is pure MXU work;
the only lever of that kind would be evaluating the decoder on a frozen
point set, which changes the algorithm. So the candidate levers are
precision (bf16) and batch size.

Usage: python tools/profile_onet.py [--iters 50]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50,
                   help="loop iterations per timing (per-iter cost is "
                        "iteration-independent)")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from if_defense_tpu.defense import onet_opt_defense
    from if_defense_tpu.defense.repulsion import repulsion_loss_auto
    from if_defense_tpu.implicit import OccupancyNetwork

    model = OccupancyNetwork()
    init_pc = jnp.zeros((2, 64, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc[:, :8])
    rng = np.random.default_rng(0)
    key = jax.random.key(1)
    report = {}

    def timed(fn, *a):
        out = fn(*a)
        sync(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            sync(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for B in (16, 48):
        pc = jnp.asarray(rng.normal(size=(B, 1024, 3)) * 0.3, jnp.float32)
        pts = jnp.asarray(
            rng.uniform(-0.45, 0.45, (B, 1024, 3)), jnp.float32)
        sel = pc[:, :300]

        # encoder, once per batch
        enc = jax.jit(lambda v, x: model.apply(v, x,
                                               method=model.encode_inputs))
        t_enc = timed(enc, variables, sel)
        c = enc(variables, sel)

        for dtype in (None, "bfloat16"):
            tag = f"B{B}_{dtype or 'f32'}"
            cd = jnp.dtype(dtype) if dtype else None
            lv = (jax.tree_util.tree_map(
                lambda x: x.astype(cd) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x, variables)
                if cd else variables)
            cc = c.astype(cd) if cd else c

            def dec_loss(q):
                qq = q.astype(cd) if cd else q
                occ = model.apply(lv, qq, cc, method=model.decode)
                return jnp.mean(occ.astype(jnp.float32) ** 2)

            def rep_loss(q):
                qq = q.astype(cd) if cd else q
                return jnp.mean(
                    repulsion_loss_auto(qq).astype(jnp.float32))

            def loop(grad_fn):
                @jax.jit
                def run(q):
                    def step(p, _):
                        return p - 1e-3 * grad_fn(p), None
                    out, _ = jax.lax.scan(
                        step, q, None, length=args.iters)
                    return out
                return run

            t_dec = timed(loop(jax.grad(dec_loss)), pts) / args.iters
            t_rep = timed(loop(jax.grad(rep_loss)), pts) / args.iters
            report[tag] = {
                "encode_ms": round(t_enc * 1e3, 2),
                "decoder_grad_ms_per_iter": round(t_dec * 1e3, 3),
                "repulsion_grad_ms_per_iter": round(t_rep * 1e3, 3),
                "implied_200iter_clouds_per_sec": round(
                    B / (t_enc + 200 * (t_dec + t_rep)), 1),
            }
            print(tag, json.dumps(report[tag]), flush=True)

        # end-to-end check at this batch: full defense both dtypes
        for dtype in (None, "bfloat16"):
            d = onet_opt_defense(
                model, variables, iterations=200, compute_dtype=dtype)
            t = timed(lambda: d(pc, key))
            report[f"B{B}_{dtype or 'f32'}"]["e2e_clouds_per_sec"] = \
                round(B / t, 1)
            print(f"B{B}_{dtype or 'f32'} e2e {B / t:.1f} clouds/s",
                  flush=True)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
