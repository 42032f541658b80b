"""Attack-layer throughput on real TPU (CW-Perturb, FGM family, Drop).

The reference's attack story is its DDP pain point (7 scripts sharded
over GPUs, per-rank npz merging — `targeted_perturb_attack.py:99-174`);
here each attack is one jitted scan on device. This records clouds/sec
per attack at reference hyperparameters against a random-init victim
(throughput is weight-independent). `--victim pointnet2` measures the
FPS/ball-query-heavy forward the reference threw 4 GPUs at
(`targeted_perturb_attack.py:99-130`); CW device calls are host-chunked
on TPU exactly like the attack CLI (bit-identical results,
`attack/cw.py` chunk contract).

Usage:
    python tools/bench_attack.py [--victim pointnet2] [--batch 64]
        [--attacks cw_perturb cw_perturb_mixed] [--out BENCH_ATTACK.json]

--out merges per-victim: existing entries for other victims are kept.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ATTACKS = ["cw_perturb", "cw_perturb_mixed", "ifgm", "pgd", "drop"]


def sync(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--victim", default="pointnet")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--attacks", nargs="+", default=ATTACKS,
                   choices=ATTACKS)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--out", default=None)
    p.add_argument("--chunk", type=int, default=None,
                   help="CW device_chunk_iters override (default: the "
                        "CLI policy, 100 on TPU / fused elsewhere); "
                        "results keys get a _c<N> suffix")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from if_defense_tpu.attack.cw import cw_perturb
    from if_defense_tpu.attack.drop import saliency_drop
    from if_defense_tpu.attack.fgm import ifgm, pgd
    from if_defense_tpu.models import build_model
    from if_defense_tpu.training import create_train_state, eval_variables

    B, N = args.batch, args.num_points
    model = build_model(args.victim, num_classes=40)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    pc = pc / jnp.linalg.norm(pc, axis=-1, keepdims=True)
    state = create_train_state(model, jax.random.key(0), pc)
    variables = eval_variables(state)
    target = jnp.asarray(rng.integers(0, 40, B))
    label = jnp.asarray(rng.integers(0, 40, B))
    key = jax.random.key(1)

    # same chunk policy as cli/attack.py: bound every CW device call on
    # TPU (the fused 5000-iter scan-of-scans on a heavyweight victim
    # exceeds the runtime's single-execution limit); fused elsewhere
    chunk = args.chunk if args.chunk is not None else (
        100 if jax.default_backend() == "tpu" else None)

    def logits_fn(x):
        return model.apply(variables, x, train=False)[0]

    def masked_logits_fn(x, mask):
        return model.apply(variables, x, train=False, mask=mask)[0]

    results = {}

    def run(name, fn, reps=None):
        out = fn()                                   # compile + warmup
        sync(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(reps or args.reps):
            t0 = time.perf_counter()
            out = fn()
            sync(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        # non-default batch sizes get their own key so a B!=64 rerun
        # coexists with (rather than overwrites) the canonical entries
        if B != 64:
            name = f"{name}_b{B}"
        if args.chunk is not None:
            name = f"{name}_c{args.chunk}"
        results[name] = round(B / dt, 2)
        print(f"{args.victim}/{name:24s} {B / dt:8.2f} clouds/s  "
              f"({dt:.2f} s/batch)", flush=True)

    # CW-Perturb at reference hyperparameters (Perturb.py: 10 x 500)
    if "cw_perturb" in args.attacks:
        run("cw_perturb_10x500", lambda: cw_perturb(
            logits_fn, pc, target, key, binary_step=10, num_iter=500,
            device_chunk_iters=chunk))

    # mixed precision: bf16 victim trunk, f32 logits head + attack math
    # (attack/mixed.py; success parity measured in RESULTS_DISCRIM.md)
    if "cw_perturb_mixed" in args.attacks:
        from if_defense_tpu.attack.mixed import make_mixed_logits_fn

        mixed_fn = make_mixed_logits_fn(model, variables, 40)
        run("cw_perturb_mixed_10x500", lambda: cw_perturb(
            mixed_fn, pc, target, key, binary_step=10, num_iter=500,
            device_chunk_iters=chunk))

    # I-FGM / PGD, 50 iters, eps 0.08*sqrt(3N) as the driver scales it
    budget = 0.08 * math.sqrt(N * 3)
    if "ifgm" in args.attacks:
        run("ifgm_50", lambda: ifgm(
            logits_fn, pc, target, key, budget=budget,
            step_size=budget / 10, num_iter=50))
    if "pgd" in args.attacks:
        run("pgd_50", lambda: pgd(
            logits_fn, pc, target, key, budget=budget,
            step_size=budget / 10, num_iter=50))

    # saliency Drop-200 (k=5 per round -> 40 rounds)
    if "drop" in args.attacks:
        run("drop_200", lambda: saliency_drop(
            masked_logits_fn, pc, label, num_drop=200))

    print(json.dumps({args.victim: results}))
    if args.out:
        merged = merge_record(args.out, args.victim, results, B, N)
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
    return results


def merge_record(out_path, victim, results, batch, num_points):
    """Merge one victim's new measurements into the bench JSON record.

    Per-ATTACK merge: a single-attack rerun extends/updates the victim's
    entry without deleting its other recorded measurements (the
    docstring contract a whole-dict replace violated, review r4). The
    top-level batch/num_points describe the UNSUFFIXED retained entries
    (non-default batches get `_b<N>`-suffixed keys), so they are kept
    from the old record whenever ANY old rows are retained — including
    rows of the victim being merged (ADVICE r4: keying only on other
    victims relabeled retained B=64 rows with a B=128 rerun's batch).
    """
    merged = {"metric": "attack_clouds_per_sec",
              "batch": batch, "num_points": num_points, "victims": {},
              "note": "v5e single chip; one jitted scan per attack "
                      "(CW host-chunked on TPU like the CLI, "
                      "bit-identical), reference hyperparameters"}
    if os.path.exists(out_path):
        with open(out_path) as f:
            old = json.load(f)
        if "victims" in old:
            merged["victims"] = old["victims"]
        elif "victim" in old and "results" in old:  # pre-r4 layout
            merged["victims"][old["victim"]] = old["results"]
        for k in ("batch", "num_points"):
            if k in old and any(merged["victims"].values()):
                merged[k] = old[k]
        if "note" in old:
            merged["note"] = old["note"]
    merged["victims"].setdefault(victim, {}).update(results)
    return merged


if __name__ == "__main__":
    main()
