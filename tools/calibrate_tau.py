"""Calibrate the --boundary_tau scoring margin: measure cross-backend
(TPU-vs-CPU) logit deltas and boundary-margin distributions on real
matrix artifacts, then report the tau that separates them.

The matrix scoring note (RESULTS_MATRIX.md) documents that CW-family
attacks stop at margin 0, so plain-argmax `attacked`/`success` columns
flip with backend float noise. tau-scored columns are backend-stable iff
tau >> max cross-backend margin delta while staying << genuine robust
margins. This tool measures both sides on the artifacts in --seed_dir.

Usage (CPU pass writes a cache; TPU pass compares against it):
    JAX_PLATFORMS=cpu python tools/calibrate_tau.py --seed_dir .matrix_r4/seed0 \
        --victim dgcnn --npz perturb-dgcnn.npz --out /tmp/tau_cpu.npz
    python tools/calibrate_tau.py --seed_dir .matrix_r4/seed0 \
        --victim dgcnn --npz perturb-dgcnn.npz --compare /tmp/tau_cpu.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def all_logits(seed_dir, victim, npz_name, num_points, batch_size,
               pin_precision=True):
    from if_defense_tpu.cli.inference import (
        adjust_num_points,
        load_eval_model,
    )
    from if_defense_tpu.data import ModelNet40Attack, batch_iterator
    from if_defense_tpu.training import make_eval_step

    ckpt = os.path.join(seed_dir, victim, "best")
    data = os.path.join(seed_dir, victim, npz_name)
    import contextlib

    import jax

    model, variables, meta, = load_eval_model(ckpt)
    eval_step = make_eval_step(model)
    n = adjust_num_points(num_points, data)
    # normalize=False: match the scoring path (inference CLI default —
    # the reference scores defended/adversarial data un-renormalized)
    ds = ModelNet40Attack(data, n, normalize=False)
    outs, labels, targets = [], [], []
    prec_ctx = (jax.default_matmul_precision("highest") if pin_precision
                else contextlib.nullcontext())
    with prec_ctx:
        for batch, valid in batch_iterator(ds, batch_size, pad_last=True):
            lg = np.asarray(
                eval_step(variables, batch[0].astype(np.float32)))
            outs.append(lg[:valid])
            labels.append(batch[1][:valid])
            targets.append(batch[2][:valid])
    return (np.concatenate(outs), np.concatenate(labels),
            np.concatenate(targets))


def margins(logits, cls):
    from if_defense_tpu.cli.inference import class_margins

    return class_margins(logits, cls)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seed_dir", default=".matrix_r4/seed0")
    p.add_argument("--victim", default="dgcnn")
    p.add_argument("--npz", default="perturb-dgcnn.npz")
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", default=None, help="save logits npz here")
    p.add_argument("--default_precision", action="store_true",
                   help="measure at backend-default matmul precision "
                        "instead of the pinned f32-HIGHEST scoring mode")
    p.add_argument("--compare", default=None,
                   help="npz of logits from the other backend")
    args = p.parse_args(argv)

    lg, label, target = all_logits(
        args.seed_dir, args.victim, args.npz, args.num_points,
        args.batch_size, pin_precision=not args.default_precision)
    import jax
    backend = jax.default_backend()
    m_t = margins(lg, target)
    m_l = margins(lg, label)
    print(f"backend={backend} n={len(lg)} "
          f"logit|max|={np.abs(lg).max():.3f}")
    print(f"target margin: min={m_t.min():.4f} med={np.median(m_t):.4f} "
          f"p90={np.percentile(m_t, 90):.4f} max={m_t.max():.4f}")
    print(f"true margin:   min={m_l.min():.4f} med={np.median(m_l):.4f} "
          f"max={m_l.max():.4f}")
    if args.out:
        np.savez(args.out, logits=lg, label=label, target=target)
        print(f"saved {args.out}")
    if args.compare:
        ref = np.load(args.compare)
        d = np.abs(lg - ref["logits"])
        dm = np.abs(m_t - margins(ref["logits"], target))
        print(f"cross-backend |logit delta|: max={d.max():.5f} "
              f"p99={np.percentile(d, 99):.5f} med={np.median(d):.5f}")
        print(f"cross-backend |target-margin delta|: max={dm.max():.5f} "
              f"p99={np.percentile(dm, 99):.5f}")
        for tau in (0.01, 0.05, 0.1, 0.2, 0.5):
            s_here = (m_t > -tau).mean()
            s_ref = (margins(ref["logits"], target) > -tau).mean()
            a_here = (m_l > tau).mean()
            a_ref = (margins(ref["logits"], label) > tau).mean()
            print(f"tau={tau}: success {s_here:.4f} vs {s_ref:.4f} "
                  f"(delta {abs(s_here - s_ref):.4f}); accuracy "
                  f"{a_here:.4f} vs {a_ref:.4f} "
                  f"(delta {abs(a_here - a_ref):.4f})")


if __name__ == "__main__":
    main()
