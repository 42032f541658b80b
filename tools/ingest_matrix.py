"""Merge accuracy-matrix results.json snapshots into one markdown report.

The chip queue runs tools/accuracy_benchmark.py in STAGES (full
pointnet/pointnet2 cell set, then reduced dgcnn/pointconv legs), and each
driver invocation overwrites seed<k>/results.json and RESULTS.md with
only ITS OWN attack x victim set. This tool merges any number of
results.json snapshots (later files win on conflicting cells, their new
cells extend the matrix) and emits the combined per-victim tables in the
same format as accuracy_benchmark.write_report — the tables block of
RESULTS_MATRIX.md (protocol: the reference's Tables 2-5,
`baselines/command.txt` attack -> defend -> classify).

Usage:
    python tools/ingest_matrix.py /tmp/matrix/seed0/results_stage1.json \
        /tmp/matrix/seed0/results_stage2.json --out /tmp/matrix/MERGED.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def merge_results(snapshots: list[dict]) -> dict:
    """Deep-merge {victims: {v: {clean_accuracy, attacks: {a: cells}}}}.

    Later snapshots win per (victim, attack) cell; victims/attacks only
    present in earlier snapshots are kept.
    """
    victims: dict = {}
    for snap in snapshots:
        for v, vres in snap.get("victims", {}).items():
            dst = victims.setdefault(
                v, {"clean_accuracy": vres.get("clean_accuracy"),
                    "attacks": {}})
            if vres.get("clean_accuracy") is not None:
                dst["clean_accuracy"] = vres["clean_accuracy"]
            for a, ares in vres.get("attacks", {}).items():
                dst["attacks"][a] = ares
    return {"victims": victims}


def ordered_union(lists: list[list[str]]) -> list[str]:
    out: list[str] = []
    for lst in lists:
        for x in lst:
            if x not in out:
                out.append(x)
    return out


def write_tables(merged: dict, attack_order: list[str] | None = None,
                 victim_order: list[str] | None = None) -> str:
    victims = merged["victims"]
    v_names = victim_order or list(victims)
    a_names = attack_order or ordered_union(
        [list(victims[v]["attacks"]) for v in v_names if v in victims])
    lines = []
    for v in v_names:
        if v not in victims:
            continue
        vres = victims[v]
        clean = vres.get("clean_accuracy")
        clean_s = f"{100 * clean:.1f}" if clean is not None else "?"
        defenses = ordered_union(
            [list(a.get("defended", {})) for a in vres["attacks"].values()])
        lines.append(f"## {v} (clean {clean_s})")
        lines.append("")
        lines.append("| attack | success | attacked | "
                     + " | ".join(defenses) + " |")
        lines.append("|" + "---|" * (3 + len(defenses)))
        for a in a_names:
            ares = vres["attacks"].get(a)
            if ares is None:
                continue
            def pct(x):
                return "—" if x is None else f"{100 * float(x):.1f}"
            succ = ("—" if a == "clean"
                    else pct(ares.get("success_rate")))
            att = pct(ares.get("attacked", {}).get("accuracy"))
            row = [a, succ, att]
            row += [pct(ares["defended"].get(d, {}).get("accuracy"))
                    if d in ares.get("defended", {}) else "—"
                    for d in defenses]
            lines.append("| " + " | ".join(row) + " |")
        lines.append("")
    return "\n".join(lines)


def rescore_boundary_cells(merged: dict, seed_dir: str, tau: float,
                           batch_size: int = 16) -> int:
    """Re-score the backend-sensitive columns from the saved artifacts.

    CW-family attacks stop exactly at the decision boundary (margin 0 —
    success accounting parity: `baselines/attack/CW/Perturb.py:101-123`),
    so plain-argmax `attacked`/`success` cells flip with backend float
    noise (RESULTS_MATRIX.md scoring note). This pass recomputes them
    uniformly — margin-tolerant tau scoring (see
    `cli/inference.py --boundary_tau`) on ONE backend (run it under
    JAX_PLATFORMS=cpu for judge-reproducibility) — directly from each
    victim's adversarial npz in `seed_dir`. Targeted attacks get
    success = margin-within-tau of the target; the untargeted Drop
    family gets success = 1 - robust accuracy. The identity `none`
    defense column is the attacked column by definition and is updated
    to match. Defended cells are left as scored (backend-stable ±0.3%:
    every defense moves points off the boundary).

    Returns the number of re-scored (victim, attack) cells.
    """
    import numpy as np

    from if_defense_tpu.cli.inference import main as inf_main

    count = 0
    for v, vres in merged["victims"].items():
        ckpt = os.path.join(seed_dir, v, "best")
        if not os.path.exists(ckpt):
            continue
        for a, ares in vres["attacks"].items():
            if a == "clean":
                continue
            adv = os.path.join(seed_dir, v, f"{a}-{v}.npz")
            if not os.path.exists(adv):
                continue
            n_pts = int(np.load(adv)["test_pc"].shape[1])
            r = inf_main([
                "--data", adv, "--checkpoint", ckpt,
                "--num_points", str(n_pts), "--no_adjust_points",
                "--batch_size", str(batch_size), "--mode", "target",
                "--boundary_tau", str(tau)])
            ares.setdefault("success_rate_attack_time",
                            ares.get("success_rate"))
            ares.setdefault("attacked", {})["accuracy"] = r["accuracy"]
            ares["attacked"]["boundary_tau"] = tau
            if a.startswith("drop"):
                ares["success_rate"] = 1.0 - r["accuracy"]
            else:
                ares["success_rate"] = r["target_success"]
            if "none" in ares.get("defended", {}):
                ares["defended"]["none"]["accuracy"] = r["accuracy"]
            count += 1
    return count


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("snapshots", nargs="+",
                   help="results.json files, earliest stage first "
                        "(later files win on conflicting cells)")
    p.add_argument("--out", default=None,
                   help="write the merged tables here (default stdout)")
    p.add_argument("--attacks", nargs="*", default=None,
                   help="row order (default: union in snapshot order)")
    p.add_argument("--victims", nargs="*", default=None,
                   help="table order (default: union in snapshot order)")
    p.add_argument("--rescore_seed_dir", default=None,
                   help="artifact dir (out_dir/seed0) — re-score the "
                        "attacked/success columns from the saved adv "
                        "npz files with margin-tolerant tau scoring")
    p.add_argument("--boundary_tau", type=float, default=0.05,
                   help="scoring margin for --rescore_seed_dir. 0.05 "
                        "measured on the hardest victim (DGCNN x CW "
                        "perturb): with the f32-HIGHEST eval pin, "
                        "chip-vs-CPU margin deltas are p99 0.067 "
                        "concentrated at large margins and every column "
                        "agrees EXACTLY at tau>=0.05 "
                        "(tools/calibrate_tau.py)")
    p.add_argument("--merged_json", default=None,
                   help="also dump the merged+rescored results dict")
    args = p.parse_args(argv)
    snaps = []
    for path in args.snapshots:
        with open(path) as f:
            snaps.append(json.load(f))
    merged = merge_results(snaps)
    if args.rescore_seed_dir:
        n = rescore_boundary_cells(
            merged, args.rescore_seed_dir, args.boundary_tau)
        print(f"re-scored {n} attacked/success cells "
              f"(tau={args.boundary_tau})")
    if args.merged_json:
        with open(args.merged_json, "w") as f:
            json.dump(merged, f, indent=2, default=float)
    text = write_tables(merged, args.attacks, args.victims)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out}")
    else:
        print(text)
    return merged


if __name__ == "__main__":
    main()
