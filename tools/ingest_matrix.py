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
    args = p.parse_args(argv)
    snaps = []
    for path in args.snapshots:
        with open(path) as f:
            snaps.append(json.load(f))
    merged = merge_results(snaps)
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
