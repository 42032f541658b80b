"""One-command real-data reproduction runbook vs BASELINE.md Tables 2-5.

Takes the reference's published pretrained weights (`.pth`) and a real
ModelNet40 attack npz, and runs the full pipeline the reference's README
describes (`/root/reference/README.md:74-87`, `baselines/command.txt`):
convert weights -> numerically verify them against the torch reference
-> validate the dataset -> clean accuracies -> the Tables 2-5
attack x defense protocol -> a cell-by-cell diff against BASELINE.md.

Every stage runs as far as its inputs allow and reports
PASS / SKIP(reason) / FAIL; absent weight files produce SKIPs, not
crashes, so the runbook is executable end-to-end today and completes
the moment the user drops the files in (BASELINE.md numbers come from
checkpoints this environment does not ship — the reference's Google
Drive links, `README.md:56-66`).

Expected inputs
---------------
--weights_dir with any subset of:
    pointnet.pth pointnet2.pth dgcnn.pth pointconv.pth
        victim classifiers (the reference's BEST_WEIGHTS entries,
        `baselines/config.py:4-41`; nn.DataParallel 'module.' prefixes
        are handled)
    onet.pth convonet.pth
        implicit nets (im2mesh CheckpointIO layout, 'model' key or a
        bare state dict, encoder./decoder. prefixes)
--data: ModelNet40 attack npz — test_pc/test_label (+ target_label;
    synthesized with a fixed seed if absent, like the reference's
    attack-data prep which pre-assigns a random wrong target per cloud).

Usage:
    JAX_PLATFORMS=tpu python tools/reproduce_baseline.py \
        --weights_dir /path/to/pth_files --data mn40_1024.npz \
        --out_dir /tmp/repro [--victims pointnet dgcnn] [--fast]

Stages: inventory convert parity data clean tables diff
(--stages to run a subset; later stages consume earlier artifacts from
--out_dir, so staged invocations resume).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VICTIMS = ["pointnet", "pointnet2", "dgcnn", "pointconv"]
IMPLICITS = ["onet", "convonet"]

# BASELINE.md table header -> our matrix attack key
COL_MAP = {"Clean": "clean", "Perturb": "perturb", "Add-CD": "add",
           "Add-HD": "add_hd", "kNN": "knn", "Drop-100": "drop100",
           "Drop-200": "drop"}
# BASELINE.md defense row -> our defense column (SOR-AE needs an external
# autoencoder the reference repo does not ship either — not covered)
DEF_MAP = {"No defense": "none", "SRS": "srs", "SOR": "sor",
           "DUP-Net": "dup", "ONet-Mesh": "onet_mesh",
           "ONet-Opt": "onet_opt", "ConvONet-Opt": "convonet_opt"}
TABLE_VICTIMS = {"Table 2": "pointnet", "Table 3": "pointnet2",
                 "Table 4": "dgcnn", "Table 5": "pointconv"}

STAGES = ["inventory", "convert", "parity", "data", "clean", "tables",
          "diff"]


def parse_baseline_tables(path: str) -> dict:
    """BASELINE.md Tables 2-5 -> {victim: {defense: {attack: pct}}}.

    The tables are the transcription of the reference paper's published
    ModelNet40 numbers (`/root/reference/imgs/table_results{1,2}.png`).
    """
    with open(path) as f:
        text = f.read()
    out: dict = {}
    for m in re.finditer(
            r"## (Table \d) [^\n]*\n\n\|([^\n]*)\|\n\|[-| ]*\|\n((?:\|[^\n]*\|\n)+)",
            text):
        victim = TABLE_VICTIMS.get(m.group(1))
        if victim is None:
            continue
        headers = [h.strip() for h in m.group(2).split("|")]
        headers = [h for h in headers if h]
        vt: dict = {}
        for row in m.group(3).strip().splitlines():
            cells = [c.strip() for c in row.strip("|").split("|")]
            defense = DEF_MAP.get(cells[0])
            if defense is None:
                continue
            dd = {}
            for h, c in zip(headers[1:], cells[1:]):
                a = COL_MAP.get(h)
                if a is None:
                    continue
                dd[a] = float(c.rstrip("%"))
            vt[defense] = dd
        out[victim] = vt
    return out


def _stamp(report: dict, stage: str, status: str, detail: str):
    report["stages"][stage] = {"status": status, "detail": detail}
    print(f"[{stage}] {status}: {detail}", flush=True)


def stage_inventory(args, report) -> dict:
    found = {}
    for name in VICTIMS + IMPLICITS:
        p = os.path.join(args.weights_dir, f"{name}.pth")
        if os.path.exists(p):
            found[name] = p
    data_ok = os.path.exists(args.data) if args.data else False
    manifest = {"weights": found, "data": args.data if data_ok else None,
                "missing_weights": sorted(
                    set(VICTIMS + IMPLICITS) - set(found))}
    with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    _stamp(report, "inventory", "PASS",
           f"{len(found)}/{len(VICTIMS) + len(IMPLICITS)} weight files, "
           f"data={'yes' if data_ok else 'MISSING'} "
           f"(missing: {', '.join(manifest['missing_weights']) or 'none'})")
    return manifest


def stage_convert(args, report, manifest) -> dict:
    """.pth -> loadable checkpoints: victims to orbax eval checkpoints
    (cli/inference, cli/attack), implicit nets to params npz
    (cli/opt_defense, cli/remesh_defense)."""
    if not manifest["weights"]:
        _stamp(report, "convert", "SKIP", "no .pth files present")
        return {}
    import torch

    from if_defense_tpu.convert import implicit_weights as iw
    from if_defense_tpu.convert import victim_weights as vw
    from if_defense_tpu.utils.checkpoint import save_eval_checkpoint
    from if_defense_tpu.utils.params_io import save_params_npz

    victim_fns = {"pointnet": vw.convert_pointnet_pth,
                  "pointnet2": vw.convert_pointnet2_pth,
                  "dgcnn": vw.convert_dgcnn_pth,
                  "pointconv": vw.convert_pointconv_pth}
    implicit_fns = {"onet": iw.convert_onet_pth,
                    "convonet": iw.convert_convonet_pth}
    converted = {}
    for name, pth in manifest["weights"].items():
        sd = torch.load(pth, map_location="cpu")
        if isinstance(sd, dict) and "model" in sd and not any(
                hasattr(v, "shape") for v in sd.values()):
            sd = sd["model"]  # im2mesh CheckpointIO layout
        if name in victim_fns:
            variables = victim_fns[name](sd)
            out = os.path.join(args.out_dir, "ckpts", name)
            save_eval_checkpoint(out, variables, {
                "model": name, "source": os.path.abspath(pth)})
        else:
            params = implicit_fns[name](sd)
            out = os.path.join(args.out_dir, "ckpts", f"{name}_w.npz")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            save_params_npz(out, params)
        converted[name] = out
    with open(os.path.join(args.out_dir, "converted.json"), "w") as f:
        json.dump(converted, f, indent=2)
    _stamp(report, "convert", "PASS",
           f"converted {', '.join(sorted(converted))}")
    return converted


def stage_parity(args, report, manifest):
    """Forward-parity of each converted net vs the torch reference
    running the SAME real weights (tools/parity_{victims,implicit})."""
    if not manifest["weights"]:
        _stamp(report, "parity", "SKIP", "no .pth files present")
        return
    if not os.path.isdir("/root/reference"):
        _stamp(report, "parity", "SKIP", "torch reference repo absent")
        return
    import torch

    from tools import parity_implicit as pi
    from tools import parity_victims as pv

    checks = {"pointnet": pv.check_pointnet, "pointnet2": pv.check_pointnet2,
              "dgcnn": pv.check_dgcnn, "pointconv": pv.check_pointconv,
              "onet": pi.check_onet, "convonet": pi.check_convonet}
    worst, failed = 0.0, []
    for name, pth in sorted(manifest["weights"].items()):
        sd = torch.load(pth, map_location="cpu")
        if isinstance(sd, dict) and "model" in sd and not any(
                hasattr(v, "shape") for v in sd.values()):
            sd = sd["model"]
        try:
            d = checks[name](sd=sd)
        except Exception as e:  # e.g. checkpoint arch != harness arch
            failed.append(f"{name} ({type(e).__name__}: {e})")
            continue
        worst = max(worst, float(d))
        if d >= 1e-3:
            failed.append(f"{name} ({d:.2e})")
    if failed:
        _stamp(report, "parity", "FAIL", "diverged: " + ", ".join(failed))
    else:
        _stamp(report, "parity", "PASS",
               f"{len(manifest['weights'])} nets, worst |Δ| {worst:.2e}")


def stage_data(args, report, manifest) -> str | None:
    """Validate the ModelNet40 npz; synthesize seeded targets if absent."""
    if not manifest["data"]:
        _stamp(report, "data", "SKIP", "no --data npz present")
        return None
    from if_defense_tpu.data.npz import load_npz, save_npz

    d = load_npz(args.data)
    if d.test_pc is None or d.test_label is None:
        _stamp(report, "data", "FAIL",
               f"{args.data} lacks test_pc/test_label")
        return None
    n, p = d.test_pc.shape[0], d.test_pc.shape[1]
    k = int(d.test_label.max()) + 1
    if d.target_label is not None:
        _stamp(report, "data", "PASS",
               f"{n} test clouds x {p} pts, {k} classes, targets present")
        return args.data
    # reference protocol: one fixed random wrong target per cloud
    rng = np.random.default_rng(0)
    tgt = rng.integers(0, k, size=n)
    clash = tgt == d.test_label
    tgt[clash] = (tgt[clash] + 1) % k
    out = os.path.join(args.out_dir, "data_with_targets.npz")
    save_npz(out, {"test_pc": d.test_pc, "test_label": d.test_label,
                   "target_label": tgt.astype(np.int64)})
    _stamp(report, "data", "PASS",
           f"{n} test clouds x {p} pts, {k} classes; synthesized seeded "
           f"targets -> {out}")
    return out


def stage_clean(args, report, manifest, converted, data_npz, baseline):
    victims = [v for v in args.victims if v in converted]
    if not victims or data_npz is None:
        _stamp(report, "clean", "SKIP",
               "needs converted victim checkpoints + data")
        return
    from if_defense_tpu.cli.inference import main as inf_main

    lines = []
    for v in victims:
        r = inf_main(["--data", data_npz, "--checkpoint", converted[v],
                      "--num_points", str(args.num_points),
                      "--batch_size", str(args.batch_size)])
        ref = baseline.get(v, {}).get("none", {}).get("clean")
        delta = (f" (ref {ref:.2f}, Δ{100 * r['accuracy'] - ref:+.2f})"
                 if ref is not None else "")
        lines.append(f"{v} {100 * r['accuracy']:.2f}%{delta}")
    _stamp(report, "clean", "PASS", "; ".join(lines))


def stage_tables(args, report, manifest, converted, data_npz):
    victims = [v for v in args.victims if v in converted]
    have_impl = [i for i in IMPLICITS if i in converted]
    if not victims or data_npz is None:
        _stamp(report, "tables", "SKIP",
               "needs converted victim checkpoints + data")
        return None
    defenses = [d for d in args.defenses
                if d.split("_")[0] not in IMPLICITS
                or d.split("_")[0] in have_impl]
    from tools.accuracy_benchmark import main as bench_main

    bench_main([
        "--out_dir", args.out_dir, "--seeds", "0",
        "--victims", *victims,
        "--attacks", *args.attacks,
        "--defenses", *defenses,
        "--num_points", str(args.num_points),
        "--batch_size", str(args.batch_size),
        "--data_npz", data_npz,
        "--victim_ckpts", *[f"{v}={converted[v]}" for v in victims],
        *((["--implicit_weights"]
           + [f"{i}={converted[i]}" for i in have_impl])
          if have_impl else []),
        "--reuse_artifacts",
        *(["--fast"] if args.fast else []),
    ])
    res_path = os.path.join(args.out_dir, "seed0", "results.json")
    dropped = sorted(set(args.defenses) - set(defenses))
    _stamp(report, "tables", "PASS",
           f"{len(victims)} victims x {len(args.attacks)} attacks x "
           f"{len(defenses)} defenses -> {res_path}"
           + (f" (dropped for missing implicit weights: "
              f"{', '.join(dropped)})" if dropped else ""))
    return res_path


def diff_report(results: dict, baseline: dict, tol: float) -> tuple[str, int]:
    """Markdown cell-by-cell diff; returns (markdown, n_out_of_tol)."""
    lines = ["# Reproduction vs BASELINE.md (published reference numbers)",
             "", f"Tolerance for a matching cell: ±{tol} accuracy points.",
             ""]
    n_bad = 0
    for victim, vres in results.get("victims", {}).items():
        ref_v = baseline.get(victim)
        if ref_v is None:
            continue
        lines += [f"## {victim}", "",
                  "| defense | attack | ours | reference | Δ | ok |",
                  "|---|---|---|---|---|---|"]
        for defense, ref_cells in ref_v.items():
            for attack, ref_pct in ref_cells.items():
                ares = vres.get("attacks", {}).get(attack)
                if defense == "none" and attack == "clean":
                    ours = vres.get("clean_accuracy")
                elif ares is None:
                    continue
                elif defense == "none":
                    ours = ares.get("attacked", {}).get("accuracy")
                else:
                    ours = ares.get("defended", {}).get(
                        defense, {}).get("accuracy")
                if ours is None:
                    continue
                ours_pct = 100.0 * float(ours)
                delta = ours_pct - ref_pct
                ok = abs(delta) <= tol
                n_bad += 0 if ok else 1
                lines.append(
                    f"| {defense} | {attack} | {ours_pct:.2f} | "
                    f"{ref_pct:.2f} | {delta:+.2f} | "
                    f"{'yes' if ok else 'NO'} |")
        lines.append("")
    return "\n".join(lines), n_bad


def stage_diff(args, report, results_path, baseline):
    if results_path is None or not os.path.exists(results_path):
        _stamp(report, "diff", "SKIP", "no tables results to diff")
        return
    with open(results_path) as f:
        results = json.load(f)
    md, n_bad = diff_report(results, baseline, args.tolerance)
    out = os.path.join(args.out_dir, "REPRODUCE.md")
    with open(out, "w") as f:
        f.write(md)
    status = "PASS" if n_bad == 0 else "FAIL"
    _stamp(report, "diff", status,
           f"{out}; {n_bad} cells outside ±{args.tolerance} points")


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__.splitlines()[0],
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--weights_dir", required=True)
    p.add_argument("--data", default=None,
                   help="ModelNet40 npz (test_pc/test_label[/target_label])")
    p.add_argument("--out_dir", default="/tmp/reproduce_baseline")
    p.add_argument("--victims", nargs="+", default=VICTIMS)
    p.add_argument("--attacks", nargs="+",
                   default=["clean", "perturb", "add", "add_hd", "knn",
                            "drop100", "drop"],
                   help="BASELINE.md columns (LG-GAN/AdvPC come from "
                        "external attack codebases the reference repo "
                        "does not ship)")
    p.add_argument("--defenses", nargs="+",
                   default=["none", "srs", "sor", "dup", "onet_opt",
                            "convonet_opt", "onet_mesh", "convonet_mesh"])
    p.add_argument("--stages", nargs="+", default=STAGES, choices=STAGES)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=40)
    p.add_argument("--tolerance", type=float, default=2.0,
                   help="per-cell accuracy-point tolerance for the diff "
                        "stage (1 seed, 1024-pt resample: ~±1.5 noise)")
    p.add_argument("--baseline_md",
                   default=os.path.join(os.path.dirname(
                       os.path.dirname(os.path.abspath(__file__))),
                       "BASELINE.md"))
    p.add_argument("--fast", action="store_true",
                   help="smoke sizes (tiny attack budgets) — pipeline "
                        "check only, numbers will not match")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    baseline = parse_baseline_tables(args.baseline_md)
    report: dict = {"stages": {}, "started": time.time()}

    manifest = stage_inventory(args, report)
    converted: dict = {}
    if "convert" in args.stages:
        converted = stage_convert(args, report, manifest)
    elif os.path.exists(os.path.join(args.out_dir, "converted.json")):
        with open(os.path.join(args.out_dir, "converted.json")) as f:
            converted = json.load(f)
    if "parity" in args.stages:
        stage_parity(args, report, manifest)
    data_npz = None
    if "data" in args.stages:
        data_npz = stage_data(args, report, manifest)
    else:
        # staged resume: consume the data stage's artifact from a prior
        # invocation (synthesized-targets npz, else the raw --data)
        prior = os.path.join(args.out_dir, "data_with_targets.npz")
        if os.path.exists(prior):
            data_npz = prior
        elif manifest["data"]:
            data_npz = args.data
    if "clean" in args.stages:
        stage_clean(args, report, manifest, converted, data_npz, baseline)
    results_path = None
    if "tables" in args.stages:
        results_path = stage_tables(args, report, manifest, converted,
                                    data_npz)
    elif os.path.exists(os.path.join(args.out_dir, "seed0",
                                     "results.json")):
        results_path = os.path.join(args.out_dir, "seed0", "results.json")
    if "diff" in args.stages:
        stage_diff(args, report, results_path, baseline)

    report["seconds"] = time.time() - report["started"]
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    statuses = [s["status"] for s in report["stages"].values()]
    print("RUNBOOK", "FAIL" if "FAIL" in statuses else "OK",
          "(" + ", ".join(f"{k}:{v['status']}"
                          for k, v in report["stages"].items()) + ")")
    return 1 if "FAIL" in statuses else 0


if __name__ == "__main__":
    sys.exit(main())
