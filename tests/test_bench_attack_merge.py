"""bench_attack JSON merging: reruns must extend, never delete.

Guards the review-r4 data-loss class: a single-attack rerun used to
replace the victim's whole results dict, destroying previously recorded
measurements (BENCH_ATTACK.json had to be repaired from git).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_attack import merge_record


def test_single_attack_rerun_keeps_other_entries(tmp_path):
    out = str(tmp_path / "b.json")
    with open(out, "w") as f:
        json.dump({"metric": "attack_clouds_per_sec", "batch": 64,
                   "num_points": 1024, "note": "orig",
                   "victims": {"pointnet": {"ifgm_50": 440.0},
                               "pointnet2": {"cw_perturb_10x500": 0.59,
                                             "ifgm_50": 56.8}}}, f)
    m = merge_record(out, "pointnet2", {"cw_perturb_10x500_b128": 0.89},
                     128, 1024)
    assert m["victims"]["pointnet2"] == {
        "cw_perturb_10x500": 0.59, "ifgm_50": 56.8,
        "cw_perturb_10x500_b128": 0.89}
    assert m["victims"]["pointnet"] == {"ifgm_50": 440.0}
    assert m["batch"] == 64          # describes the retained entries
    assert m["note"] == "orig"


def test_rerun_updates_same_key(tmp_path):
    out = str(tmp_path / "b.json")
    with open(out, "w") as f:
        json.dump({"victims": {"pointnet": {"ifgm_50": 440.0}}}, f)
    m = merge_record(out, "pointnet", {"ifgm_50": 450.0}, 64, 1024)
    assert m["victims"]["pointnet"] == {"ifgm_50": 450.0}


def test_fresh_file_and_legacy_layout(tmp_path):
    m = merge_record(str(tmp_path / "none.json"), "pointnet",
                     {"ifgm_50": 440.0}, 64, 1024)
    assert m["victims"] == {"pointnet": {"ifgm_50": 440.0}}
    assert m["batch"] == 64
    out = str(tmp_path / "legacy.json")
    with open(out, "w") as f:
        json.dump({"victim": "pointnet", "results": {"ifgm_50": 440.0},
                   "batch": 64}, f)
    m = merge_record(out, "pointnet2", {"ifgm_50": 56.8}, 64, 1024)
    assert m["victims"] == {"pointnet": {"ifgm_50": 440.0},
                            "pointnet2": {"ifgm_50": 56.8}}
