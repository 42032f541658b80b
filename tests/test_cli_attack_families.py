"""CLI-level smoke per attack family on the hard synthetic data.

One row per attack family through the REAL attack CLI (VERDICT r2 item
4): kNN consumes the 6-channel normals schema, Add-Cluster runs its
DBSCAN init, Add/Add-Object change the output point count that
inference must adjust for (`baselines/inference.py:127-149`) — quirks
the perturb-only e2e chain never touches.
"""

import json
import os

import numpy as np
import pytest

N_POINTS = 128
BATCH = 8


@pytest.fixture(scope="module")
def victim(tmp_path_factory):
    out = tmp_path_factory.mktemp("attack_families")
    from tools.synthetic_dataset import make_classification_npz

    data = make_classification_npz(
        str(out / "hard.npz"), train_per_class=4, test_per_class=2,
        num_points=N_POINTS, seed=0, family="hard")
    d = np.load(data)
    assert d["test_pc"].shape[-1] == 6          # xyz + normals
    assert d["train_pc"].shape[-1] == 3

    from if_defense_tpu.cli.train import main as train_main

    run_dir = str(out / "pointnet")
    train_main([
        "--data", data, "--model", "pointnet",
        "--num_points", str(N_POINTS), "--epochs", "2",
        "--batch_size", str(BATCH), "--eval_every", "1",
        "--output", run_dir,
        # keep the checked-in default weights/registry.json untouched
        "--registry", str(out / "registry.json"),
    ])
    return dict(out=out, data=data, ckpt=os.path.join(run_dir, "best"))


CASES = [
    # (attack, extra args, extra output points)
    ("knn", ["--num_iter", "10"], 0),
    ("add", ["--binary_step", "1", "--num_iter", "10",
             "--num_add", "32"], 32),
    ("add_cluster", ["--binary_step", "1", "--num_iter", "10",
                     "--num_add", "2"], 2 * 32),
    ("add_object", ["--binary_step", "1", "--num_iter", "10",
                    "--num_add", "2"], 2 * 64),
    ("mifgm", ["--num_iter", "5"], 0),
    ("drop", ["--num_drop", "16"], -16),
]


@pytest.mark.parametrize("attack,extra,extra_pts",
                         [c for c in CASES], ids=[c[0] for c in CASES])
def test_attack_family_cli(victim, attack, extra, extra_pts):
    from if_defense_tpu.cli.attack import main as attack_main
    from if_defense_tpu.cli.inference import main as inf_main

    out_npz = str(victim["out"] / f"{attack}.npz")
    path, rate = attack_main([
        "--attack", attack, "--data", victim["data"],
        "--checkpoint", victim["ckpt"],
        "--num_points", str(N_POINTS), "--batch_size", str(BATCH),
        "--output", out_npz, *extra,
    ])
    assert 0.0 <= rate <= 1.0
    d = np.load(path)
    assert d["test_pc"].shape[1] == N_POINTS + extra_pts
    assert d["test_pc"].shape[-1] == 3
    assert np.isfinite(d["test_pc"]).all()
    assert set(d.files) >= {"test_pc", "test_label", "target_label"}
    m = [json.loads(l) for l in open(path + ".metrics.jsonl")]
    assert m[-1]["attack"] == attack

    # the scoring path must accept the (possibly grown) point count
    r = inf_main([
        "--data", path, "--checkpoint", victim["ckpt"],
        "--num_points", str(d["test_pc"].shape[1]),
        "--batch_size", str(BATCH), "--mode", "target"])
    assert 0.0 <= r["accuracy"] <= 1.0


def test_matrix_alias_attack_args():
    """The matrix driver's alias cells map to the right CLI invocations
    (`add_hd` = CW-Add + Hausdorff adv distance, `drop100` = Drop with
    num_drop=100 — the reference tables' parameter-variant columns)."""
    from tools.accuracy_benchmark import attack_cli_args

    cw, knn_it, nd = (10, 500), 2500, 200
    assert attack_cli_args("perturb", cw, knn_it, nd) == (
        "perturb", ["--binary_step", "10", "--num_iter", "500"])
    assert attack_cli_args("add", cw, knn_it, nd) == (
        "add", ["--binary_step", "5", "--num_iter", "500"])
    assert attack_cli_args("add_hd", cw, knn_it, nd) == (
        "add", ["--binary_step", "5", "--num_iter", "500",
                "--adv_dist", "hausdorff"])
    assert attack_cli_args("knn", cw, knn_it, nd) == (
        "knn", ["--num_iter", "2500"])
    assert attack_cli_args("drop", cw, knn_it, nd) == (
        "drop", ["--num_drop", "200"])
    assert attack_cli_args("drop100", cw, knn_it, nd) == (
        "drop", ["--num_drop", "100"])
    # non-parameterised attacks pass through with no extra flags
    for a in ("fgm", "ifgm", "mifgm", "pgd"):
        assert attack_cli_args(a, cw, knn_it, nd) == (a, [])
