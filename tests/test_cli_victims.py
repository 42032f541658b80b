"""Attack CLI x victim-model smoke: every victim through the real CLIs.

The matrix's PointNet++ leg surfaced two real-hardware bugs (the
grad-through-Pallas-FPS JVP failure and the device-call-length worker
kill) that no PointNet row could reach — each victim family exercises
different kernels under input-gradient attacks (FPS/ball-query for
PointNet++/PointConv, dynamic-kNN EdgeConv for DGCNN/RS-CNN). This
smoke runs train -> CW-Perturb (short) -> target-mode scoring for each
non-PointNet victim (PointNet is covered by test_cli_e2e.py and
test_cli_attack_families.py). Reference protocol:
`baselines/command.txt`, `baselines/attack_scripts/targeted_perturb_attack.py`.
"""

import json
import os

import numpy as np
import pytest

N_POINTS = 128
BATCH = 8

VICTIMS = ["pointnet2", "dgcnn", "pointconv", "rscnn"]


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_victims")
    from tools.synthetic_dataset import make_classification_npz

    npz = make_classification_npz(
        str(out / "hard.npz"), train_per_class=4, test_per_class=2,
        num_points=N_POINTS, seed=0, family="hard")
    return dict(out=out, npz=npz)


def _train(data, victim):
    from if_defense_tpu.cli.train import main as train_main

    out = data["out"]
    run_dir = str(out / victim)
    if not os.path.isdir(run_dir):
        train_main([
            "--data", data["npz"], "--model", victim,
            "--num_points", str(N_POINTS), "--epochs", "1",
            "--batch_size", str(BATCH), "--eval_every", "1",
            "--output", run_dir,
            "--registry", str(out / "registry.json"),
        ])
    return os.path.join(run_dir, "best")


@pytest.mark.parametrize("victim", VICTIMS)
def test_perturb_cli_per_victim(data, victim):
    from if_defense_tpu.cli.attack import main as attack_main
    from if_defense_tpu.cli.inference import main as inf_main

    out = data["out"]
    ckpt = _train(data, victim)

    out_npz = str(out / f"perturb-{victim}.npz")
    path, rate = attack_main([
        "--attack", "perturb", "--data", data["npz"],
        "--checkpoint", ckpt, "--model", victim,
        "--num_points", str(N_POINTS), "--batch_size", str(BATCH),
        "--binary_step", "1", "--num_iter", "8",
        "--output", out_npz,
    ])
    assert 0.0 <= rate <= 1.0
    d = np.load(path)
    assert d["test_pc"].shape[1] == N_POINTS
    assert np.isfinite(d["test_pc"]).all()
    m = [json.loads(l) for l in open(path + ".metrics.jsonl")]
    assert m[-1]["attack"] == "perturb"

    r = inf_main([
        "--data", path, "--checkpoint", ckpt, "--model", victim,
        "--num_points", str(N_POINTS), "--batch_size", str(BATCH),
        "--mode", "target"])
    assert 0.0 <= r["accuracy"] <= 1.0


# Attack x victim combinations with distinct gradient paths: the kNN
# attack differentiates through DGCNN's dynamic-kNN EdgeConv graph (and
# consumes the 6-channel normals schema); Add-Cluster's critical-point
# DBSCAN init reads input-gradient magnitudes through PointConv's
# density-KDE forward. Neither combination is reachable from the
# PointNet-only family smokes.
CROSS = [("dgcnn", "knn", ["--num_iter", "8"], 0),
         ("pointconv", "add_cluster",
          ["--binary_step", "1", "--num_iter", "8", "--num_add", "2"],
          2 * 32)]


@pytest.mark.parametrize("victim,attack,extra,extra_pts", CROSS,
                         ids=[f"{v}-{a}" for v, a, _, _ in CROSS])
def test_cross_attack_cli(data, victim, attack, extra, extra_pts):
    from if_defense_tpu.cli.attack import main as attack_main

    out = data["out"]
    ckpt = _train(data, victim)
    path, rate = attack_main([
        "--attack", attack, "--data", data["npz"],
        "--checkpoint", ckpt, "--model", victim,
        "--num_points", str(N_POINTS), "--batch_size", str(BATCH),
        "--output", str(out / f"{attack}-{victim}.npz"), *extra,
    ])
    assert 0.0 <= rate <= 1.0
    d = np.load(path)
    assert d["test_pc"].shape[1] == N_POINTS + extra_pts
    assert np.isfinite(d["test_pc"]).all()
