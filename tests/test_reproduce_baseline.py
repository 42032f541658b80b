"""Stage-level tests for the real-data reproduction runbook.

`tools/reproduce_baseline.py` is the one-command path from the
reference's published `.pth` checkpoints + ModelNet40 npz to a
cell-by-cell diff against BASELINE.md (Tables 2-5,
`/root/reference/README.md:74-87`). The weight files themselves are not
in this environment, so these tests exercise every stage on stand-ins:
the BASELINE.md parser, the diff report, graceful degradation with
missing inputs, target synthesis, and (when torch + the reference repo
are present) a real .pth round-trip through convert + parity.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import reproduce_baseline as rb  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _has_torch():
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


def test_baseline_parser_spot_cells():
    tables = rb.parse_baseline_tables(os.path.join(REPO, "BASELINE.md"))
    assert set(tables) == {"pointnet", "pointnet2", "dgcnn", "pointconv"}
    # spot-check transcribed cells against the README images
    assert tables["pointnet"]["none"]["clean"] == 88.41
    assert tables["pointnet"]["convonet_opt"]["perturb"] == 86.30
    assert tables["dgcnn"]["dup"]["clean"] == 53.54  # Table 4 collapse
    assert tables["pointconv"]["sor"]["knn"] == 26.13  # Table 5 failure
    assert tables["pointnet2"]["onet_mesh"]["drop"] == 72.93
    # every defense row carries all 7 covered columns
    for v, vt in tables.items():
        assert set(vt) == set(rb.DEF_MAP.values())
        for cells in vt.values():
            assert set(cells) == set(rb.COL_MAP.values())


def test_diff_report_flags_out_of_tolerance():
    baseline = {"pointnet": {
        "none": {"clean": 88.41, "perturb": 0.0},
        "sor": {"perturb": 82.81},
    }}
    results = {"victims": {"pointnet": {
        "clean_accuracy": 0.8850,
        "attacks": {"perturb": {
            "attacked": {"accuracy": 0.0},
            "defended": {"sor": {"accuracy": 0.7281}},
        }},
    }}}
    md, n_bad = rb.diff_report(results, baseline, tol=2.0)
    assert n_bad == 1  # SOR cell is 10 points off
    assert "| sor | perturb | 72.81 | 82.81 | -10.00 | NO |" in md
    assert "| none | clean | 88.50 | 88.41 | +0.09 | yes |" in md
    # missing cells are skipped, not scored
    assert md.count("| none | perturb |") == 1


def test_runbook_degrades_without_inputs(tmp_path):
    """No weights, no data: every dependent stage SKIPs, exit code 0."""
    wdir = tmp_path / "weights"
    wdir.mkdir()
    rc = rb.main(["--weights_dir", str(wdir),
                  "--out_dir", str(tmp_path / "out")])
    assert rc == 0
    with open(tmp_path / "out" / "report.json") as f:
        report = json.load(f)["stages"]
    assert report["inventory"]["status"] == "PASS"
    for stage in ("convert", "parity", "data", "clean", "tables", "diff"):
        assert report[stage]["status"] == "SKIP", stage
    with open(tmp_path / "out" / "manifest.json") as f:
        manifest = json.load(f)
    assert len(manifest["missing_weights"]) == 6


def test_data_stage_synthesizes_targets(tmp_path):
    from if_defense_tpu.data.npz import load_npz, save_npz

    rng = np.random.default_rng(0)
    src = tmp_path / "mn40.npz"
    save_npz(str(src), {
        "test_pc": rng.normal(size=(8, 64, 3)).astype(np.float32),
        "test_label": rng.integers(0, 5, size=8),
    })
    args = rb.parse_args(["--weights_dir", str(tmp_path),
                          "--data", str(src),
                          "--out_dir", str(tmp_path / "out")])
    os.makedirs(args.out_dir, exist_ok=True)
    report = {"stages": {}}
    out = rb.stage_data(args, report, {"data": str(src)})
    assert report["stages"]["data"]["status"] == "PASS"
    d = load_npz(out)
    assert d.target_label is not None
    assert (d.target_label != d.test_label).all()
    # deterministic: same input -> same targets
    out2 = rb.stage_data(args, report, {"data": str(src)})
    assert (load_npz(out2).target_label == d.target_label).all()


@pytest.mark.skipif(not _has_torch(), reason="torch not installed")
@pytest.mark.skipif(not os.path.isdir("/root/reference/baselines"),
                    reason="reference repo absent")
def test_convert_and_parity_stages_roundtrip_real_pth(tmp_path):
    """Save a real torch PointNet .pth, run convert + parity stages, and
    load the produced checkpoint through the CLI loader."""
    import torch

    sys.path.insert(0, "/root/reference/baselines")
    from model.pointnet import PointNetCls

    torch.manual_seed(0)
    net = PointNetCls(k=40, feature_transform=False, use_bn=True)
    net.eval()
    with torch.no_grad():  # non-trivial BN running stats
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    wdir = tmp_path / "weights"
    wdir.mkdir()
    # DataParallel-style prefixes, like the published BEST_WEIGHTS
    torch.save({"module." + k: v for k, v in net.state_dict().items()},
               str(wdir / "pointnet.pth"))

    args = rb.parse_args(["--weights_dir", str(wdir),
                          "--out_dir", str(tmp_path / "out")])
    os.makedirs(args.out_dir, exist_ok=True)
    report = {"stages": {}}
    manifest = rb.stage_inventory(args, report)
    assert manifest["weights"] == {"pointnet": str(wdir / "pointnet.pth")}

    converted = rb.stage_convert(args, report, manifest)
    assert report["stages"]["convert"]["status"] == "PASS"

    rb.stage_parity(args, report, manifest)
    assert report["stages"]["parity"]["status"] == "PASS", \
        report["stages"]["parity"]["detail"]

    # the converted checkpoint is loadable by the inference/attack CLIs
    from if_defense_tpu.cli.inference import load_eval_model

    import jax.numpy as jnp

    model, variables, meta = load_eval_model(converted["pointnet"])
    assert meta["model"] == "pointnet"
    pc = np.random.default_rng(0).normal(size=(2, 128, 3)).astype(np.float32)
    logits_j, _ = model.apply(variables, jnp.asarray(pc), train=False)
    with torch.no_grad():
        logits_t = net(torch.from_numpy(pc.transpose(0, 2, 1)))[0].numpy()
    assert np.abs(np.asarray(logits_j) - logits_t).max() < 1e-3
