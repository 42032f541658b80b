"""End-to-end CLI chain on a tiny synthetic dataset (CPU mesh).

Ports `tools/e2e_demo.py` to pytest at toy scale: train -> attack ->
defend_npz -> opt_defense -> inference, all through the CLI mains, so a
CLI-level regression (argument plumbing, sharding, npz/metrics writing)
fails CI. Mirrors the reference's de-facto integration test — running
`baselines/inference.py` on attack/defense outputs (`command.txt`).
"""

import json
import os

import jax
import numpy as np
import pytest

N_POINTS = 128
BATCH = 8


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    """Run the full train->attack->defend->infer chain once; tests assert."""
    out = tmp_path_factory.mktemp("e2e")
    from tools.synthetic_dataset import make_classification_npz

    data = make_classification_npz(
        str(out / "synth.npz"), train_per_class=6, test_per_class=2,
        num_points=N_POINTS, seed=0)

    from if_defense_tpu.cli.train import main as train_main

    run_dir = str(out / "pointnet")
    registry = str(out / "registry.json")
    best_acc = train_main([
        "--data", data, "--model", "pointnet",
        "--num_points", str(N_POINTS), "--epochs", "12",
        "--batch_size", str(BATCH), "--eval_every", "4",
        "--output", run_dir, "--registry", registry,
    ])
    ckpt = os.path.join(run_dir, "best")

    from if_defense_tpu.cli.attack import main as attack_main

    adv_path, attack_rate = attack_main([
        "--attack", "perturb", "--data", data, "--checkpoint", ckpt,
        "--num_points", str(N_POINTS), "--batch_size", str(BATCH),
        "--binary_step", "2", "--num_iter", "30",
        "--output", str(out / "perturb-pointnet-synth.npz"),
    ])

    from if_defense_tpu.cli.defend_npz import main as defend_main

    sor_path, = defend_main([
        "--data_root", adv_path, "--defense", "sor",
        "--batch_size", str(BATCH)])

    from if_defense_tpu.cli.opt_defense import main as opt_main
    from if_defense_tpu.implicit import ConvOccupancyNetwork
    from if_defense_tpu.utils.params_io import save_params_npz

    conv = ConvOccupancyNetwork()
    zeros = np.zeros((1, 32, 3), np.float32)
    weights = str(out / "convonet_rand.npz")
    save_params_npz(weights, conv.init(jax.random.key(0), zeros, zeros))
    opt_path, = opt_main([
        "--variant", "convonet", "--data_root", adv_path,
        "--weights", weights, "--iterations", "3",
        "--sample_npoint", "64", "--batch_size", str(BATCH),
    ])

    from if_defense_tpu.cli.remesh_defense import main as remesh_main

    mesh_path, = remesh_main([
        "--variant", "convonet", "--data_root", adv_path,
        "--weights", weights, "--batch_size", str(BATCH),
        "--resolution0", "8", "--upsample", "2", "--input_npoint", "32",
        "--sample_npoint", "64", "--wire", "int8",
    ])

    # hybrid training: defend the CLEAN npz (train + test) to build the
    # defended half of the ModelNet40Hybrid concat, then hybrid_train
    # (reference protocol: opt_defense --train -> hybrid_train.py)
    hyb_src, = opt_main([
        "--variant", "convonet", "--data_root", data,
        "--weights", weights, "--iterations", "2",
        "--sample_npoint", str(N_POINTS), "--batch_size", str(BATCH),
        "--train",
    ])

    from if_defense_tpu.cli.hybrid_train import main as hybrid_main

    hyb_dir = str(out / "hybrid")
    hybrid_main([
        "--data", data, "--def_data", hyb_src, "--model", "pointnet",
        "--num_points", str(N_POINTS), "--epochs", "4",
        "--batch_size", str(BATCH), "--eval_every", "2",
        "--output", hyb_dir,
        "--registry", str(out / "hyb_registry.json"),
    ])

    from if_defense_tpu.cli.inference import main as inf_main

    def acc_of(path, ckpt_arg=ckpt, extra=()):
        r = inf_main([
            "--data", path, "--checkpoint", ckpt_arg,
            "--num_points", str(N_POINTS), "--batch_size", str(BATCH),
            "--mode", "target", *extra])
        return r

    return dict(
        out=out, data=data, ckpt=ckpt, registry=registry,
        best_acc=best_acc, adv_path=adv_path, attack_rate=attack_rate,
        sor_path=sor_path, opt_path=opt_path, mesh_path=mesh_path,
        hyb_src=hyb_src, hyb_dir=hyb_dir, acc_of=acc_of,
    )


def test_training_produced_checkpoint_and_metrics(chain):
    assert os.path.isdir(chain["ckpt"])
    metrics = os.path.join(os.path.dirname(chain["ckpt"]), "metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics)]
    assert any("test_acc" in l for l in lines)
    assert chain["best_acc"] > 0.3  # 8 classes, tiny model: >> chance


def test_registry_records_and_resolves(chain):
    reg = json.load(open(chain["registry"]))
    assert reg["synth"][str(N_POINTS)]["pointnet"] == os.path.abspath(
        chain["ckpt"])
    # inference accepts registry:<dataset> checkpoints
    r = chain["acc_of"](
        chain["data"], ckpt_arg="registry:synth",
        extra=("--model", "pointnet", "--registry", chain["registry"]))
    assert 0.0 <= r["accuracy"] <= 1.0


def test_attack_writes_npz_and_reduces_accuracy(chain):
    assert os.path.exists(chain["adv_path"])
    d = np.load(chain["adv_path"])
    assert d["test_pc"].shape[1:] == (N_POINTS, 3)
    assert set(d.files) >= {"test_pc", "test_label", "target_label"}
    assert os.path.exists(chain["adv_path"] + ".metrics.jsonl")

    clean = chain["acc_of"](chain["data"])
    attacked = chain["acc_of"](chain["adv_path"])
    assert chain["attack_rate"] > 0.2
    assert attacked["accuracy"] < clean["accuracy"]
    assert attacked["target_success"] >= chain["attack_rate"] - 1e-6


def test_sor_defense_output(chain):
    d = np.load(chain["sor_path"])
    assert d["test_pc"].shape[1:] == (N_POINTS, 3)
    r = chain["acc_of"](chain["sor_path"])
    assert 0.0 <= r["accuracy"] <= 1.0


def test_opt_defense_output(chain):
    d = np.load(chain["opt_path"])
    assert d["test_pc"].shape[1:] == (64, 3)
    assert np.isfinite(d["test_pc"]).all()
    m = [json.loads(l) for l in open(chain["opt_path"] + ".metrics.jsonl")]
    assert m[-1]["clouds"] == len(d["test_pc"])
    # random implicit weights: only the mechanics are asserted
    r = chain["acc_of"](chain["opt_path"])
    assert 0.0 <= r["accuracy"] <= 1.0


def test_hybrid_train_tracks_ori_and_def_accuracy(chain):
    """hybrid_train evaluates the clean and defended test subsets
    SEPARATELY every eval epoch and snapshots the best checkpoint by
    DEFENDED accuracy (`baselines/hybrid_train.py:100-135`)."""
    d = np.load(chain["hyb_src"])
    assert {"train_pc", "train_label", "test_pc", "test_label"} <= set(
        d.files)

    metrics = os.path.join(chain["hyb_dir"], "metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics)]
    evals = [l for l in lines if "test_acc" in l]
    assert evals and all("def_test_acc" in l for l in evals)
    final = lines[-1]
    assert {"best_acc", "best_def_acc", "best_epoch",
            "best_def_epoch"} <= set(final)
    assert final["best_def_acc"] == max(l["def_test_acc"] for l in evals)
    # the snapshot is the best-def epoch's checkpoint
    ckpt = os.path.join(chain["hyb_dir"], "best")
    assert os.path.isdir(ckpt)
    import orbax.checkpoint  # noqa: F401 — exercised via inference below

    r = chain["acc_of"](chain["data"], ckpt_arg=ckpt)
    assert 0.0 <= r["accuracy"] <= 1.0


def test_hybrid_train_requires_def_data():
    from if_defense_tpu.cli.hybrid_train import main as hybrid_main

    with pytest.raises(SystemExit):
        hybrid_main(["--data", "x.npz", "--model", "pointnet"])


def test_train_implicit_cli_smoke(tmp_path):
    """train_implicit's MAIN runs on a synthetic occupancy npz and writes
    loadable weights + metrics (role of the reference's ONet training
    producing `pretrain/*.pth`)."""
    rng = np.random.default_rng(0)
    n, p, q = 8, 64, 128
    pc = rng.normal(size=(n, p, 3)).astype(np.float32)
    pc /= np.linalg.norm(pc, axis=-1, keepdims=True) * 3.0
    pts = rng.uniform(-0.55, 0.55, (n, q, 3)).astype(np.float32)
    occ = (np.linalg.norm(pts, axis=-1) < 1 / 3).astype(np.float32)
    occ_npz = str(tmp_path / "occ.npz")
    np.savez(occ_npz, pointcloud=pc, points=pts, points_occ=occ)

    from if_defense_tpu.cli.train_implicit import main as ti_main

    out = str(tmp_path / "conv")
    w = ti_main([
        "--variant", "convonet", "--data", occ_npz, "--steps", "4",
        "--batch_size", "4", "--pointcloud_n", "32",
        "--points_subsample", "64", "--log_every", "2",
        "--save_every", "4", "--output", out,
    ])
    assert os.path.exists(w)
    m = [json.loads(l) for l in open(out + ".metrics.jsonl")]
    assert m and {"step", "loss", "acc"} <= set(m[-1])

    from if_defense_tpu.utils.params_io import load_params_npz

    variables = load_params_npz(w)
    assert "params" in variables


def test_remesh_defense_output(chain):
    """Mesh defense (dense-lattice path, int8 wire) writes a valid npz of
    unit-sphere clouds + a metrics sidecar."""
    from if_defense_tpu.data import load_npz

    out = load_npz(chain["mesh_path"])
    assert out.test_pc.shape[1:] == (64, 3)
    assert np.isfinite(out.test_pc).all()
    radii = np.linalg.norm(out.test_pc, axis=-1).max(axis=1)
    np.testing.assert_allclose(radii, 1.0, atol=1e-3)
    metrics = chain["mesh_path"] + ".metrics.jsonl"
    assert os.path.exists(metrics)
    rec = json.loads(open(metrics).readline())
    assert rec["variant"] == "convonet-mesh"


def test_sparse_clip_fallback_matches_int8(chain, tmp_path):
    """A clipped sparse wire (1-block budget -> every cloud falls back)
    must reproduce the int8 wire's samples EXACTLY: the fallback grid
    goes through the same int8 quantiser, not the bf16 wire."""
    import shutil

    from if_defense_tpu.cli.remesh_defense import main as remesh_main
    from if_defense_tpu.data import load_npz

    src = str(tmp_path / "adv.npz")
    shutil.copy(chain["adv_path"], src)
    weights = str(chain["out"] / "convonet_rand.npz")
    common = [
        "--variant", "convonet", "--data_root", src,
        "--weights", weights, "--batch_size", str(BATCH),
        "--resolution0", "8", "--upsample", "2",
        "--input_npoint", "32", "--sample_npoint", "64",
    ]
    int8_path, = remesh_main([*common, "--wire", "int8"])
    int8_pc = load_npz(int8_path).test_pc.copy()
    # same save name: capture int8 output above before it is overwritten
    sparse_path, = remesh_main(
        [*common, "--wire", "sparse", "--sparse_blocks", "1"])
    assert sparse_path == int8_path
    np.testing.assert_array_equal(load_npz(sparse_path).test_pc, int8_pc)


def test_threaded_host_sampling_matches_serial(chain, tmp_path):
    """--host_workers N must be output-equivalent to serial: per-cloud
    seeds are drawn up front, so the thread pool cannot change results."""
    import shutil

    from if_defense_tpu.cli.remesh_defense import main as remesh_main
    from if_defense_tpu.data import load_npz

    src = str(tmp_path / "adv.npz")
    shutil.copy(chain["adv_path"], src)
    weights = str(chain["out"] / "convonet_rand.npz")
    common = [
        "--variant", "convonet", "--data_root", src,
        "--weights", weights, "--batch_size", str(BATCH),
        "--resolution0", "8", "--upsample", "2",
        "--input_npoint", "32", "--sample_npoint", "64",
        "--wire", "int8",
    ]
    serial_path, = remesh_main([*common, "--host_workers", "1"])
    serial_pc = load_npz(serial_path).test_pc.copy()
    threaded_path, = remesh_main([*common, "--host_workers", "4"])
    np.testing.assert_array_equal(
        load_npz(threaded_path).test_pc, serial_pc)


def test_remesh_save_mesh_export(chain, tmp_path):
    """--save_mesh writes one loadable mesh file per (non-degenerate)
    cloud, in the same world frame the resampled npz is drawn from."""
    import shutil

    from if_defense_tpu.cli.remesh_defense import main as remesh_main
    from if_defense_tpu.data import load_npz
    from if_defense_tpu.utils.meshio import load_off

    src = str(tmp_path / "adv.npz")
    shutil.copy(chain["adv_path"], src)
    weights = str(chain["out"] / "convonet_rand.npz")
    mesh_dir = str(tmp_path / "meshes")
    out_path, = remesh_main([
        "--variant", "convonet", "--data_root", src,
        "--weights", weights, "--batch_size", str(BATCH),
        "--resolution0", "8", "--upsample", "2",
        "--input_npoint", "32", "--sample_npoint", "64",
        "--wire", "int8", "--save_mesh", mesh_dir,
    ])
    n_clouds = len(load_npz(out_path).test_pc)
    export_dir = os.path.join(mesh_dir, "adv", "test")
    files = sorted(os.listdir(export_dir))
    assert files, "no meshes exported"
    assert len(files) <= n_clouds  # degenerate surfaces are skipped
    for f in files:
        idx = int(f.removeprefix("cloud_").removesuffix(".off"))
        assert 0 <= idx < n_clouds  # batch-padding clones not exported
        v, t = load_off(os.path.join(export_dir, f))
        assert len(v) and len(t)
        assert t.min() >= 0 and t.max() < len(v)
        # inside the padded unit box, + one pad-ring cell (the surface
        # is closed against the padding layer at the box boundary)
        assert np.abs(v).max() <= 0.55 + 1.1 / 16 + 1e-6


def test_defense_builders_cached_across_invocations(chain):
    """build_defend_fn / build_eval_fns reuse compiled closures across
    main() calls in one process: through the remote-compile tunnel a
    rebuild costs ~15 s per call (dominating a 320-cloud file), so
    benchmark drivers depend on this."""
    import argparse

    from if_defense_tpu.cli import opt_defense as od
    from if_defense_tpu.cli import remesh_defense as rd

    weights = str(chain["out"] / "convonet_rand.npz")
    oargs = od.parse_args([
        "--variant", "convonet", "--data_root", "x.npz",
        "--weights", weights, "--iterations", "3",
        "--batch_size", str(BATCH)])
    assert od.build_defend_fn(oargs) is od.build_defend_fn(
        od.parse_args([
            "--variant", "convonet", "--data_root", "y.npz",
            "--weights", weights, "--iterations", "3",
            "--batch_size", str(BATCH)]))
    # different config -> different compiled defense
    oargs2 = argparse.Namespace(**{**vars(oargs), "iterations": 5})
    assert od.build_defend_fn(oargs2) is not od.build_defend_fn(oargs)

    rargs = rd.parse_args([
        "--variant", "convonet", "--data_root", "x.npz",
        "--weights", weights, "--resolution0", "8", "--upsample", "2"])
    model, _, _ = rd.build_model(rargs)
    assert rd.build_eval_fns(rargs, model) is rd.build_eval_fns(
        rargs, model)


def test_onet_remesh_int8_refine_wire(chain, tmp_path):
    """ONet variant (coarse+refine path) accepts --wire int8: the
    refined-voxel wire is quantised on device (grid-sign contract proven
    in tests/test_generation.py) and the CLI output stays a valid
    defended npz close to the bf16-wire output."""
    import shutil

    import jax

    from if_defense_tpu.cli.remesh_defense import main as remesh_main
    from if_defense_tpu.data import load_npz
    from if_defense_tpu.implicit import OccupancyNetwork
    from if_defense_tpu.utils.params_io import save_params_npz

    src = str(tmp_path / "adv.npz")
    shutil.copy(chain["adv_path"], src)
    onet = OccupancyNetwork()
    zeros = np.zeros((1, 32, 3), np.float32)
    weights = str(tmp_path / "onet_rand.npz")
    save_params_npz(
        weights,
        onet.init(jax.random.key(0), zeros, np.zeros((1, 8, 3),
                                                     np.float32)))
    common = [
        "--variant", "onet", "--data_root", src,
        "--weights", weights, "--batch_size", str(BATCH),
        "--resolution0", "8", "--upsample", "2",
        "--input_npoint", "32", "--sample_npoint", "64",
    ]
    bf16_path, = remesh_main([*common, "--wire", "bf16"])
    bf16_pc = load_npz(bf16_path).test_pc.copy()
    int8_path, = remesh_main([*common, "--wire", "int8"])
    int8_pc = load_npz(int8_path).test_pc
    assert int8_pc.shape == bf16_pc.shape
    assert np.isfinite(int8_pc).all()
    # same marching topology (signs exact), vertex shift <= one quantum:
    # per-cloud centroids stay close even though individual samples move
    np.testing.assert_allclose(
        int8_pc.mean(axis=1), bf16_pc.mean(axis=1), atol=0.15)
