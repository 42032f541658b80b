"""Batch-level attack resume: interrupted == uninterrupted, bit-exact.

An attack leg on a heavyweight victim runs for tens of minutes; an
infra death mid-file used to lose every completed batch (the matrix
driver resumes only at whole-file granularity). `--resume` writes
per-batch shards and replays the PRNG stream over skipped batches, so
a resumed run must produce the identical npz. The reference gets the
same robustness from per-rank shards + offline merge
(`baselines/util/merge_attack_results.py:7-51`).
"""

import os

import numpy as np
import pytest

N_POINTS = 128
BATCH = 8


@pytest.fixture(scope="module")
def victim(tmp_path_factory):
    out = tmp_path_factory.mktemp("attack_resume")
    from tools.synthetic_dataset import make_classification_npz
    from if_defense_tpu.cli.train import main as train_main

    data = make_classification_npz(
        str(out / "hard.npz"), train_per_class=4, test_per_class=2,
        num_points=N_POINTS, seed=0, family="hard")
    run_dir = str(out / "pointnet")
    train_main([
        "--data", data, "--model", "pointnet",
        "--num_points", str(N_POINTS), "--epochs", "1",
        "--batch_size", str(BATCH), "--eval_every", "1",
        "--output", run_dir,
        "--registry", str(out / "registry.json"),
    ])
    return dict(out=out, data=data, ckpt=os.path.join(run_dir, "best"))


def _attack_args(victim, out_npz, extra=()):
    return [
        "--attack", "perturb", "--data", victim["data"],
        "--checkpoint", victim["ckpt"],
        "--num_points", str(N_POINTS), "--batch_size", str(BATCH),
        "--binary_step", "1", "--num_iter", "8",
        "--output", out_npz, *extra,
    ]


def test_resumed_run_bit_identical(victim):
    from if_defense_tpu.cli.attack import main as attack_main

    # uninterrupted reference run (16 test clouds / batch 8 = 2 batches)
    ref_npz = str(victim["out"] / "ref.npz")
    path, ref_rate = attack_main(_attack_args(victim, ref_npz))
    ref = np.load(path)

    # interrupted run: one batch, then exit
    res_npz = str(victim["out"] / "res.npz")
    out, _ = attack_main(_attack_args(
        victim, res_npz, ["--resume", "--stop_after_batches", "1"]))
    assert out is None
    part_dir = res_npz + ".partial"
    shards = [f for f in os.listdir(part_dir) if f.startswith("batch_")]
    assert len(shards) == 1
    assert not os.path.exists(res_npz)

    # resumed completion: must skip batch 0 and bit-match the reference
    out, rate = attack_main(_attack_args(victim, res_npz, ["--resume"]))
    assert out == res_npz
    assert not os.path.exists(part_dir)        # shards cleaned up
    got = np.load(out)
    np.testing.assert_array_equal(got["test_pc"], ref["test_pc"])
    np.testing.assert_array_equal(got["test_label"], ref["test_label"])
    np.testing.assert_array_equal(got["target_label"], ref["target_label"])
    assert rate == ref_rate


def test_resume_refuses_config_mismatch(victim):
    from if_defense_tpu.cli.attack import main as attack_main

    out_npz = str(victim["out"] / "mismatch.npz")
    attack_main(_attack_args(
        victim, out_npz, ["--resume", "--stop_after_batches", "1"]))
    # different iteration count => different results => must refuse
    with pytest.raises(ValueError, match="different attack configuration"):
        attack_main([
            "--attack", "perturb", "--data", victim["data"],
            "--checkpoint", victim["ckpt"],
            "--num_points", str(N_POINTS), "--batch_size", str(BATCH),
            "--binary_step", "1", "--num_iter", "4",
            "--output", out_npz, "--resume",
        ])


def test_resume_recomputes_corrupt_shard(victim):
    """A shard truncated by a kill mid-write (runs predating the atomic
    tmp+replace commit) must be recomputed, not crash every resume."""
    from if_defense_tpu.cli.attack import main as attack_main

    ref_npz = str(victim["out"] / "ref2.npz")
    path, ref_rate = attack_main(_attack_args(victim, ref_npz))
    ref = np.load(path)

    out_npz = str(victim["out"] / "corrupt.npz")
    attack_main(_attack_args(
        victim, out_npz, ["--resume", "--stop_after_batches", "1"]))
    part_dir = out_npz + ".partial"
    shard, = [f for f in os.listdir(part_dir) if f.startswith("batch_")]
    full = os.path.join(part_dir, shard)
    blob = open(full, "rb").read()
    with open(full, "wb") as f:                 # truncate mid-zip
        f.write(blob[: len(blob) // 2])

    out, rate = attack_main(_attack_args(victim, out_npz, ["--resume"]))
    got = np.load(out)
    np.testing.assert_array_equal(got["test_pc"], ref["test_pc"])
    assert rate == ref_rate


def test_resume_survives_bit_identical_data_rewrite(victim):
    """The matrix driver's deterministic generator rewrites the dataset
    npz (same bytes, new mtime) on every invocation; in-flight shards
    must stay valid — the fingerprint keys data by CONTENT, not mtime.
    (A real round-4 chip run lost a 30-min DGCNN attack leg to this.)"""
    import shutil

    from if_defense_tpu.cli.attack import main as attack_main

    out_npz = str(victim["out"] / "rewrite.npz")
    attack_main(_attack_args(
        victim, out_npz, ["--resume", "--stop_after_batches", "1"]))
    # rewrite the npz bit-identically (fresh mtime)
    blob = open(victim["data"], "rb").read()
    with open(victim["data"], "wb") as f:
        f.write(blob)
    out, _ = attack_main(_attack_args(victim, out_npz, ["--resume"]))
    assert out == out_npz
    assert not os.path.exists(out_npz + ".partial")


def test_resume_refuses_changed_data_content(victim, tmp_path):
    """Same path, different bytes -> must refuse (the ADVICE-r3 case)."""
    from tools.synthetic_dataset import make_classification_npz
    from if_defense_tpu.cli.attack import main as attack_main

    data = make_classification_npz(
        str(tmp_path / "swap.npz"), train_per_class=4, test_per_class=2,
        num_points=N_POINTS, seed=0, family="hard")
    swapped = dict(victim, data=data)
    out_npz = str(tmp_path / "swap_attack.npz")
    attack_main(_attack_args(
        swapped, out_npz, ["--resume", "--stop_after_batches", "1"]))
    make_classification_npz(             # regenerate with another seed
        str(tmp_path / "swap.npz"), train_per_class=4, test_per_class=2,
        num_points=N_POINTS, seed=1, family="hard")
    with pytest.raises(ValueError, match="different attack configuration"):
        attack_main(_attack_args(swapped, out_npz, ["--resume"]))


def test_resume_upgrades_legacy_mtime_fingerprint(victim):
    """Pre-r4 .partial dirs keyed data by mtime; they are accepted and
    upgraded in place ONLY when the recorded mtime still matches the
    file — the one provenance check the legacy schema supports (ADVICE
    r4: a shared-key comparison across disjoint schemas was vacuous)."""
    import json

    from if_defense_tpu.cli.attack import main as attack_main

    out_npz = str(victim["out"] / "legacy.npz")
    attack_main(_attack_args(
        victim, out_npz, ["--resume", "--stop_after_batches", "1"]))
    fp_path = os.path.join(out_npz + ".partial", "config.json")
    with open(fp_path) as f:
        fp = json.load(f)
    del fp["data_sha256"]                      # rewrite as legacy format
    fp["data_mtime"] = os.path.getmtime(victim["data"])
    with open(fp_path, "w") as f:
        json.dump(fp, f)
    out, _ = attack_main(_attack_args(victim, out_npz, ["--resume"]))
    assert out == out_npz


def test_resume_refuses_unverifiable_legacy_fingerprint(victim):
    """A legacy fingerprint whose recorded mtime does NOT match the
    current file means the input may have changed since the legacy run
    — content provenance is unverifiable, so the shards are refused
    instead of silently merged (ADVICE r4)."""
    import json

    import pytest

    from if_defense_tpu.cli.attack import main as attack_main

    out_npz = str(victim["out"] / "legacy_bad.npz")
    attack_main(_attack_args(
        victim, out_npz, ["--resume", "--stop_after_batches", "1"]))
    fp_path = os.path.join(out_npz + ".partial", "config.json")
    with open(fp_path) as f:
        fp = json.load(f)
    del fp["data_sha256"]
    fp["data_mtime"] = 12345.0                 # stale: file was touched
    with open(fp_path, "w") as f:
        json.dump(fp, f)
    with pytest.raises(ValueError, match="different attack configuration"):
        attack_main(_attack_args(victim, out_npz, ["--resume"]))


def test_resume_upgrades_v1_digest_fingerprint(victim):
    """Round-4 .partial dirs carry the v1 checkpoint digest; they are
    accepted iff a recomputed v1 digest of the CURRENT checkpoint
    matches (real content verification across the schema change), and
    refused when it doesn't."""
    import json

    import pytest

    from if_defense_tpu.cli.attack import _ckpt_digest_v1
    from if_defense_tpu.cli.attack import main as attack_main

    out_npz = str(victim["out"] / "v1fp.npz")
    attack_main(_attack_args(
        victim, out_npz, ["--resume", "--stop_after_batches", "1"]))
    fp_path = os.path.join(out_npz + ".partial", "config.json")
    with open(fp_path) as f:
        fp = json.load(f)
    fp["checkpoint_digest"] = _ckpt_digest_v1(fp["checkpoint"])
    with open(fp_path, "w") as f:
        json.dump(fp, f)
    out, _ = attack_main(_attack_args(victim, out_npz, ["--resume"]))
    assert out == out_npz                      # accepted + completed
    assert not os.path.exists(out_npz + ".partial")

    out_npz2 = str(victim["out"] / "v1fp_bad.npz")
    attack_main(_attack_args(
        victim, out_npz2, ["--resume", "--stop_after_batches", "1"]))
    fp_path2 = os.path.join(out_npz2 + ".partial", "config.json")
    with open(fp_path2) as f:
        fp2 = json.load(f)
    fp2["checkpoint_digest"] = "0" * 64        # retrained-ckpt v1 digest
    with open(fp_path2, "w") as f:
        json.dump(fp2, f)
    with pytest.raises(ValueError, match="different attack configuration"):
        attack_main(_attack_args(victim, out_npz2, ["--resume"]))


def test_ckpt_digest_copy_invariant_retrain_sensitive(tmp_path):
    """The checkpoint digest must survive mtime bumps / copies (a VM
    restore must not invalidate valid shards) but change when the
    checkpoint bytes change (retrain-in-place must invalidate)."""
    import shutil

    from if_defense_tpu.cli.attack import _ckpt_digest_or_none

    ck = tmp_path / "ckpt"
    ck.mkdir()
    (ck / "array0").write_bytes(b"\x01\x02" * 100)
    (ck / "meta.json").write_text('{"step": 1}')
    d0 = _ckpt_digest_or_none(str(ck))
    os.utime(ck / "array0", (1.0, 1.0))          # mtime bump
    assert _ckpt_digest_or_none(str(ck)) == d0
    copy = tmp_path / "ckpt_copy"                # restored copy
    shutil.copytree(ck, copy)
    assert _ckpt_digest_or_none(str(copy)) == d0
    (ck / "array0").write_bytes(b"\x03\x04" * 100)  # retrained bytes
    assert _ckpt_digest_or_none(str(ck)) != d0
    assert _ckpt_digest_or_none(str(tmp_path / "missing")) is None

    # v2 samples the TAIL too: a retrain that keeps a big file's size
    # and head bytes but changes later content must still invalidate
    # (ADVICE r4 — head-only sampling missed it)
    big = tmp_path / "big_ckpt"
    big.mkdir()
    (big / "array0").write_bytes(b"H" * 64 + b"M" * 64 + b"T" * 64)
    d1 = _ckpt_digest_or_none(str(big), sample_bytes=16)
    (big / "array0").write_bytes(b"H" * 64 + b"M" * 64 + b"X" * 64)
    assert _ckpt_digest_or_none(str(big), sample_bytes=16) != d1
