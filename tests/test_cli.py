"""CLI smoke tests: argument parsing and small helpers (no device work)."""

import numpy as np
import pytest


def test_train_args_defaults():
    from if_defense_tpu.cli.train import parse_args

    a = parse_args(["--data", "x.npz"])
    assert a.model == "pointnet"
    assert a.epochs == 200 and a.lr == 1e-3 and a.weight_decay == 1e-4
    assert a.resume is None


def test_attack_args_and_registry_choices():
    from if_defense_tpu.cli.attack import ATTACKS, parse_args

    assert set(ATTACKS) >= {"perturb", "add", "add_cluster", "add_object",
                            "knn", "fgm", "ifgm", "mifgm", "pgd", "drop"}
    a = parse_args(["--attack", "knn", "--data", "d.npz",
                    "--checkpoint", "c", "--approx_knn"])
    assert a.approx_knn and a.knn_budget == 0.1


def test_inference_point_adjustment():
    from if_defense_tpu.cli.inference import adjust_num_points

    assert adjust_num_points(1024, "add-pointnet-foo.npz") == 1024 + 512
    assert adjust_num_points(1024, "Add_Cluster-x.npz") == 1024 + 96
    assert adjust_num_points(1024, "ADD_OBJECT-x.npz") == 1024 + 192
    assert adjust_num_points(1024, "perturb-x.npz") == 1024


def test_boundary_tau_margins():
    """Margin-tolerant scoring semantics (RESULTS_MATRIX protocol): a
    boundary example (|margin| < tau) counts as attack SUCCESS on every
    backend and never as robust-correct; clear wins/losses unchanged."""
    import numpy as np

    from if_defense_tpu.cli.inference import class_margins

    #           cls0   cls1   cls2
    logits = np.array([
        [5.0,   1.0,   0.0],    # clear cls0 win (margin 4)
        [1.0,   1.01,  0.0],    # boundary between 0 and 1 (margin .01)
        [0.0,   1.0,   6.0],    # clear cls2 win
    ])
    label = np.array([0, 0, 0])
    target = np.array([2, 1, 2])
    m_l = class_margins(logits, label)
    m_t = class_margins(logits, target)
    np.testing.assert_allclose(m_l, [4.0, -0.01, -6.0])
    np.testing.assert_allclose(m_t, [-5.0, 0.01, 5.0])
    tau = 0.5
    # robust-correct: only the clear cls0 win
    assert list(m_l > tau) == [True, False, False]
    # targeted success: boundary row counts, clear-miss row doesn't
    assert list(m_t > -tau) == [False, True, True]


def test_opt_defense_args():
    from if_defense_tpu.cli.opt_defense import parse_args

    a = parse_args(["--data_root", "d.npz", "--weights", "w.npz"])
    assert a.iterations == 200 and a.rep_weight == 500.0
    assert a.threshold == 0.2 and a.padding_scale == 0.9
    assert not a.no_sor


def test_remesh_defense_args():
    from if_defense_tpu.cli.remesh_defense import parse_args

    a = parse_args(["--data_root", "d.npz", "--weights", "w.npz"])
    assert a.resolution0 == 32 and a.upsample == 4


def test_defend_npz_default_defenses():
    from if_defense_tpu.cli.defend_npz import parse_args

    a = parse_args(["--data_root", "d.npz"])
    assert a.defense == ""  # = all three
    assert a.srs_drop_num == 500 and a.sor_k == 2 and a.sor_alpha == 1.1


def test_merge_results_roundtrip(tmp_path):
    from if_defense_tpu.cli.merge_results import merge_npz

    rng = np.random.default_rng(0)
    paths = []
    for r in range(2):
        p = str(tmp_path / f"s{r}.npz")
        np.savez(p, test_pc=rng.normal(size=(3, 8, 3)).astype(np.float32),
                 test_label=rng.integers(0, 4, 3).astype(np.uint8))
        paths.append(p)
    out = merge_npz(paths, str(tmp_path / "m.npz"))
    with np.load(str(tmp_path / "m.npz")) as m:
        assert m["test_pc"].shape == (6, 8, 3)
