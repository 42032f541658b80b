"""Data-layer tests over a tiny synthetic npz file."""

import numpy as np
import pytest

from if_defense_tpu.data import (
    ModelNet40,
    ModelNet40Attack,
    ModelNet40Hybrid,
    ModelNet40Normal,
    batch_iterator,
    load_npz,
    save_npz,
)


@pytest.fixture(scope="module")
def tiny_npz(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("data")
    path = str(root / "mn40_tiny.npz")
    d = {
        "train_pc": rng.normal(size=(8, 64, 6)).astype(np.float32),
        "train_label": rng.integers(0, 40, size=8).astype(np.uint8),
        "test_pc": rng.normal(size=(6, 64, 6)).astype(np.float32),
        "test_label": rng.integers(0, 40, size=6).astype(np.uint8),
        "target_label": rng.integers(0, 40, size=6).astype(np.uint8),
    }
    save_npz(path, d)
    return path


def test_roundtrip(tiny_npz):
    d = load_npz(tiny_npz)
    assert d.train_pc.shape == (8, 64, 6)
    assert d.test_pc.dtype == np.float32
    assert d.target_label.shape == (6,)


def test_train_dataset(tiny_npz):
    ds = ModelNet40(tiny_npz, num_points=32, partition="train")
    pc, label = ds[0]
    assert pc.shape == (32, 3) and pc.dtype == np.float32
    assert 0 <= int(label) < 40
    # augmentation + resample should differ between calls
    pc2, _ = ds[0]
    assert not np.allclose(pc, pc2)


def test_test_dataset_normalized(tiny_npz):
    ds = ModelNet40(tiny_npz, num_points=32, partition="test")
    pc, _ = ds[0]
    assert np.allclose(pc.mean(0), 0.0, atol=1e-5)
    assert np.isclose(np.sqrt((pc**2).sum(-1)).max(), 1.0, atol=1e-5)


def test_attack_and_normal_variants(tiny_npz):
    ds = ModelNet40Attack(tiny_npz, num_points=32)
    pc, label, target = ds[1]
    assert pc.shape == (32, 3)
    dsn = ModelNet40Normal(tiny_npz, num_points=32)
    pcn, _ = dsn[1]
    assert pcn.shape == (32, 6)
    # normals untouched, xyz normalised
    np.testing.assert_allclose(pcn[:, :3].mean(0), 0.0, atol=1e-5)


def test_hybrid_concat(tiny_npz):
    ds = ModelNet40Hybrid(tiny_npz, tiny_npz, num_points=32, partition="train")
    assert len(ds) == 16
    ds_test = ModelNet40Hybrid(
        tiny_npz, tiny_npz, num_points=32, partition="test", subset="def"
    )
    assert len(ds_test) == 6


def test_batch_iterator_padding(tiny_npz):
    ds = ModelNet40(tiny_npz, num_points=32, partition="test")
    batches = list(batch_iterator(ds, batch_size=4, pad_last=True))
    assert len(batches) == 2
    (pc, label), valid = batches[-1]
    assert pc.shape == (4, 32, 3)
    assert valid == 2
