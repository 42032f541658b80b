"""Data layer: the npz interchange schema and ModelNet40 dataset pipelines."""

from if_defense_tpu.data.npz import load_npz, save_npz, NpzData
from if_defense_tpu.data.modelnet40 import (
    ModelNet40,
    ModelNet40Hybrid,
    ModelNet40Normal,
    ModelNet40Attack,
    ModelNet40NormalAttack,
    batch_iterator,
)
from if_defense_tpu.data.augment import (
    rotate_point_cloud,
    jitter_point_cloud,
    translate_point_cloud,
)

__all__ = [
    "load_npz",
    "save_npz",
    "NpzData",
    "ModelNet40",
    "ModelNet40Hybrid",
    "ModelNet40Normal",
    "ModelNet40Attack",
    "ModelNet40NormalAttack",
    "batch_iterator",
    "rotate_point_cloud",
    "jitter_point_cloud",
    "translate_point_cloud",
]
