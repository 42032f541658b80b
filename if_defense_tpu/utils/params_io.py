"""Flat-npz (de)serialisation for param pytrees.

A portable, dependency-light alternative to orbax for small frozen nets
(PU-Net, ONet, ConvONet pretrained weights shipped in `weights/`):
nested dicts flattened with '/'-joined keys into one compressed npz.
"""

from __future__ import annotations

import numpy as np


def flatten_params(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path: str, tree: dict) -> str:
    np.savez_compressed(path, **flatten_params(tree))
    return path


def load_params_npz(path: str) -> dict:
    with np.load(path) as npz:
        return unflatten_params({k: npz[k] for k in npz.files})
