"""YAML config system with recursive inheritance + method dispatch.

Equivalent of `ONet/im2mesh/config.py:12-86` / `ConvONet/src/config.py:
10-40`: configs may name a parent via `inherit_from` (resolved recursively),
then a default file, then the file's own values — later levels override
recursively. `get_model(cfg)` dispatches on `method` (onet / conv_onet) and
builds the flax module with the config's hyperparameters.
"""

from __future__ import annotations

import os

import yaml


def update_recursive(dst: dict, src: dict) -> dict:
    """Recursively merge src into dst (in place)."""
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            update_recursive(dst[k], v)
        else:
            dst[k] = v
    return dst


def load_config(path: str, default_path: str | None = None) -> dict:
    """Load a YAML config, resolving `inherit_from` chains."""
    with open(path) as f:
        cfg_special = yaml.safe_load(f) or {}

    inherit_from = cfg_special.get("inherit_from")
    if inherit_from is not None:
        base = os.path.join(os.path.dirname(path), inherit_from) \
            if not os.path.isabs(inherit_from) else inherit_from
        cfg = load_config(base, default_path)
    elif default_path is not None:
        with open(default_path) as f:
            cfg = yaml.safe_load(f) or {}
    else:
        cfg = {}
    return update_recursive(cfg, cfg_special)


def get_model(cfg: dict):
    """Build the implicit model named by cfg['method'].

    Returns the flax module; weights load separately
    (`utils.params_io.load_params_npz` or the .pth converters).
    """
    from if_defense_tpu.implicit import (
        ConvOccupancyNetwork,
        OccupancyNetwork,
    )

    method = cfg.get("method", "conv_onet")
    mcfg = cfg.get("model", {})
    if method == "onet":
        ek = mcfg.get("encoder_kwargs", {}) or {}
        return OccupancyNetwork(
            c_dim=mcfg.get("c_dim", 512),
            hidden_dim=ek.get("hidden_dim", 512),
            decoder_hidden=(mcfg.get("decoder_kwargs", {}) or {}).get(
                "hidden_size", 256),
        )
    if method == "conv_onet":
        ek = mcfg.get("encoder_kwargs", {}) or {}
        return ConvOccupancyNetwork(
            c_dim=mcfg.get("c_dim", 32),
            hidden_dim=ek.get("hidden_dim", 32),
            plane_resolution=ek.get("plane_resolution", 64),
            padding=cfg.get("data", {}).get("padding", 0.1),
        )
    raise ValueError(f"unknown method {method!r}")


def defense_kwargs_from_config(cfg: dict) -> dict:
    """Extract the opt/remesh-defense hyperparameters a config carries."""
    out = {}
    test = cfg.get("test", {})
    data = cfg.get("data", {})
    if "threshold" in test:
        out["threshold"] = test["threshold"]
    if "pointcloud_n" in data:
        out["input_npoint"] = data["pointcloud_n"]
    return out
