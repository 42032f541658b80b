"""Config-system tests: inheritance, merging, model dispatch."""

import os

from if_defense_tpu.utils.config import (
    defense_kwargs_from_config,
    get_model,
    load_config,
    update_recursive,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs")


def test_update_recursive_nested():
    d = {"a": {"b": 1, "c": 2}, "x": 1}
    update_recursive(d, {"a": {"b": 9}, "y": 3})
    assert d == {"a": {"b": 9, "c": 2}, "x": 1, "y": 3}


def test_load_config_with_default():
    cfg = load_config(
        os.path.join(CFG, "convonet_3plane_mn40.yaml"),
        os.path.join(CFG, "default.yaml"),
    )
    assert cfg["method"] == "conv_onet"
    assert cfg["data"]["pointcloud_n"] == 600
    assert cfg["defense"]["iterations"] == 200   # from default
    assert cfg["test"]["threshold"] == 0.2


def test_inherit_from_chain():
    cfg = load_config(
        os.path.join(CFG, "onet_mn40_small.yaml"),
        os.path.join(CFG, "default.yaml"),
    )
    assert cfg["method"] == "onet"               # from parent
    assert cfg["model"]["c_dim"] == 128          # overridden by child
    assert cfg["data"]["pointcloud_n"] == 300    # from parent
    assert cfg["defense"]["rep_weight"] == 500.0  # from default


def test_get_model_dispatch():
    onet_cfg = load_config(os.path.join(CFG, "onet_mn40.yaml"),
                           os.path.join(CFG, "default.yaml"))
    conv_cfg = load_config(os.path.join(CFG, "convonet_3plane_mn40.yaml"),
                           os.path.join(CFG, "default.yaml"))
    m1 = get_model(onet_cfg)
    m2 = get_model(conv_cfg)
    assert type(m1).__name__ == "OccupancyNetwork"
    assert m1.c_dim == 512
    assert type(m2).__name__ == "ConvOccupancyNetwork"
    assert m2.plane_resolution == 64


def test_defense_kwargs():
    cfg = load_config(os.path.join(CFG, "onet_mn40.yaml"),
                      os.path.join(CFG, "default.yaml"))
    kw = defense_kwargs_from_config(cfg)
    assert kw == {"threshold": 0.2, "input_npoint": 300}
