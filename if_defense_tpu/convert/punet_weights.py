"""Convert the pretrained PU-Net `.pth` (DUP-Net) to flax params.

Maps `baselines/defense/DUP_Net/pu_net.py` state-dict names (SA_modules /
FP_Modules / FC_Modules / pcd_layer, each a stack of 1x1 Conv2d) onto the
flax `if_defense_tpu.defense.punet.PUNet` tree. 1x1 convs become Dense:
kernel = weight[:, :, 0, 0].T.

Requires torch (CPU) only at conversion time.
"""

from __future__ import annotations

import numpy as np


def _dense(weight: np.ndarray, bias: np.ndarray) -> dict:
    return {
        "kernel": np.ascontiguousarray(weight[:, :, 0, 0].T.astype(np.float32)),
        "bias": bias.astype(np.float32),
    }


def convert_punet_pth(pth_path: str, up_ratio: int = 4) -> dict:
    """Load the torch checkpoint and return flax-style params for PUNet."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}

    params: dict = {}
    # 4 SA modules, each SharedMLP of 3 conv layers
    for k in range(4):
        layers = {}
        for i in range(3):
            prefix = f"SA_modules.{k}.mlps.0.layer{i}.conv"
            layers[f"Dense_{i}"] = _dense(
                sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
            )
        params[f"PUNetSA_{k}"] = {"SharedMLP_0": layers}
    # 3 FP modules, single conv layer each
    for k in range(3):
        prefix = f"FP_Modules.{k}.mlp.layer0.conv"
        params[f"PUNetFP_{k}"] = {
            "SharedMLP_0": {
                "Dense_0": _dense(sd[f"{prefix}.weight"], sd[f"{prefix}.bias"])
            }
        }
    # up_ratio expansion MLPs (2 layers each) -> SharedMLP_0..r-1
    for k in range(up_ratio):
        layers = {}
        for i in range(2):
            prefix = f"FC_Modules.{k}.layer{i}.conv"
            layers[f"Dense_{i}"] = _dense(
                sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
            )
        params[f"SharedMLP_{k}"] = layers
    # coordinate head: SharedMLP_r (64), SharedMLP_r+1 (3)
    params[f"SharedMLP_{up_ratio}"] = {
        "Dense_0": _dense(
            sd["pcd_layer.0.layer0.conv.weight"],
            sd["pcd_layer.0.layer0.conv.bias"],
        )
    }
    params[f"SharedMLP_{up_ratio + 1}"] = {
        "Dense_0": _dense(
            sd["pcd_layer.1.layer0.conv.weight"],
            sd["pcd_layer.1.layer0.conv.bias"],
        )
    }
    return {"params": params}
