"""Convert reference victim-classifier `.pth` checkpoints to flax variables.

Lets users carry PyTorch-trained victims (the reference's BEST_WEIGHTS
checkpoints, `baselines/model/*`) into the TPU framework unchanged.
Covers all four reference victims — PointNet (feature_transform off, the
shipped training default), DGCNN, PointNet++ (SSG) and PointConv; every
mapping is verified numerically against the torch reference by
`tools/parity_victims.py` (logits <= 4e-5).

Conventions: Linear/1x1-conv weight [out, in(,1,1)] -> Dense kernel
[in, out]; BatchNorm affine+running stats -> flax params + batch_stats.
State dicts saved under nn.DataParallel carry a `module.` prefix
(stripped, like `attack_scripts/*.py:120-125`).
"""

from __future__ import annotations

import numpy as np


def _strip_module(sd: dict) -> dict:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _np(sd):
    return {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in sd.items()
    }


def _dense(sd, key):
    w = sd[f"{key}.weight"]
    if w.ndim >= 3:
        w = w.reshape(w.shape[0], w.shape[1])
    out = {"kernel": np.ascontiguousarray(w.T.astype(np.float32))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"].astype(np.float32)
    return out


def _bn(sd, key):
    params = {
        "scale": sd[f"{key}.weight"].astype(np.float32),
        "bias": sd[f"{key}.bias"].astype(np.float32),
    }
    stats = {
        "mean": sd[f"{key}.running_mean"].astype(np.float32),
        "var": sd[f"{key}.running_var"].astype(np.float32),
    }
    return params, stats


def _mlp(sd, conv_keys, bn_keys):
    """Sequential conv+bn pairs -> PointwiseMLP params/stats."""
    p, s = {}, {}
    for i, (ck, bk) in enumerate(zip(conv_keys, bn_keys)):
        p[f"Dense_{i}"] = _dense(sd, ck)
        bp, bs = _bn(sd, bk)
        p[f"BatchNorm_{i}"] = bp
        s[f"BatchNorm_{i}"] = bs
    return p, s


def convert_pointnet_pth(pth_path_or_sd) -> dict:
    """PointNetCls (use_bn=True, feature_transform=False) -> flax variables."""
    sd = pth_path_or_sd
    if not isinstance(sd, dict):
        import torch

        sd = torch.load(sd, map_location="cpu")
    sd = _np(_strip_module(sd))

    params: dict = {}
    stats: dict = {}

    def put(path, p, s=None):
        node_p, node_s = params, stats
        parts = path.split("/")
        for part in parts[:-1]:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        node_p[parts[-1]] = p
        if s is not None:
            node_s[parts[-1]] = s

    # STN3d: conv1-3 (Sequential conv+bn), fc1/fc2 (Sequential linear+bn), fc3
    stn = "PointNetFeat_0/STN_0"
    mp, ms = _mlp(
        sd,
        ["feat.stn.conv1.0", "feat.stn.conv2.0", "feat.stn.conv3.0"],
        ["feat.stn.conv1.1", "feat.stn.conv2.1", "feat.stn.conv3.1"],
    )
    put(f"{stn}/PointwiseMLP_0", mp, ms)
    for i, fc in enumerate(["feat.stn.fc1", "feat.stn.fc2"]):
        bp, bs = _bn(sd, f"{fc}.1")
        put(f"{stn}/DenseBN_{i}/Dense_0", _dense(sd, f"{fc}.0"))
        put(f"{stn}/DenseBN_{i}/BatchNorm_0", bp, bs)
    put(f"{stn}/Dense_0", _dense(sd, "feat.stn.fc3"))

    # shared MLPs 64 / 128 / 1024
    for i, conv in enumerate(["feat.conv1", "feat.conv2", "feat.conv3"]):
        mp, ms = _mlp(sd, [f"{conv}.0"], [f"{conv}.1"])
        put(f"PointNetFeat_0/PointwiseMLP_{i}", mp, ms)

    # head: fc1(Sequential linear+bn) -> DenseBN_0; fc2 -> Dense_0;
    # bn2 -> BatchNorm_0; fc3 -> Dense_1
    bp, bs = _bn(sd, "fc1.1")
    put("DenseBN_0/Dense_0", _dense(sd, "fc1.0"))
    put("DenseBN_0/BatchNorm_0", bp, bs)
    put("Dense_0", _dense(sd, "fc2"))
    bp, bs = _bn(sd, "bn2")
    put("BatchNorm_0", bp, bs)
    put("Dense_1", _dense(sd, "fc3"))

    return {"params": params, "batch_stats": stats}


def convert_dgcnn_pth(pth_path_or_sd) -> dict:
    """DGCNN (use_bn=True) -> flax variables."""
    sd = pth_path_or_sd
    if not isinstance(sd, dict):
        import torch

        sd = torch.load(sd, map_location="cpu")
    sd = _np(_strip_module(sd))

    params: dict = {}
    stats: dict = {}
    # conv1-4 (EdgeConv blocks) + conv5 (embedding): Sequential(conv, bn, act)
    for i in range(5):
        mp, ms = _mlp(sd, [f"conv{i+1}.0"], [f"bn{i+1}"])
        params[f"PointwiseMLP_{i}"] = mp
        stats[f"PointwiseMLP_{i}"] = ms
    # linear1(Sequential linear+bn6) -> DenseBN_0; linear2+bn7 -> DenseBN_1
    bp, bs = _bn(sd, "bn6")
    params["DenseBN_0"] = {"Dense_0": _dense(sd, "linear1.0"),
                           "BatchNorm_0": bp}
    stats["DenseBN_0"] = {"BatchNorm_0": bs}
    bp, bs = _bn(sd, "bn7")
    params["DenseBN_1"] = {"Dense_0": _dense(sd, "linear2.0"),
                           "BatchNorm_0": bp}
    stats["DenseBN_1"] = {"BatchNorm_0": bs}
    params["Dense_0"] = _dense(sd, "linear3")
    return {"params": params, "batch_stats": stats}


def convert_pointnet2_pth(pth_path_or_sd) -> dict:
    """PointNet2ClsSsg -> flax variables."""
    sd = pth_path_or_sd
    if not isinstance(sd, dict):
        import torch

        sd = torch.load(sd, map_location="cpu")
    sd = _np(_strip_module(sd))

    params: dict = {}
    stats: dict = {}
    for i, (sa, n) in enumerate([("sa1", 3), ("sa2", 3), ("sa3", 3)]):
        mp, ms = _mlp(
            sd,
            [f"{sa}.mlp_convs.{j}" for j in range(n)],
            [f"{sa}.mlp_bns.{j}" for j in range(n)],
        )
        params[f"SetAbstraction_{i}"] = {"PointwiseMLP_0": mp}
        stats[f"SetAbstraction_{i}"] = {"PointwiseMLP_0": ms}
    for i, (fc, bn) in enumerate([("fc1", "bn1"), ("fc2", "bn2")]):
        bp, bs = _bn(sd, bn)
        params[f"DenseBN_{i}"] = {"Dense_0": _dense(sd, fc),
                                  "BatchNorm_0": bp}
        stats[f"DenseBN_{i}"] = {"BatchNorm_0": bs}
    params["Dense_0"] = _dense(sd, "fc3")
    return {"params": params, "batch_stats": stats}


def convert_pointconv_pth(pth_path_or_sd) -> dict:
    """PointConvDensityClsSsg -> flax variables."""
    sd = pth_path_or_sd
    if not isinstance(sd, dict):
        import torch

        sd = torch.load(sd, map_location="cpu")
    sd = _np(_strip_module(sd))

    params: dict = {}
    stats: dict = {}
    for i in range(3):
        sa = f"sa{i + 1}"
        node_p, node_s = {}, {}
        mp, ms = _mlp(
            sd,
            [f"{sa}.mlp_convs.{j}" for j in range(3)],
            [f"{sa}.mlp_bns.{j}" for j in range(3)],
        )
        node_p["PointwiseMLP_0"] = mp
        node_s["PointwiseMLP_0"] = ms
        wp, ws = _mlp(
            sd,
            [f"{sa}.weightnet.mlp_convs.{j}" for j in range(3)],
            [f"{sa}.weightnet.mlp_bns.{j}" for j in range(3)],
        )
        node_p["WeightNet_0"] = {"PointwiseMLP_0": wp}
        node_s["WeightNet_0"] = {"PointwiseMLP_0": ws}
        dp, ds = _mlp(
            sd,
            [f"{sa}.densitynet.mlp_convs.{j}" for j in range(3)],
            [f"{sa}.densitynet.mlp_bns.{j}" for j in range(3)],
        )
        node_p["DensityNet_0"] = {"PointwiseMLP_0": dp}
        node_s["DensityNet_0"] = {"PointwiseMLP_0": ds}
        bp, bs = _bn(sd, f"{sa}.bn_linear")
        node_p["DenseBN_0"] = {"Dense_0": _dense(sd, f"{sa}.linear"),
                               "BatchNorm_0": bp}
        node_s["DenseBN_0"] = {"BatchNorm_0": bs}
        params[f"PointConvSetAbstraction_{i}"] = node_p
        stats[f"PointConvSetAbstraction_{i}"] = node_s
    for i, (fc, bn) in enumerate([("fc1", "bn1"), ("fc2", "bn2")]):
        bp, bs = _bn(sd, bn)
        params[f"DenseBN_{i}"] = {"Dense_0": _dense(sd, fc),
                                  "BatchNorm_0": bp}
        stats[f"DenseBN_{i}"] = {"BatchNorm_0": bs}
    params["Dense_0"] = _dense(sd, "fc3")
    return {"params": params, "batch_stats": stats}
