"""Torch-reference parity regression (runs only where the reference and
torch are available — e.g. the build environment).

The heavier ONet/ConvONet/victim parity checks live in
`tools/parity_implicit.py` / `tools/parity_victims.py`; this keeps the
fastest and most valuable one — the PU-Net conversion against the real
pretrained checkpoint — in the default suite.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/baselines/defense/DUP_Net/pu-in_1024-up_4.pth"


def _torch_available():
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not (os.path.exists(REF) and _torch_available()),
    reason="reference checkpoint or torch unavailable",
)
def test_punet_conversion_matches_torch_reference():
    import sys

    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, "/root/reference/baselines")
    from defense.DUP_Net.pu_net import PUNet as TorchPUNet

    net = TorchPUNet(npoint=1024, up_ratio=4, use_normal=False,
                     use_bn=False, use_res=False)
    net.load_state_dict(torch.load(REF, map_location="cpu"))
    net.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1024, 3)).astype(np.float32)
    x /= np.abs(x).max()

    orig_randint = torch.randint
    torch.randint = lambda lo, hi, size, **kw: torch.zeros(
        size, dtype=torch.long)
    try:
        with torch.no_grad():
            out_t = net(torch.from_numpy(x)).numpy()
    finally:
        torch.randint = orig_randint

    from if_defense_tpu.convert.punet_weights import convert_punet_pth
    from if_defense_tpu.defense.punet import PUNet

    variables = convert_punet_pth(REF)
    out_j = np.asarray(PUNet(1024, 4).apply(variables, jnp.asarray(x)))
    assert np.abs(out_t - out_j).max() < 1e-4
