"""Golden parity check: jax victim classifiers vs the torch reference.

Instantiates the reference models (CPU torch, random init, eval mode with
randomised BN running stats), converts their state dicts via
`convert/victim_weights.py`, and compares logits. DGCNN's hardcoded
`device('cuda')` (`baselines/model/dgcnn.py:22`) is patched to CPU for the
comparison.

Run: JAX_PLATFORMS=cpu python tools/parity_victims.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference/baselines")


def _randomise_bn(module):
    import torch

    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)


def _init_weights(net, sd):
    """Random BN stats (structural parity) or a provided real state
    dict (reference checkpoints may carry DataParallel 'module.'
    prefixes — stripped, matching convert/victim_weights.py)."""
    net.eval()
    if sd is None:
        _randomise_bn(net)
    else:
        net.load_state_dict(
            {k[7:] if k.startswith("module.") else k: v
             for k, v in sd.items()})
        net.eval()


def check_pointnet(sd=None):
    import torch
    from model.pointnet import PointNetCls

    torch.manual_seed(0)
    net = PointNetCls(k=40, feature_transform=False, use_bn=True)
    _init_weights(net, sd)

    rng = np.random.default_rng(0)
    pc = rng.normal(size=(4, 128, 3)).astype(np.float32)
    with torch.no_grad():
        logits_t, _, _ = net(torch.from_numpy(pc.transpose(0, 2, 1)))
    logits_t = logits_t.numpy()

    from if_defense_tpu.convert.victim_weights import convert_pointnet_pth

    variables = convert_pointnet_pth(net.state_dict())

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from if_defense_tpu.models import build_model

    model = build_model("pointnet")
    logits_j, _ = model.apply(variables, jnp.asarray(pc), train=False)
    d = np.abs(logits_t - np.asarray(logits_j)).max()
    print(f"  pointnet logits: max diff {d:.3e} "
          f"(scale {np.abs(logits_t).mean():.3f})")
    return d


def check_dgcnn(sd=None):
    import torch

    # the reference hardcodes cuda for the gather index helper — patch
    real_device = torch.device

    def fake_device(arg):
        return real_device("cpu") if arg == "cuda" else real_device(arg)

    torch.device = fake_device
    from model.dgcnn import DGCNN as TorchDGCNN

    torch.manual_seed(0)
    net = TorchDGCNN(emb_dims=1024, k=20, output_channels=40, use_bn=True)
    _init_weights(net, sd)

    rng = np.random.default_rng(1)
    pc = rng.normal(size=(2, 64, 3)).astype(np.float32)
    with torch.no_grad():
        logits_t = net(torch.from_numpy(pc.transpose(0, 2, 1))).numpy()
    torch.device = real_device

    from if_defense_tpu.convert.victim_weights import convert_dgcnn_pth

    variables = convert_dgcnn_pth(net.state_dict())

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from if_defense_tpu.models import build_model

    model = build_model("dgcnn")
    logits_j, _ = model.apply(variables, jnp.asarray(pc), train=False)
    d = np.abs(logits_t - np.asarray(logits_j)).max()
    print(f"  dgcnn logits: max diff {d:.3e} "
          f"(scale {np.abs(logits_t).mean():.3f})")
    return d





def check_pointnet2(sd=None):
    import torch

    orig_randint = torch.randint

    def zero_randint(low, high, size, **kw):
        kw.setdefault("dtype", torch.long)
        return torch.zeros(size, dtype=kw["dtype"])

    from model.pointnet2 import PointNet2ClsSsg as TorchPN2

    torch.manual_seed(0)
    net = TorchPN2(num_classes=40)
    _init_weights(net, sd)

    rng = np.random.default_rng(2)
    pc = rng.normal(size=(2, 256, 3)).astype(np.float32)
    torch.randint = zero_randint
    with torch.no_grad():
        logits_t = net(torch.from_numpy(pc.transpose(0, 2, 1))).numpy()
    torch.randint = orig_randint

    from if_defense_tpu.convert.victim_weights import convert_pointnet2_pth

    variables = convert_pointnet2_pth(net.state_dict())

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from if_defense_tpu.models import build_model

    model = build_model("pointnet2")
    logits_j, _ = model.apply(variables, jnp.asarray(pc), train=False)
    d = np.abs(logits_t - np.asarray(logits_j)).max()
    print(f"  pointnet2 logits: max diff {d:.3e} "
          f"(scale {np.abs(logits_t).mean():.3f})")
    return d


def check_pointconv(sd=None):
    import torch

    orig_randint = torch.randint

    def zero_randint(low, high, size, **kw):
        kw.setdefault("dtype", torch.long)
        return torch.zeros(size, dtype=kw["dtype"])

    from model.pointconv import PointConvDensityClsSsg as TorchPC

    torch.manual_seed(0)
    net = TorchPC(num_classes=40)
    _init_weights(net, sd)

    rng = np.random.default_rng(3)
    pc = rng.normal(size=(2, 256, 3)).astype(np.float32)
    torch.randint = zero_randint
    with torch.no_grad():
        logits_t = net(torch.from_numpy(pc.transpose(0, 2, 1))).numpy()
    torch.randint = orig_randint

    from if_defense_tpu.convert.victim_weights import convert_pointconv_pth

    variables = convert_pointconv_pth(net.state_dict())

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from if_defense_tpu.models import build_model

    model = build_model("pointconv")
    logits_j, _ = model.apply(variables, jnp.asarray(pc), train=False)
    d = np.abs(logits_t - np.asarray(logits_j)).max()
    print(f"  pointconv logits: max diff {d:.3e} "
          f"(scale {np.abs(logits_t).mean():.3f})")
    return d


if __name__ == "__main__":
    print("PointNet parity:")
    d1 = check_pointnet()
    print("DGCNN parity:")
    d2 = check_dgcnn()
    print("PointNet++ parity:")
    d3 = check_pointnet2()
    print("PointConv parity:")
    d4 = check_pointconv()
    ok = all(d < 1e-3 for d in (d1, d2, d3, d4))
    print("PARITY", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)
