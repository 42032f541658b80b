"""Golden parity check: jax ONet/ConvONet vs the torch reference.

Instantiates the reference models (CPU torch, random init), converts their
state dicts through `convert/implicit_weights.py`, and compares
encode+decode outputs. A torch_scatter shim (matching the 2.x public API)
lets the reference ConvONet encoder run without the CUDA extension.

Run: JAX_PLATFORMS=cpu python tools/parity_implicit.py
"""

import sys
import types

import numpy as np

sys.path.insert(0, "/root/repo")


def install_torch_scatter_shim():
    import torch

    def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
        assert dim == -1 or dim == src.dim() - 1
        index = index.expand_as(src)
        size = out.shape[-1] if out is not None else (
            dim_size or int(index.max()) + 1)
        shape = src.shape[:-1] + (size,)
        summ = torch.zeros(shape, dtype=src.dtype).scatter_add(
            -1, index, src)
        cnt = torch.zeros(shape, dtype=src.dtype).scatter_add(
            -1, index, torch.ones_like(src))
        mean = summ / cnt.clamp(min=1)
        return mean if out is None else out + mean

    def scatter_max(src, index, dim=-1, out=None, dim_size=None):
        assert dim == -1 or dim == src.dim() - 1
        index = index.expand_as(src)
        size = dim_size or int(index.max()) + 1
        shape = src.shape[:-1] + (size,)
        res = torch.full(shape, float("-inf"), dtype=src.dtype)
        res = res.scatter_reduce(-1, index, src, reduce="amax",
                                 include_self=True)
        res = torch.where(torch.isinf(res), torch.zeros_like(res), res)
        return res, None

    mod = types.ModuleType("torch_scatter")
    mod.scatter_mean = scatter_mean
    mod.scatter_max = scatter_max
    sys.modules["torch_scatter"] = mod


class _AnyAttr(types.ModuleType):
    def __getattr__(self, name):
        return object


def install_import_stubs(*names):
    """Placeholder modules (any attribute resolves) for import-time-only
    reference deps (trimesh, the Cython geometry extensions, ...)."""
    for name in names:
        if name not in sys.modules:
            sys.modules[name] = _AnyAttr(name)



def _load_split_sd(enc_t, dec_t, sd):
    """Load a real reference checkpoint state dict (encoder./decoder.
    prefixed, as saved by im2mesh CheckpointIO under the 'model' key)
    into the torch encoder/decoder pair."""
    enc_t.load_state_dict({k[len("encoder."):]: v for k, v in sd.items()
                           if k.startswith("encoder.")})
    dec_t.load_state_dict({k[len("decoder."):]: v for k, v in sd.items()
                           if k.startswith("decoder.")})
    enc_t.eval(), dec_t.eval()


def check_convonet(sd=None):
    import torch

    install_torch_scatter_shim()
    install_import_stubs(
        "trimesh", "plyfile", "im2mesh", "im2mesh.utils",
        "im2mesh.utils.libkdtree", "im2mesh.utils.libmcubes",
        "im2mesh.utils.libmise", "im2mesh.utils.libsimplify",
        "src.utils.libmcubes", "src.utils.libmise", "src.utils.libsimplify",
    )
    sys.path.insert(0, "/root/reference/ConvONet")
    from src.encoder.pointnet import LocalPoolPointnet as TorchEnc
    from src.conv_onet.models.decoder import LocalDecoder as TorchDec

    torch.manual_seed(0)
    enc_t = TorchEnc(
        c_dim=32, dim=3, hidden_dim=32, scatter_type="max",
        unet=True, unet_kwargs={"depth": 4, "merge_mode": "concat",
                                "start_filts": 32},
        plane_resolution=64, plane_type=["xz", "xy", "yz"], padding=0.1,
    )
    dec_t = TorchDec(dim=3, c_dim=32, hidden_size=32, sample_mode="bilinear",
                     padding=0.1)
    enc_t.eval(), dec_t.eval()
    if sd is not None:
        _load_split_sd(enc_t, dec_t, sd)

    rng = np.random.default_rng(0)
    pc = rng.uniform(-0.45, 0.45, size=(2, 200, 3)).astype(np.float32)
    q = rng.uniform(-0.5, 0.5, size=(2, 77, 3)).astype(np.float32)

    with torch.no_grad():
        c_t = enc_t(torch.from_numpy(pc))
        out_t = dec_t(torch.from_numpy(q), c_t).numpy()

    # convert: build a state dict with the wrapper's key prefixes
    sd = {}
    for k, v in enc_t.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in dec_t.state_dict().items():
        sd[f"decoder.{k}"] = v

    from if_defense_tpu.convert.implicit_weights import convert_convonet_pth

    variables = convert_convonet_pth(
        {k: v.numpy() for k, v in sd.items()})

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from if_defense_tpu.implicit import ConvOccupancyNetwork

    model = ConvOccupancyNetwork()
    c_j = model.apply(variables, jnp.asarray(pc), method="encode_inputs")
    out_j = np.asarray(
        model.apply(variables, jnp.asarray(q), c_j, method="decode"))

    for pl in ("xz", "xy", "yz"):
        # torch plane [B, C, H, W] vs jax [B, H, W, C]
        t = c_t[pl].numpy().transpose(0, 2, 3, 1)
        j = np.asarray(c_j[pl])
        d = np.abs(t - j).max()
        print(f"  plane {pl}: max diff {d:.3e} (scale {np.abs(t).mean():.3f})")
    d = np.abs(out_t - out_j).max()
    print(f"  decoder logits: max diff {d:.3e} "
          f"(scale {np.abs(out_t).mean():.3f})")
    return d


def check_onet(sd=None):
    import torch

    # drop the im2mesh stubs installed for the ConvONet check so the real
    # package imports cleanly, then re-stub its native extensions
    for name in list(sys.modules):
        if name.startswith("im2mesh"):
            del sys.modules[name]
    sys.path.insert(0, "/root/reference/ONet")
    install_import_stubs(
        "im2mesh.utils.libkdtree", "im2mesh.utils.libmcubes",
        "im2mesh.utils.libmise", "im2mesh.utils.libsimplify",
    )
    from im2mesh.encoder.pointnet import ResnetPointnet as TorchEnc
    from im2mesh.onet.models.decoder import DecoderCBatchNorm as TorchDec

    torch.manual_seed(0)
    enc_t = TorchEnc(c_dim=512, dim=3, hidden_dim=512)
    dec_t = TorchDec(dim=3, z_dim=0, c_dim=512, hidden_size=256)
    enc_t.eval(), dec_t.eval()
    if sd is not None:
        _load_split_sd(enc_t, dec_t, sd)
    else:
        # randomise BN running stats so the test isn't trivially mean0/var1
        with torch.no_grad():
            for m in dec_t.modules():
                if isinstance(m, torch.nn.BatchNorm1d):
                    m.running_mean.uniform_(-0.3, 0.3)
                    m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(1)
    pc = rng.uniform(-0.45, 0.45, size=(2, 150, 3)).astype(np.float32)
    q = rng.uniform(-0.5, 0.5, size=(2, 66, 3)).astype(np.float32)

    with torch.no_grad():
        c_t = enc_t(torch.from_numpy(pc))
        out_t = dec_t(torch.from_numpy(q), None, c_t).numpy()

    sd = {}
    for k, v in enc_t.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in dec_t.state_dict().items():
        sd[f"decoder.{k}"] = v

    from if_defense_tpu.convert.implicit_weights import convert_onet_pth

    variables = convert_onet_pth({k: v.numpy() for k, v in sd.items()})

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from if_defense_tpu.implicit import OccupancyNetwork

    model = OccupancyNetwork()
    c_j = model.apply(variables, jnp.asarray(pc), method="encode_inputs")
    out_j = np.asarray(
        model.apply(variables, jnp.asarray(q), c_j, method="decode"))

    d_c = np.abs(c_t.numpy() - np.asarray(c_j)).max()
    d = np.abs(out_t - out_j).max()
    print(f"  latent c: max diff {d_c:.3e} (scale {np.abs(c_t).mean():.3f})")
    print(f"  decoder logits: max diff {d:.3e} "
          f"(scale {np.abs(out_t).mean():.3f})")
    return max(d, d_c)


if __name__ == "__main__":
    print("ConvONet parity:")
    d1 = check_convonet()
    print("ONet parity:")
    d2 = check_onet()
    ok = d1 < 1e-3 and d2 < 1e-3
    print("PARITY", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)
