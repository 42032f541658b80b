"""Inventory-tail components: latent VAE encoder, patch encoder,
gradient mesh refinement, decoder-gradient normals, sliding-window
generation.

These are OFF in the reference's shipped configs but are API surface
(`encoder_latent.py`, `PatchLocalPoolPointnet`, `generation.py:210-249`,
`conv_onet/generation.py:148-234`); tests pin shapes and analytic
behaviour.
"""

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.implicit import (
    LatentEncoder,
    OccupancyNetwork,
    PatchLocalPoolPointnet,
)
from if_defense_tpu.implicit.generation import (
    estimate_normals,
    generate_mesh_sliding,
    refine_mesh,
    sample_surface,
)
from if_defense_tpu.implicit.onet import kl_normal, sample_z


def test_latent_encoder_shapes_and_onet_z_path():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    occ = jnp.asarray(rng.random((2, 64)) > 0.5, jnp.float32)

    enc = LatentEncoder(z_dim=8, c_dim=16)
    c = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    vars_ = enc.init(jax.random.key(0), p, occ, c)
    mean, logstd = enc.apply(vars_, p, occ, c)
    assert mean.shape == (2, 8) and logstd.shape == (2, 8)

    z = sample_z(mean, logstd, jax.random.key(1))
    assert z.shape == (2, 8)
    kl = kl_normal(mean, logstd)
    assert kl.shape == (2,) and (np.asarray(kl) >= 0).all()

    # generative ONet: z flows through the CBN decoder's fc_z
    net = OccupancyNetwork(c_dim=32, hidden_dim=32, decoder_hidden=16,
                           z_dim=8)
    pc = p[:, :32]
    q = p[:, :16]

    def init_all(mod, pc, q, occ):
        code = mod.encode_inputs(pc)
        m, _ = mod.infer_z(q, occ, code)
        return mod.decode(q, code, m)

    variables = net.init(jax.random.key(2), pc, q, occ[:, :16],
                         method=init_all)
    code = net.apply(variables, pc, method="encode_inputs")
    m, ls = net.apply(variables, q, occ[:, :16], code, method="infer_z")
    assert m.shape == (2, 8)
    logits0 = net.apply(variables, q, code, jnp.zeros((2, 8)),
                        method="decode")
    logits1 = net.apply(variables, q, code, m + 1.0, method="decode")
    assert logits0.shape == (2, 16)
    assert not np.allclose(np.asarray(logits0), np.asarray(logits1))


def test_patch_local_pool_pointnet():
    rng = np.random.default_rng(1)
    R = 16
    p = jnp.asarray(rng.uniform(0, 1, (2, 48, 3)), jnp.float32)
    index = {
        pl: jnp.asarray(rng.integers(0, R * R, (2, 48)), jnp.int32)
        for pl in ("xz", "xy", "yz")
    }
    enc = PatchLocalPoolPointnet(
        c_dim=8, hidden_dim=8, plane_resolution=R, unet_depth=2)
    vars_ = enc.init(jax.random.key(0), p, index)
    fea = enc.apply(vars_, p, index)
    assert set(fea) == {"xz", "xy", "yz"}
    for v in fea.values():
        assert v.shape == (2, R, R, 8)
        assert np.isfinite(np.asarray(v)).all()

    # local-coordinate + sin/cos positional encoding variant
    enc2 = PatchLocalPoolPointnet(
        c_dim=8, hidden_dim=8, plane_resolution=R, unet=False,
        local_coord=True, pos_encoding="sin_cos", scatter_type="mean")
    vars2 = enc2.init(jax.random.key(1), p, {"xz": index["xz"]})
    fea2 = enc2.apply(vars2, p, {"xz": index["xz"]})
    assert fea2["xz"].shape == (2, R, R, 8)


def test_decoder_registry_variants():
    """All five registry decoders + the two legacy (unregistered)
    decoders produce finite [B, T] logits and consume z when z_dim > 0
    (`ONet/im2mesh/onet/models/__init__.py:12-18`, `legacy.py`)."""
    from if_defense_tpu.implicit import (
        DECODER_REGISTRY,
        FeatureDecoder,
        VoxelDecoder,
    )

    rng = np.random.default_rng(5)
    B, T, C, Z = 2, 12, 16, 6
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (B, T, 3)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(B, Z)), jnp.float32)

    assert set(DECODER_REGISTRY) == {
        "simple", "cbatchnorm", "cbatchnorm2", "batchnorm",
        "cbatchnorm_noresnet"}
    for name, cls in DECODER_REGISTRY.items():
        kw = {"z_dim": Z, "hidden_size": 16}
        if name in ("simple", "cbatchnorm2", "batchnorm"):
            kw["c_dim"] = C
        dec = cls(**kw)
        vars_ = dec.init(jax.random.key(0), p, c, z)
        out = dec.apply(vars_, p, c, z)
        assert out.shape == (B, T), name
        assert np.isfinite(np.asarray(out)).all(), name
        # z must actually condition the output; perturb away from init
        # first (zero-init CBN kernels gate the c path at init, so
        # cbatchnorm2's z->c route is legitimately dead there)
        leaves, treedef = jax.tree_util.tree_flatten(vars_)
        keys = jax.random.split(jax.random.key(7), len(leaves))
        vars_p = jax.tree_util.tree_unflatten(treedef, [
            x + 0.05 * jax.random.normal(k, x.shape, x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x
            for x, k in zip(leaves, keys)])
        out1 = dec.apply(vars_p, p, c, z)
        out0 = dec.apply(vars_p, p, c, z + 1.0)
        assert not np.allclose(np.asarray(out1), np.asarray(out0)), name

    vox = VoxelDecoder(z_dim=Z, c_dim=C, hidden_size=16)
    vars_ = vox.init(jax.random.key(1), p, c, z)
    out = vox.apply(vars_, p, c, z)
    assert out.shape == (B, T) and np.isfinite(np.asarray(out)).all()

    cmap = jnp.asarray(rng.normal(size=(B, 8, 8, C)), jnp.float32)
    fd = FeatureDecoder(z_dim=Z, c_dim=C, hidden_size=16)
    vars_ = fd.init(jax.random.key(2), p, cmap, z)
    out = fd.apply(vars_, p, cmap, z)
    assert out.shape == (B, T) and np.isfinite(np.asarray(out)).all()


def _sphere_decode(radius=0.3, sharp=20.0):
    """Analytic occupancy 'model': logits = sharp * (r^2 - |p|^2)."""

    def decode_fn(variables, p, c):
        return sharp * (radius**2 - jnp.sum(p * p, axis=-1))

    return decode_fn


def test_estimate_normals_sphere():
    decode_fn = _sphere_decode()
    rng = np.random.default_rng(2)
    v = rng.normal(size=(100, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v *= 0.3
    n = estimate_normals(decode_fn, {}, None, v, chunk=64)
    # sphere normals point radially outward
    cos = np.sum(n * (v / 0.3), axis=1)
    assert (cos > 0.999).all()


def test_refine_mesh_moves_vertices_to_level_set():
    decode_fn = _sphere_decode(radius=0.3)
    # iso level for threshold 0.2: sigmoid(logits) = 0.2
    iso_r = np.sqrt(0.3**2 - np.log(0.2 / 0.8) / 20.0)
    rng = np.random.default_rng(3)
    # noisy icosahedron-ish: random points at wrong radius, fan faces
    v = rng.normal(size=(12, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v *= 0.38
    f = np.array([[0, i, i + 1] for i in range(1, 11)], np.int32)
    out = refine_mesh(decode_fn, {}, None, v, f, steps=300, lr=1e-2)
    r_before = np.abs(np.linalg.norm(v, axis=1) - iso_r).mean()
    r_after = np.abs(np.linalg.norm(out, axis=1) - iso_r).mean()
    assert r_after < r_before


def test_sliding_window_sphere():
    decode = _sphere_decode(radius=0.35, sharp=50.0)

    def encode_crop_fn(variables, pc, input_vol):
        return None

    def decode_crop_fn(variables, p, c, input_vol):
        return decode(variables, p, c)

    rng = np.random.default_rng(4)
    pc = rng.normal(size=(200, 3)).astype(np.float32)
    pc = pc / np.linalg.norm(pc, axis=1, keepdims=True) * 0.35

    verts, tris = generate_mesh_sliding(
        encode_crop_fn, decode_crop_fn, {}, pc,
        query_crop_size=0.5, resolution0=8, upsample=2, chunk=4096)
    assert len(tris) > 0
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.35, atol=0.05)
    # centroid at the origin: catches back-transform offsets (the query
    # points are cell CENTERS — a missing half-cell shift moves every
    # vertex by query_crop_size/(2 * r0 * upsample) ~= 0.016 per axis)
    np.testing.assert_allclose(verts.mean(0), 0.0, atol=0.008)
    # stitched grid must produce a sampleable closed surface
    pts = sample_surface(verts, tris, 256, rng)
    assert np.isfinite(pts).all()
