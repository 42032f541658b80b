"""Convolutional Occupancy Network (ConvONet) — the strongest IF-Defense.

Parity with the shipped config `ConvONet/configs/convonet_3plane_mn40.yaml`:
LocalPoolPointnet encoder (hidden 32, c_dim 32, 3 planes xz/xy/yz at 64x64,
scatter-max local pooling, scatter-mean plane projection, 2D UNet depth 4)
and the bilinear-plane LocalDecoder (hidden 32, 5 ResNet blocks).

TPU mapping: torch_scatter scatter ops become batched segment scatters
(`ops/scatter.py`); `F.grid_sample(align_corners=True, border)` becomes the
4-corner gather/lerp in `ops/interp.py`. The latent `c` is a dict of three
[B, R, R, 32] channel-last planes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from if_defense_tpu.implicit.layers import ResnetBlockFC
from if_defense_tpu.implicit.unet2d import UNet2D
from if_defense_tpu.implicit.unet3d import UNet3D
from if_defense_tpu.ops import (
    plane_sample,
    scatter_mean_2d,
)
from if_defense_tpu.ops.interp import trilinear_grid_sample
from if_defense_tpu.ops.scatter import pooled_max_by_cell

PLANES = ("xz", "xy", "yz")
_PLANE_AXES = {"xz": (0, 2), "xy": (0, 1), "yz": (1, 2)}


def normalize_coordinate(p: jax.Array, plane: str, padding: float = 0.1):
    """Project to a plane and normalise to [0, 1) (`src/common.py:235-258`)."""
    a, b = _PLANE_AXES[plane]
    xy = jnp.stack([p[..., a], p[..., b]], axis=-1)
    xy = xy / (1 + padding + 1e-5) + 0.5
    return jnp.clip(xy, 0.0, 1.0 - 1e-5)


def coordinate2index(xy: jax.Array, reso: int) -> jax.Array:
    """Cell index ix + reso * iy (`src/common.py:300-315`), [B, T]."""
    x = jnp.floor(xy * reso).astype(jnp.int32)
    return x[..., 0] + reso * x[..., 1]


def normalize_3d_coordinate(p: jax.Array, padding: float = 0.1) -> jax.Array:
    """Normalise 3D coords to [0, 1) (`src/common.py:260-276`)."""
    p_nor = p / (1 + padding + 1e-3) + 0.5
    return jnp.clip(p_nor, 0.0, 1.0 - 1e-3)


def coordinate2index_3d(p_nor: jax.Array, reso: int) -> jax.Array:
    """Cell index ix + reso*(iy + reso*iz) (`src/common.py:300-315`)."""
    x = jnp.floor(p_nor * reso).astype(jnp.int32)
    return x[..., 0] + reso * (x[..., 1] + reso * x[..., 2])


class LocalPoolPointnet(nn.Module):
    """3-plane point encoder (`ConvONet/src/encoder/pointnet.py:11-168`)."""

    c_dim: int = 32
    hidden_dim: int = 32
    plane_resolution: int = 64
    padding: float = 0.1
    n_blocks: int = 5
    unet: bool = True
    unet_depth: int = 4
    plane_type: tuple = PLANES          # ("xz","xy","yz") or ("grid",)
    grid_resolution: int = 32
    unet3d_depth: int = 3

    @nn.compact
    def __call__(self, p):
        # p: [B, T, 3] in the padded unit cube
        R = self.plane_resolution
        Rg = self.grid_resolution
        index = {}
        for pl in self.plane_type:
            if pl == "grid":
                index[pl] = coordinate2index_3d(
                    normalize_3d_coordinate(p, self.padding), Rg)
            else:
                index[pl] = coordinate2index(
                    normalize_coordinate(p, pl, self.padding), R)

        net = nn.Dense(2 * self.hidden_dim, name="fc_pos")(p)
        net = ResnetBlockFC(self.hidden_dim, name="blocks_0")(net)
        for i in range(1, self.n_blocks):
            # local pooling: per-point max over same-cell points, summed
            # over planes (pool_local :104-122) — scatter-free on TPU
            pooled = 0
            for pl in self.plane_type:
                pooled = pooled + pooled_max_by_cell(net, index[pl])
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(self.hidden_dim, name=f"blocks_{i}")(net)

        c = nn.Dense(self.c_dim, name="fc_c")(net)       # [B, T, c_dim]

        # ONE UNet shared across the three planes (the reference's single
        # self.unet is applied to each plane in turn, :68-86)
        unet = (
            UNet2D(self.c_dim, self.unet_depth, self.c_dim, name="unet")
            if self.unet and any(pl != "grid" for pl in self.plane_type)
            else None
        )
        fea = {}
        for pl in self.plane_type:
            if pl == "grid":
                vol = scatter_mean_2d(c, index[pl], Rg**3)
                vol = vol.reshape(-1, Rg, Rg, Rg, self.c_dim)  # [B,z,y,x,c]
                if self.unet:
                    vol = UNet3D(self.c_dim, self.unet3d_depth,
                                 self.c_dim, name="unet3d")(vol)
                fea[pl] = vol
                continue
            plane = scatter_mean_2d(c, index[pl], R * R)  # [B, R*R, c]
            plane = plane.reshape(-1, R, R, self.c_dim)   # [B, y, x, c]
            if unet is not None:
                plane = unet(plane)
            fea[pl] = plane
        return fea


def positional_encoding_sincos(p: jax.Array, n_freqs: int = 10) -> jax.Array:
    """NeRF-style sin/cos encoding (`src/common.py:417-439`): [.., D] ->
    [.., 2 * n_freqs * D] with frequencies pi * 2^l, inputs mapped to
    [-1, 1] first."""
    import numpy as np

    freqs = jnp.asarray(np.pi * 2.0 ** np.linspace(0, n_freqs - 1, n_freqs),
                        p.dtype)
    q = 2.0 * p - 1.0
    ang = q[..., None, :] * freqs[:, None]           # [.., L, D]
    out = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-2)  # [.., L, 2, D]
    return out.reshape(*p.shape[:-1], -1)


def map2local(p: jax.Array, unit_size: float,
              pos_encoding: str = "linear") -> jax.Array:
    """Map coordinates into their local voxel system (`src/common.py:399-415`):
    p mod unit_size, rescaled to [0, 1), optionally sin/cos encoded."""
    q = jnp.remainder(p, unit_size) / unit_size
    if pos_encoding == "sin_cos":
        return positional_encoding_sincos(q)
    return q


class PatchLocalPoolPointnet(nn.Module):
    """Patch/crop-training encoder variant
    (`ConvONet/src/encoder/pointnet.py:171-329`).

    Same local-pool ResNet stack as `LocalPoolPointnet`, but the plane/grid
    cell indices are PRECOMPUTED by the caller (crop pipelines index points
    in the local patch frame, which the encoder cannot derive from the raw
    coordinates), and the point embedding optionally runs on
    local-voxel coordinates (`local_coord`) with linear or sin/cos
    positional encoding. scatter_type 'max'|'mean' selects the local
    pooling reduction.
    """

    c_dim: int = 32
    hidden_dim: int = 32
    plane_resolution: int = 64
    grid_resolution: int = 32
    n_blocks: int = 5
    unet: bool = True
    unet_depth: int = 4
    unet3d_depth: int = 3
    scatter_type: str = "max"
    local_coord: bool = False
    pos_encoding: str = "linear"
    unit_size: float = 0.1

    @nn.compact
    def __call__(self, p, index):
        # p: [B, T, 3]; index: {plane_name: [B, T] int32 cell ids}
        from if_defense_tpu.ops.scatter import (
            pooled_mean_by_cell,
        )

        pool = (pooled_max_by_cell if self.scatter_type == "max"
                else pooled_mean_by_cell)
        pp = (map2local(p, self.unit_size, self.pos_encoding)
              if self.local_coord else p)
        net = nn.Dense(2 * self.hidden_dim, name="fc_pos")(pp)
        net = ResnetBlockFC(self.hidden_dim, name="blocks_0")(net)
        for i in range(1, self.n_blocks):
            pooled = 0
            for pl in index:
                pooled = pooled + pool(net, index[pl])
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(self.hidden_dim, name=f"blocks_{i}")(net)

        c = nn.Dense(self.c_dim, name="fc_c")(net)       # [B, T, c_dim]

        unet = (
            UNet2D(self.c_dim, self.unet_depth, self.c_dim, name="unet")
            if self.unet and any(pl != "grid" for pl in index)
            else None
        )
        R, Rg = self.plane_resolution, self.grid_resolution
        fea = {}
        for pl in index:
            if pl == "grid":
                vol = scatter_mean_2d(c, index[pl], Rg**3)
                vol = vol.reshape(-1, Rg, Rg, Rg, self.c_dim)
                if self.unet:
                    vol = UNet3D(self.c_dim, self.unet3d_depth,
                                 self.c_dim, name="unet3d")(vol)
                fea[pl] = vol
                continue
            plane = scatter_mean_2d(c, index[pl], R * R)
            plane = plane.reshape(-1, R, R, self.c_dim)
            if unet is not None:
                plane = unet(plane)
            fea[pl] = plane
        return fea


class LocalDecoder(nn.Module):
    """Bilinear-plane-conditioned decoder
    (`ConvONet/src/conv_onet/models/decoder.py:8-95`).

    Split API: `sample_features` (the bilinear plane lookups) and `head`
    (fc_p + conditioned ResNet blocks) — the defense loop's corner-cache
    fast path re-lerps cached features and enters at `head`.
    """

    c_dim: int = 32
    hidden_size: int = 32
    n_blocks: int = 5
    padding: float = 0.1

    def setup(self):
        self.fc_p = nn.Dense(self.hidden_size, name="fc_p")
        self.fc_c = [
            nn.Dense(self.hidden_size, name=f"fc_c_{i}")
            for i in range(self.n_blocks)
        ]
        self.blocks = [
            ResnetBlockFC(name=f"blocks_{i}") for i in range(self.n_blocks)
        ]
        self.fc_out = nn.Dense(1, name="fc_out")

    def sample_features(self, p, c_planes, p_n=None):
        # p: [B, T, 3]; c_planes: {plane: [B, R, R, c_dim]} (and/or a
        # 'grid' [B, Rg, Rg, Rg, c_dim] volume) -> [B, T, c_dim].
        # p_n: optional {plane: [B, T, 2|3]} precomputed normalised
        # coordinates (the crop/sliding-window pipelines normalise in the
        # local patch frame — `conv_onet/generation.py:350-358`); default
        # is the unit-cube normalisation from p.
        c = 0
        for pl in c_planes:
            if pl == "grid":
                # normalised (x, y, z); the volume is laid out [z, y, x]
                # matching coordinate2index_3d's ix-fastest flattening
                uvw = (p_n[pl] if p_n is not None
                       else normalize_3d_coordinate(p, self.padding))
                c = c + trilinear_grid_sample(c_planes[pl], uvw)
                continue
            uv = (p_n[pl] if p_n is not None
                  else normalize_coordinate(p, pl, self.padding))
            c = c + plane_sample(c_planes[pl], uv)           # [B, T, c_dim]
        return c

    def head(self, p, c):
        # p: [B, T, 3]; c: [B, T, c_dim] sampled features -> logits [B, T]
        net = self.fc_p(p)
        for i in range(self.n_blocks):
            net = net + self.fc_c[i](c)
            net = self.blocks[i](net)
        out = self.fc_out(nn.relu(net))
        return out[..., 0]

    def __call__(self, p, c_planes, p_n=None):
        return self.head(p, self.sample_features(p, c_planes, p_n))


def lattice_axis_selector(
    rf: int, box_size: float, reso: int, padding: float
):
    """[rf+1, reso] f32 selector: fine-lattice axis index -> plane axis.

    Row i holds the bilinear two-hot weights of lattice coordinate i
    (world w = (i/rf - 0.5) * box_size, normalised exactly like
    `normalize_coordinate`). `S @ plane_axis` therefore equals
    `bilinear_plane_sample` along that axis at every lattice position —
    the mesh-generation fast path resizes each plane to the fine lattice
    ONCE with two small matmuls instead of running O(Q*H*W*C) selection
    einsums per query chunk.
    """
    import numpy as np

    f = np.arange(rf + 1, dtype=np.float64)
    w = (f / rf - 0.5) * box_size
    u = np.clip(w / (1 + padding + 1e-5) + 0.5, 0.0, 1.0 - 1e-5)
    x = u * (reso - 1)
    x0 = np.floor(x)
    wx = x - x0
    lo = np.clip(x0, 0, reso - 1).astype(np.int64)
    hi = np.clip(x0 + 1, 0, reso - 1).astype(np.int64)
    sel = np.zeros((rf + 1, reso), np.float32)
    np.add.at(sel, (np.arange(rf + 1), lo), 1.0 - wx)
    np.add.at(sel, (np.arange(rf + 1), hi), wx)
    return sel


class ConvOccupancyNetwork(nn.Module):
    """ConvONet with the reference API: encode_inputs / decode."""

    c_dim: int = 32
    hidden_dim: int = 32
    plane_resolution: int = 64
    padding: float = 0.1
    plane_type: tuple = PLANES
    grid_resolution: int = 32

    def setup(self):
        self.encoder = LocalPoolPointnet(
            self.c_dim, self.hidden_dim, self.plane_resolution,
            self.padding, plane_type=self.plane_type,
            grid_resolution=self.grid_resolution,
        )
        self.decoder = LocalDecoder(
            self.c_dim, self.hidden_dim, padding=self.padding
        )

    def encode_inputs(self, pc):
        return self.encoder(pc)

    def decode(self, p, c, p_n=None):
        return self.decoder(p, c, p_n)

    def decode_head(self, p, feat):
        """Decoder head on presampled features (corner-cache fast path)."""
        return self.decoder.head(p, feat)

    def lattice_planes(self, c, rf: int, box_size: float):
        """Resize each feature plane to the (rf+1)^2 fine lattice.

        Two small einsums per plane; sampling any lattice point afterwards
        is a pure row gather (`decode_lattice`). Plane-type latents only.
        """
        sel = jnp.asarray(lattice_axis_selector(
            rf, box_size, self.plane_resolution, self.padding))
        out = {}
        # HIGH precision matches the exact path's bilinear_plane_sample —
        # on TPU the default would run these selectors in bf16 and the
        # lattice fast paths would only match exact decode at bf16 noise
        hi = jax.lax.Precision.HIGH
        for pl, plane in c.items():
            lat = jnp.einsum("ph,bhwc->bpwc", sel, plane, precision=hi)
            lat = jnp.einsum("qw,bpwc->bpqc", sel, lat, precision=hi)
            out[pl] = lat                       # [B, Rp(H), Rp(W), C]
        return out

    def decode_lattice(self, fidx, lat, rf: int, box_size: float):
        """Decode at fine-lattice points given pre-resized planes.

        Args:
            fidx: [B, P, 3] int32 lattice coordinates in [0, rf].
            lat: output of `lattice_planes`.
        Returns:
            [B, P] logits — equals `decode` at the lattice world coords
            (up to einsum reassociation), at gather cost instead of
            selection-matmul cost.
        """
        rp = rf + 1
        fx, fy, fz = fidx[..., 0], fidx[..., 1], fidx[..., 2]
        # H/W index per plane mirror normalize_coordinate's (u->W, v->H)
        # axis mapping: xz -> (x, z), xy -> (x, y), yz -> (y, z)
        rows = {"xz": fz * rp + fx, "xy": fy * rp + fx, "yz": fz * rp + fy}
        feat = 0
        for pl, plane in lat.items():
            flat = plane.reshape(plane.shape[0], rp * rp, plane.shape[-1])
            feat = feat + jnp.take_along_axis(
                flat, rows[pl][..., None], axis=1)
        p = (fidx.astype(jnp.float32) / rf - 0.5) * box_size
        return self.decoder.head(p, feat)

    def dense_lattice_logits(self, c, rf: int, box_size: float):
        """Occupancy logits on the FULL (rf+1)^3 lattice, gather-free.

        With planes resized to the lattice (`lattice_planes`), the decoder
        feature at (x, y, z) is a pure broadcast sum of three plane rows —
        f[y, z] = xy[y, x] + xz[z, x] + yz_T[y, z] per x-slab — so dense
        evaluation needs NO gathers and NO selection einsums; the only
        FLOPs are the tiny decoder head. Faster on TPU than evaluating
        the ~half as many active-voxel points through gathers (measured:
        23.9 s gather eval vs ~1 s dense at B=40, R=128), and exact
        everywhere (strictly more accurate than nearest-filled
        refinement). Plane-type latents only.

        Returns:
            [B, rf+1, rf+1, rf+1] logits in [x][y][z] order.
        """
        lat = self.lattice_planes(c, rf, box_size)
        rp = rf + 1
        cd = lat["xz"].shape[-1]
        axis = (jnp.arange(rp, dtype=jnp.float32) / rf - 0.5) * box_size
        xz_x = jnp.moveaxis(lat["xz"], 2, 0)       # [x, B, z, C]
        xy_x = jnp.moveaxis(lat["xy"], 2, 0)       # [x, B, y, C]
        yz_t = jnp.swapaxes(lat["yz"], 1, 2)       # [B, y, z, C]
        # world coords of one slab, y outer / z inner (px filled per slab)
        pyz = jnp.stack(
            [jnp.zeros((rp, rp), jnp.float32),
             jnp.broadcast_to(axis[:, None], (rp, rp)),
             jnp.broadcast_to(axis[None, :], (rp, rp))], -1
        ).reshape(1, rp * rp, 3)

        def slab(carry, inp):
            fxz, fxy, px = inp                     # [B,z,C], [B,y,C], []
            B = fxz.shape[0]
            f = (fxy[:, :, None, :] + fxz[:, None, :, :] + yz_t)
            p = jnp.broadcast_to(pyz, (B, rp * rp, 3))
            p = p.at[..., 0].set(px)
            logits = self.decoder.head(p, f.reshape(B, rp * rp, cd))
            return carry, logits.reshape(B, rp, rp)

        _, vals = jax.lax.scan(slab, None, (xz_x, xy_x, axis))
        return jnp.moveaxis(vals, 0, 1)            # [B, x, y, z]

    def __call__(self, pc, p):
        return self.decode(p, self.encode_inputs(pc))
