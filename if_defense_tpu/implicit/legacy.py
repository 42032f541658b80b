"""Legacy ONet decoders (`ONet/im2mesh/onet/models/legacy.py`).

Vestigial in the reference too — no shipped config selects them and no
pretrained weights exist — but they complete the ONet decoder surface:

  - ``VoxelDecoder`` (legacy.py:7-70): latent -> 4^3 seed volume -> three
    stride-2 transposed convs -> 32^3 feature volume, trilinearly sampled
    at the query points, then a small FC ResNet head.
  - ``FeatureDecoder`` (legacy.py:73-125): a latent-conditioned affine
    (perspective) projection of the query points into a 2D feature map,
    bilinear sampling, then an FC ResNet head.

TPU notes: the torch ConvTranspose3d(stride 2, padding 1, output_padding
1) size-doubling is expressed as flax ``nn.ConvTranspose`` with SAME
padding (identical output shapes; weight layouts differ — irrelevant, no
pretrained weights exist for these classes). grid_sample becomes the
MXU-friendly separable two-hot contractions in `ops/interp.py`
(align_corners=True border-clamp semantics — the one member of the
grid_sample family used everywhere else in this codebase).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from if_defense_tpu.implicit.layers import ResnetBlockFC
from if_defense_tpu.ops.interp import (
    bilinear_plane_sample,
    trilinear_grid_sample,
)


class AffineLayer(nn.Module):
    """Latent-conditioned affine map of points (`im2mesh/layers.py:159-191`).

    p @ A(c) + b(c), initialised to the identity transform with the
    reference's b = (0, 0, 2) offset (so the initial perspective divide in
    FeatureDecoder is well-conditioned).
    """

    dim: int = 3

    @nn.compact
    def __call__(self, c, p):
        # c: [B, c_dim]; p: [B, T, dim]
        d = self.dim
        A = nn.Dense(
            d * d, name="fc_A",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.eye(
                d, dtype=dtype).reshape(-1),
        )(c).reshape(-1, d, d)
        b = nn.Dense(
            d, name="fc_b",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                [0.0, 0.0, 2.0], dtype=dtype),
        )(c)
        return jnp.einsum("btd,bde->bte", p, A) + b[:, None, :]


class VoxelDecoder(nn.Module):
    """Volumetric legacy decoder (`legacy.py:7-70`)."""

    z_dim: int = 128
    c_dim: int = 128
    hidden_size: int = 128

    @nn.compact
    def __call__(self, p, c, z=None):
        # p: [B, T, 3] in [-0.5, 0.5]; c: [B, c_dim] -> logits [B, T]
        B = c.shape[0]
        net = c
        if self.z_dim:
            zz = (z if z is not None
                  else jnp.zeros((B, self.z_dim), c.dtype))
            net = jnp.concatenate([zz, c], axis=-1)
        # seed volume, channel-last [B, 4, 4, 4, 256]
        vol = nn.Dense(256 * 4 * 4 * 4, name="fc_in")(net)
        vol = vol.reshape(B, 256, 4, 4, 4)       # torch channel-first ...
        vol = jnp.moveaxis(vol, 1, -1)           # ... -> channel-last
        for i, ch in enumerate((128, 64, 32)):
            vol = nn.ConvTranspose(
                ch, (3, 3, 3), strides=(2, 2, 2), padding="SAME",
                name=f"convtrp_{i}",
            )(nn.relu(vol))                      # 4->8->16->32 per axis
        # trilinear sample at the queries; torch grid coords 2*p map
        # [-0.5, 0.5] -> [-1, 1]; ours take [0, 1] = p + 0.5
        feat = trilinear_grid_sample(vol, p + 0.5)       # [B, T, 32]
        net = nn.Dense(self.hidden_size, name="fc_f")(nn.relu(feat))
        net = net + nn.Dense(self.hidden_size, name="fc_p")(p)
        if self.z_dim:
            net = net + nn.Dense(
                self.hidden_size, name="fc_z")(zz)[:, None]
        if self.c_dim:
            net = net + nn.Dense(
                self.hidden_size, name="fc_c")(c)[:, None]
        net = ResnetBlockFC(name="block0")(net)
        net = ResnetBlockFC(name="block1")(net)
        out = nn.Dense(1, name="fc_out")(nn.relu(net))
        return out[..., 0]


class FeatureDecoder(nn.Module):
    """2D-feature-map legacy decoder (`legacy.py:73-125`).

    c is a spatial feature map [B, H, W, c_dim] (channel-last here);
    points are perspective-projected into it by a latent-conditioned
    affine transform.
    """

    z_dim: int = 128
    c_dim: int = 128
    hidden_size: int = 256

    @nn.compact
    def __call__(self, p, c, z=None):
        # p: [B, T, 3]; c: [B, H, W, c_dim] -> logits [B, T]
        B, T, _ = p.shape
        c1 = c.reshape(B, -1, self.c_dim).max(axis=1)        # [B, c_dim]
        Ap = AffineLayer(name="affine")(c1, p)               # [B, T, 3]
        # perspective divide; torch grid coords 2*Ap2 -> ours Ap2 + 0.5
        Ap2 = Ap[..., :2] / (jnp.abs(Ap[..., 2:]) + 1e-5)
        c2 = bilinear_plane_sample(c, Ap2 + 0.5)             # [B, T, c_dim]

        net = (nn.Dense(self.hidden_size, name="fc_p1")(p)
               + nn.Dense(self.hidden_size, name="fc_p2")(Ap))
        if self.z_dim:
            zz = (z if z is not None
                  else jnp.zeros((B, self.z_dim), p.dtype))
            net = net + nn.Dense(
                self.hidden_size, name="fc_z")(zz)[:, None]
        net = net + (nn.Dense(self.hidden_size, name="fc_c2")(c2)
                     + nn.Dense(self.hidden_size, name="fc_c1")(c1)[:, None])
        for i in range(4):
            net = ResnetBlockFC(name=f"block{i}")(net)
        out = nn.Dense(1, name="fc_out")(nn.relu(net))
        return out[..., 0]
