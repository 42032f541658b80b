"""Alternative ConvONet encoder/decoder pair: PointNet++ features.

Role of `ConvONet/src/encoder/pointnetpp.py` + the `LocalPointDecoder`
(`src/conv_onet/models/decoder.py:201-286`) — the point-feature (not
plane-grid) conditioning variant, unused by the shipped 3-plane config but
part of the ConvONet API. Latent c = (positions [B, S, 3],
features [B, S, c_dim]); the decoder conditions queries on a
Gaussian-kernel weighted average of the nearest features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from if_defense_tpu.implicit.layers import ResnetBlockFC
from if_defense_tpu.models.pointnet2 import FeaturePropagation, SetAbstraction
from if_defense_tpu.ops import square_distance


class PointNetPlusPlusEncoder(nn.Module):
    """Hierarchical SA downsample + FP upsample -> per-point features."""

    c_dim: int = 32
    npoint1: int = 256
    npoint2: int = 64

    @nn.compact
    def __call__(self, p):
        # p: [B, T, 3] -> (positions [B, npoint1, 3], feats [B, npoint1, c])
        l1_xyz, l1 = SetAbstraction(
            self.npoint1, 0.1, 16, (32, 32, 64), use_bn=False
        )(p, None, False)
        l2_xyz, l2 = SetAbstraction(
            self.npoint2, 0.2, 16, (64, 64, 128), use_bn=False
        )(l1_xyz, l1, False)
        up = FeaturePropagation((self.c_dim,), use_bn=False)(
            l1_xyz, l2_xyz, l1, l2, False
        )
        return l1_xyz, up


class LocalPointDecoder(nn.Module):
    """Gaussian point-feature conditioned decoder (`decoder.py:201-286`)."""

    c_dim: int = 32
    hidden_size: int = 32
    n_blocks: int = 5
    gaussian_val: float = 0.1

    @nn.compact
    def __call__(self, p, c):
        # c = (positions [B, S, 3], feats [B, S, c_dim])
        pos, fea = c
        var = self.gaussian_val**2
        d = square_distance(p, pos)                      # [B, T, S] squared
        # reference: exp(-(|p-q| + 1e-5)^2 / var) ~= exp(-d/var)
        w = jnp.exp(-d / var)
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
        cond = jnp.einsum(
            "bts,bsc->btc", w, fea, precision=jax.lax.Precision.HIGH
        )

        net = nn.Dense(self.hidden_size, name="fc_p")(p)
        for i in range(self.n_blocks):
            net = net + nn.Dense(self.hidden_size, name=f"fc_c_{i}")(cond)
            net = ResnetBlockFC(name=f"blocks_{i}")(net)
        out = nn.Dense(1, name="fc_out")(nn.relu(net))
        return out[..., 0]


class PointConvONet(nn.Module):
    """ConvONet variant with point-feature conditioning (encoder
    'pointnet_plus_plus', decoder 'simple_local_point')."""

    c_dim: int = 32
    hidden_dim: int = 32

    def setup(self):
        self.encoder = PointNetPlusPlusEncoder(self.c_dim)
        self.decoder = LocalPointDecoder(self.c_dim, self.hidden_dim)

    def encode_inputs(self, pc):
        return self.encoder(pc)

    def decode(self, p, c):
        return self.decoder(p, c)

    def __call__(self, pc, p):
        return self.decode(p, self.encode_inputs(pc))
