"""Occupancy Network (ONet) — encoder + CBN decoder.

Parity with the shipped config `ONet/configs/onet_mn40.yaml`: ResnetPointnet
encoder (hidden 512, c_dim 512), DecoderCBatchNorm (hidden 256), z_dim 0
(the VAE latent is vestigial in the defense path —
`ONet/im2mesh/onet/models/__init__.py:132-145` samples an empty prior).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from if_defense_tpu.implicit.layers import CBatchNorm, CResnetBlockConv1d, ResnetBlockFC


class ResnetPointnet(nn.Module):
    """Pooled FC-ResNet point encoder (`ONet/im2mesh/encoder/pointnet.py:61-113`)."""

    c_dim: int = 512
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, p):
        # p: [B, T, 3]
        h = self.hidden_dim
        net = nn.Dense(2 * h, name="fc_pos")(p)
        net = ResnetBlockFC(h, name="block_0")(net)
        for i in range(1, 5):
            pooled = jnp.max(net, axis=1, keepdims=True)
            pooled = jnp.broadcast_to(pooled, net.shape)
            net = jnp.concatenate([net, pooled], axis=-1)
            net = ResnetBlockFC(h, name=f"block_{i}")(net)
        net = jnp.max(net, axis=1)                      # [B, h]
        return nn.Dense(self.c_dim, name="fc_c")(nn.relu(net))


class DecoderCBatchNorm(nn.Module):
    """CBN decoder (`ONet/im2mesh/onet/models/decoder.py:77-131`)."""

    hidden_size: int = 256

    @nn.compact
    def __call__(self, p, c, train: bool = False):
        # p: [B, T, 3]; c: [B, c_dim] -> logits [B, T]
        net = nn.Dense(self.hidden_size, name="fc_p")(p)
        for i in range(5):
            net = CResnetBlockConv1d(name=f"block{i}")(net, c, train)
        net = CBatchNorm(self.hidden_size, name="bn")(net, c, train)
        out = nn.Dense(1, name="fc_out")(nn.relu(net))
        return out[..., 0]


class DecoderFC(nn.Module):
    """Plain (un-normalised) decoder variant
    (`ONet/im2mesh/onet/models/decoder.py:10-74`): additive z/c
    conditioning + 5 FC ResNet blocks. Registry name 'simple'."""

    hidden_size: int = 128
    c_dim: int = 512
    z_dim: int = 0

    @nn.compact
    def __call__(self, p, c=None, z=None, train: bool = False):
        net = nn.Dense(self.hidden_size, name="fc_p")(p)
        if self.z_dim and z is not None:
            net = net + nn.Dense(self.hidden_size, name="fc_z")(z)[:, None]
        if self.c_dim and c is not None:
            net = net + nn.Dense(self.hidden_size, name="fc_c")(c)[:, None]
        for i in range(5):
            net = ResnetBlockFC(name=f"block{i}")(net)
        out = nn.Dense(1, name="fc_out")(nn.relu(net))
        return out[..., 0]


class LatentEncoder(nn.Module):
    """VAE latent encoder q(z | pc, occ) —
    `ONet/im2mesh/onet/models/encoder_latent.py`. Vestigial in the defense
    path (z_dim 0 in the shipped config) but part of the ONet API; used
    only when training the generative variant."""

    z_dim: int = 64
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, p, occ):
        # p: [B, T, 3]; occ: [B, T]
        net = jnp.concatenate([p, occ[..., None]], axis=-1)
        net = nn.Dense(self.hidden_dim, name="fc_pos")(net)
        for i in range(3):
            pooled = jnp.max(net, axis=1, keepdims=True)
            pooled = jnp.broadcast_to(pooled, net.shape)
            net = jnp.concatenate([net, pooled], axis=-1)
            net = nn.Dense(self.hidden_dim, name=f"fc_{i}")(nn.relu(net))
        net = jnp.max(net, axis=1)
        mean = nn.Dense(self.z_dim, name="fc_mean")(net)
        logstd = nn.Dense(self.z_dim, name="fc_logstd")(net)
        return mean, logstd


DECODER_REGISTRY = {
    "simple": DecoderFC,
    "cbatchnorm": DecoderCBatchNorm,
}


class OccupancyNetwork(nn.Module):
    """ONet with the reference API: encode_inputs / decode.

    `decode` returns occupancy logits (the reference wraps them in a
    Bernoulli distribution; only `.logits` is consumed downstream).
    """

    c_dim: int = 512
    hidden_dim: int = 512
    decoder_hidden: int = 256

    def setup(self):
        self.encoder = ResnetPointnet(self.c_dim, self.hidden_dim)
        self.decoder = DecoderCBatchNorm(self.decoder_hidden)

    def encode_inputs(self, pc):
        return self.encoder(pc)

    def decode(self, p, c, train: bool = False):
        return self.decoder(p, c, train)

    def __call__(self, pc, p, train: bool = False):
        c = self.encode_inputs(pc)
        return self.decode(p, c, train)
