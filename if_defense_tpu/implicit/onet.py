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

from if_defense_tpu.implicit.layers import (
    CBatchNorm,
    CResnetBlockConv1d,
    ResnetBlockConv1d,
    ResnetBlockFC,
)


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
    """CBN decoder (`ONet/im2mesh/onet/models/decoder.py:77-131`).

    `z_dim > 0` adds the reference's fc_z conditioning on the (vestigial
    in the shipped config) VAE latent.
    """

    hidden_size: int = 256
    z_dim: int = 0

    @nn.compact
    def __call__(self, p, c, z=None, train: bool = False):
        # p: [B, T, 3]; c: [B, c_dim] -> logits [B, T]
        net = nn.Dense(self.hidden_size, name="fc_p")(p)
        if self.z_dim:
            # z=None means the prior mean (zeros) — the reference decoder
            # always applies fc_z when z_dim > 0 (`get_z_from_prior` with
            # sample=False yields the zero mean); branching on z would
            # also make the param structure depend on call-time arguments
            zz = (z if z is not None
                  else jnp.zeros((net.shape[0], self.z_dim), net.dtype))
            net = net + nn.Dense(self.hidden_size, name="fc_z")(zz)[:, None]
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
        if self.z_dim:
            zz = (z if z is not None
                  else jnp.zeros((net.shape[0], self.z_dim), net.dtype))
            net = net + nn.Dense(self.hidden_size, name="fc_z")(zz)[:, None]
        if self.c_dim and c is not None:
            net = net + nn.Dense(self.hidden_size, name="fc_c")(c)[:, None]
        for i in range(5):
            net = ResnetBlockFC(name=f"block{i}")(net)
        out = nn.Dense(1, name="fc_out")(nn.relu(net))
        return out[..., 0]


class LatentEncoder(nn.Module):
    """VAE posterior encoder q(z | points, occ[, c]) —
    `ONet/im2mesh/onet/models/encoder_latent.py:12-76`. Vestigial in the
    defense path (z_dim 0 in the shipped config) but part of the ONet API;
    used when training the generative variant.

    Architecture parity: fc_0 embeds the occupancies, fc_pos the
    coordinates (summed, optionally + fc_c(c)); two pool-concat FC stages
    (fc_1 128->128, fc_2/fc_3 256->128); final pool -> (mean, logstd).
    `leaky=True` switches relu/max-pool to leaky-relu(0.2)/mean-pool like
    the reference's `leaky` flag.
    """

    z_dim: int = 64
    c_dim: int = 0
    hidden_dim: int = 128
    leaky: bool = False

    @nn.compact
    def __call__(self, p, occ, c=None):
        # p: [B, T, 3]; occ: [B, T]; c: optional [B, c_dim]
        h = self.hidden_dim
        act = ((lambda x: nn.leaky_relu(x, 0.2)) if self.leaky
               else nn.relu)
        pool = ((lambda x: jnp.mean(x, axis=1, keepdims=True))
                if self.leaky
                else (lambda x: jnp.max(x, axis=1, keepdims=True)))

        net = nn.Dense(h, name="fc_0")(occ[..., None])
        net = net + nn.Dense(h, name="fc_pos")(p)
        if self.c_dim and c is not None:
            net = net + nn.Dense(h, name="fc_c")(c)[:, None]

        net = nn.Dense(h, name="fc_1")(act(net))
        pooled = jnp.broadcast_to(pool(net), net.shape)
        net = jnp.concatenate([net, pooled], axis=-1)

        net = nn.Dense(h, name="fc_2")(act(net))
        pooled = jnp.broadcast_to(pool(net), net.shape)
        net = jnp.concatenate([net, pooled], axis=-1)

        net = nn.Dense(h, name="fc_3")(act(net))
        net = net.mean(axis=1) if self.leaky else net.max(axis=1)

        mean = nn.Dense(self.z_dim, name="fc_mean")(net)
        logstd = nn.Dense(self.z_dim, name="fc_logstd")(net)
        return mean, logstd


class DecoderCBatchNorm2(nn.Module):
    """CBN decoder with a configurable block count
    (`ONet/im2mesh/onet/models/decoder.py:136-182`). Unlike
    `DecoderCBatchNorm`, z conditions the LATENT (c = c + fc_z(z)), not
    the point features."""

    hidden_size: int = 256
    c_dim: int = 128
    z_dim: int = 0
    n_blocks: int = 5

    @nn.compact
    def __call__(self, p, c, z=None, train: bool = False):
        net = nn.Dense(self.hidden_size, name="conv_p")(p)
        if self.z_dim:
            zz = (z if z is not None
                  else jnp.zeros((net.shape[0], self.z_dim), net.dtype))
            c = c + nn.Dense(self.c_dim, name="fc_z")(zz)
        for i in range(self.n_blocks):
            net = CResnetBlockConv1d(name=f"blocks_{i}")(net, c, train)
        net = CBatchNorm(self.hidden_size, name="bn")(net, c, train)
        out = nn.Dense(1, name="conv_out")(nn.relu(net))
        return out[..., 0]


class DecoderCBatchNormNoResnet(nn.Module):
    """CBN decoder without residual blocks — a plain 5-layer
    CBN/relu/fc stack (`decoder.py:184-246`)."""

    hidden_size: int = 256
    z_dim: int = 0
    leaky: bool = False

    @nn.compact
    def __call__(self, p, c, z=None, train: bool = False):
        act = ((lambda x: nn.leaky_relu(x, 0.2)) if self.leaky
               else nn.relu)
        net = nn.Dense(self.hidden_size, name="fc_p")(p)
        if self.z_dim:
            zz = (z if z is not None
                  else jnp.zeros((net.shape[0], self.z_dim), net.dtype))
            net = net + nn.Dense(self.hidden_size, name="fc_z")(zz)[:, None]
        for i in range(5):
            net = act(CBatchNorm(
                self.hidden_size, name=f"bn_{i}")(net, c, train))
            net = nn.Dense(self.hidden_size, name=f"fc_{i}")(net)
        net = act(CBatchNorm(self.hidden_size, name="bn_5")(net, c, train))
        out = nn.Dense(1, name="fc_out")(net)
        return out[..., 0]


class DecoderBatchNorm(nn.Module):
    """Plain-BN decoder: additive z/c conditioning + 5 BN ResNet blocks
    (`decoder.py:249-310`)."""

    hidden_size: int = 256
    c_dim: int = 128
    z_dim: int = 0
    leaky: bool = False

    @nn.compact
    def __call__(self, p, c=None, z=None, train: bool = False):
        act = ((lambda x: nn.leaky_relu(x, 0.2)) if self.leaky
               else nn.relu)
        net = nn.Dense(self.hidden_size, name="fc_p")(p)
        if self.z_dim:
            zz = (z if z is not None
                  else jnp.zeros((net.shape[0], self.z_dim), net.dtype))
            net = net + nn.Dense(self.hidden_size, name="fc_z")(zz)[:, None]
        if self.c_dim and c is not None:
            net = net + nn.Dense(self.hidden_size, name="fc_c")(c)[:, None]
        for i in range(5):
            net = ResnetBlockConv1d(name=f"block{i}")(net, train)
        net = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn")(net)
        out = nn.Dense(1, name="fc_out")(act(net))
        return out[..., 0]


# `ONet/im2mesh/onet/models/__init__.py:12-18`; the legacy voxel/feature
# decoders (implicit/legacy.py) are unregistered in the reference too.
DECODER_REGISTRY = {
    "simple": DecoderFC,
    "cbatchnorm": DecoderCBatchNorm,
    "cbatchnorm2": DecoderCBatchNorm2,
    "batchnorm": DecoderBatchNorm,
    "cbatchnorm_noresnet": DecoderCBatchNormNoResnet,
}


class OccupancyNetwork(nn.Module):
    """ONet with the reference API: encode_inputs / decode / infer_z /
    get_z_from_prior.

    `decode` returns occupancy logits (the reference wraps them in a
    Bernoulli distribution; only `.logits` is consumed downstream). The
    shipped defense config has z_dim 0 — `get_z_from_prior` then returns
    an empty latent exactly like
    `ONet/im2mesh/onet/models/__init__.py:132-145`; set `z_dim > 0` for
    the generative variant (posterior via `infer_z`, reparameterised
    samples via `sample_z`).
    """

    c_dim: int = 512
    hidden_dim: int = 512
    decoder_hidden: int = 256
    z_dim: int = 0

    def setup(self):
        self.encoder = ResnetPointnet(self.c_dim, self.hidden_dim)
        self.decoder = DecoderCBatchNorm(self.decoder_hidden, self.z_dim)
        if self.z_dim:
            self.encoder_latent = LatentEncoder(self.z_dim, self.c_dim)

    def encode_inputs(self, pc):
        return self.encoder(pc)

    def decode(self, p, c, z=None, train: bool = False):
        return self.decoder(p, c, z, train)

    def infer_z(self, p, occ, c):
        """Posterior (mean, logstd) of q(z | p, occ, c)."""
        if not self.z_dim:
            B = p.shape[0]
            return jnp.zeros((B, 0)), jnp.zeros((B, 0))
        return self.encoder_latent(p, occ, c)

    def get_z_from_prior(self, batch: int, key=None, sample: bool = True):
        """Prior latent: zeros (z_dim 0 / mean) or a N(0, I) sample."""
        if not self.z_dim or not sample or key is None:
            return jnp.zeros((batch, self.z_dim))
        return jax.random.normal(key, (batch, self.z_dim))

    def __call__(self, pc, p, train: bool = False):
        c = self.encode_inputs(pc)
        return self.decode(p, c, train=train)


def sample_z(mean, logstd, key):
    """Reparameterised posterior sample z = mean + exp(logstd) * eps."""
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape)


def kl_normal(mean, logstd):
    """KL(q(z) || N(0, I)) per example, [B] — the ONet ELBO term."""
    var = jnp.exp(2.0 * logstd)
    return 0.5 * jnp.sum(var + mean**2 - 1.0 - 2.0 * logstd, axis=-1)
