"""Shared implicit-network layers.

Parity with `ONet/im2mesh/layers.py` (= `ConvONet/src/layers.py` for
ResnetBlockFC): fully-connected ResNet blocks with zero-initialised second
layer, and conditional batch norm whose gamma/beta come from 1x1 convs on
the latent code (gamma-conv initialised to output 1, beta-conv to 0).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ResnetBlockFC(nn.Module):
    """FC ResNet block (`layers.py:6-49`): x + fc1(relu(fc0(relu(x))))."""

    size_out: int | None = None
    size_h: int | None = None

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)

        net = nn.Dense(size_h, name="fc_0")(nn.relu(x))
        dx = nn.Dense(
            size_out, name="fc_1", kernel_init=nn.initializers.zeros
        )(nn.relu(net))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


class CBatchNorm(nn.Module):
    """Conditional batch norm (`layers.py:193-243`).

    Per-channel batch norm without affine params, then gamma(c) * x +
    beta(c) where gamma/beta are linear maps of the latent code
    (initialised to 1 / 0 so the layer starts as plain BN).
    """

    f_dim: int

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        # x: [B, T, f_dim]; c: [B, c_dim]
        gamma = nn.Dense(
            self.f_dim,
            name="conv_gamma",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
        )(c)                                       # [B, f_dim]
        beta = nn.Dense(
            self.f_dim,
            name="conv_beta",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(c)
        net = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=False,
            use_scale=False,
            name="bn",
        )(x)
        return gamma[:, None, :] * net + beta[:, None, :]


class ResnetBlockConv1d(nn.Module):
    """Unconditional BN ResNet block (`layers.py:110-157`).

    x + fc1(relu(bn1(fc0(relu(bn0(x)))))) with zero-init fc1; used by
    `DecoderBatchNorm`.
    """

    size_h: int | None = None
    size_out: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        size_in = x.shape[-1]
        size_h = self.size_h or size_in
        size_out = self.size_out or size_in

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                epsilon=1e-5, name=name)

        net = nn.Dense(size_h, name="fc_0")(nn.relu(bn("bn_0")(x)))
        dx = nn.Dense(
            size_out, name="fc_1", kernel_init=nn.initializers.zeros
        )(nn.relu(bn("bn_1")(net)))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


class CResnetBlockConv1d(nn.Module):
    """Conditional ResNet block (`layers.py:51-108`).

    x + fc1(relu(cbn1(fc0(relu(cbn0(x, c))), c))) with zero-init fc1.
    """

    size_h: int | None = None
    size_out: int | None = None

    @nn.compact
    def __call__(self, x, c, train: bool = False):
        size_in = x.shape[-1]
        size_h = self.size_h or size_in
        size_out = self.size_out or size_in

        net = CBatchNorm(size_in, name="bn_0")(x, c, train)
        net = nn.Dense(size_h, name="fc_0")(nn.relu(net))
        net = CBatchNorm(size_h, name="bn_1")(net, c, train)
        dx = nn.Dense(
            size_out, name="fc_1", kernel_init=nn.initializers.zeros
        )(nn.relu(net))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx
