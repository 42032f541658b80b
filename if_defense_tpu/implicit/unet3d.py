"""3D UNet for the ConvONet 'grid' feature volume.

Volumetric counterpart of `unet2d.py` (role of `ConvONet/src/encoder/
unet3d.py`, unused in the shipped 3-plane config but part of the encoder
API): 3x3x3 same-padding double convs + ReLU, 2x max-pool downs,
stride-2 transpose-conv ups with skip concatenation, final 1x1x1 conv.
Channel-last [B, D, H, W, C].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DownConv3D(nn.Module):
    features: int
    pooling: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.features, (3, 3, 3), name="conv1")(x))
        x = nn.relu(nn.Conv(self.features, (3, 3, 3), name="conv2")(x))
        before = x
        if self.pooling:
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        return x, before


class UpConv3D(nn.Module):
    features: int

    @nn.compact
    def __call__(self, from_down, from_up):
        up = nn.ConvTranspose(
            self.features, (2, 2, 2), strides=(2, 2, 2), name="upconv"
        )(from_up)
        x = jnp.concatenate([up, from_down], axis=-1)
        x = nn.relu(nn.Conv(self.features, (3, 3, 3), name="conv1")(x))
        x = nn.relu(nn.Conv(self.features, (3, 3, 3), name="conv2")(x))
        return x


class UNet3D(nn.Module):
    """[B, D, H, W, in] -> [B, D, H, W, num_classes]; dims divisible by
    2^(depth-1)."""

    num_classes: int = 32
    depth: int = 3
    start_filts: int = 32

    @nn.compact
    def __call__(self, x):
        encoder_outs = []
        for i in range(self.depth):
            pooling = i < self.depth - 1
            x, before = DownConv3D(
                self.start_filts * (2**i), pooling, name=f"down_{i}"
            )(x)
            encoder_outs.append(before)
        for i in range(self.depth - 1):
            features = self.start_filts * (2 ** (self.depth - 2 - i))
            x = UpConv3D(features, name=f"up_{i}")(encoder_outs[-(i + 2)], x)
        return nn.Conv(self.num_classes, (1, 1, 1), name="conv_final")(x)
