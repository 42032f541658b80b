"""Shared building blocks for the victim classifiers.

All models are channel-last ([B, N, C]) so pointwise "Conv1d(k=1)" layers
become plain Dense layers — XLA maps them straight onto the MXU with the
channel axis in lanes. BatchNorm matches torch defaults (eps 1e-5,
running-stat momentum 0.1 → flax momentum 0.9).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp


class PointwiseMLP(nn.Module):
    """Stack of per-point Dense(+BN)(+activation) layers.

    `relu_last=False` leaves the final layer linear-after-BN (PointNet's
    conv3 before the max-pool).
    """

    features: Sequence[int]
    use_bn: bool = True
    relu_last: bool = True
    negative_slope: float = 0.0  # 0 = relu, >0 = leaky relu
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=self.use_bias)(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5
                )(x)
            if self.relu_last or i < n - 1:
                if self.negative_slope > 0:
                    x = nn.leaky_relu(x, self.negative_slope)
                else:
                    x = nn.relu(x)
        return x


class DenseBN(nn.Module):
    """Dense + optional BatchNorm (no activation)."""

    features: int
    use_bn: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=self.use_bias)(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        return x


def max_pool_points(x: jnp.ndarray, mask: jnp.ndarray | None = None
                    ) -> jnp.ndarray:
    """Global max pool over the point axis: [B, N, C] -> [B, C].

    With a [B, N] validity mask, masked points are excluded — identical
    (in eval mode, where no op mixes points) to pooling the compacted
    valid subset. This is what makes fixed-shape masked victim forwards
    exact (the Saliency-Drop attack, SOR's ragged outputs).
    """
    if mask is None:
        return jnp.max(x, axis=1)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    return jnp.max(jnp.where(mask[..., None] > 0, x, neg), axis=1)


def mean_pool_points(x: jnp.ndarray, mask: jnp.ndarray | None = None
                     ) -> jnp.ndarray:
    """Global mean pool over the point axis: [B, N, C] -> [B, C],
    counting only valid points when a [B, N] mask is given."""
    if mask is None:
        return jnp.mean(x, axis=1)
    m = (mask > 0).astype(x.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.sum(x * m, axis=1) / cnt
