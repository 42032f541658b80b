"""PointConv (density SSG) classifier (TPU-native re-design).

Architecture parity with `baselines/model/pointconv.py:202-422`:
three density-weighted set-abstraction levels (512/128/group-all points,
kNN grouping with 32/64/all samples, bandwidths 0.1/0.2/0.4), Gaussian-KDE
per-point density rescaled by a small DensityNet, WeightNet-MLP kernel
weights on local coordinates, and a weighted-matmul aggregation that is a
natural MXU einsum. FC head 512-256-40 with dropout 0.4.

Note: the reference DensityNet's `if i == len(self.mlp_convs)` branch is
unreachable (off-by-one), so its sigmoid+0.5 is never applied and every
layer ends in ReLU — we reproduce the *effective* behaviour.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from if_defense_tpu.models.common import DenseBN, PointwiseMLP
from if_defense_tpu.ops import (
    farthest_point_sample,
    gather_neighbors,
    knn_points,
    square_distance,
)


def compute_density(xyz: jnp.ndarray, bandwidth: float,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-point Gaussian-KDE density over the whole cloud, [B, N].

    With a [B, N] validity mask the KDE runs over (and averages by) the
    valid points only — identical to the compacted cloud's density.
    """
    sq = square_distance(xyz, xyz)
    g = jnp.exp(-sq / (2.0 * bandwidth * bandwidth)) / (2.5 * bandwidth)
    if mask is None:
        return jnp.mean(g, axis=-1)
    m = (mask > 0).astype(g.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
    return jnp.sum(g * m[:, None, :], axis=-1) / cnt


class DensityNet(nn.Module):
    """1 -> 8 -> 8 -> 1 pointwise MLP rescaling the KDE density."""

    use_bn: bool = True

    @nn.compact
    def __call__(self, density, train: bool = False):
        # density: [B, N] -> [B, N, 1]
        x = density[..., None]
        x = PointwiseMLP([8, 8, 1], use_bn=self.use_bn)(x, train)
        return x                                              # [B, N, 1]


class WeightNet(nn.Module):
    """3 -> 8 -> 8 -> out pointwise MLP on local coordinates."""

    out: int = 16
    use_bn: bool = True

    @nn.compact
    def __call__(self, local_xyz, train: bool = False):
        return PointwiseMLP([8, 8, self.out], use_bn=self.use_bn)(
            local_xyz, train
        )


class PointConvSetAbstraction(nn.Module):
    """Density-weighted set abstraction with kNN grouping."""

    npoint: int | None
    nsample: int | None
    mlp: tuple
    bandwidth: float
    group_all: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, points, train: bool = False, mask=None):
        B, N, _ = xyz.shape
        density = compute_density(xyz, self.bandwidth, mask)  # [B, N]
        density_scale = DensityNet(use_bn=self.use_bn)(density, train)
        if mask is not None:
            # masked points contribute zero to the (sum) aggregation
            density_scale = density_scale * (mask > 0)[..., None]

        if self.group_all:
            new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
            grouped_xyz = xyz[:, None]                        # [B, 1, N, 3]
            grouped_norm = grouped_xyz
            feat = grouped_xyz
            if points is not None:
                feat = jnp.concatenate([grouped_xyz, points[:, None]], -1)
            grouped_density = density_scale[:, None]          # [B, 1, N, 1]
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint, mask=mask)
            new_xyz = gather_neighbors(xyz, fps_idx)
            idx = knn_points(self.nsample, xyz, new_xyz,
                             candidate_mask=mask)             # [B, S, k]
            grouped_xyz = gather_neighbors(xyz, idx)
            grouped_norm = grouped_xyz - new_xyz[:, :, None, :]
            feat = grouped_norm
            if points is not None:
                feat = jnp.concatenate(
                    [grouped_norm, gather_neighbors(points, idx)], -1
                )
            grouped_density = gather_neighbors(density_scale, idx)  # [B, S, k, 1]

        feat = PointwiseMLP(list(self.mlp), use_bn=self.use_bn)(feat, train)
        weights = WeightNet(16, use_bn=self.use_bn)(grouped_norm, train)
        # density-weighted kernel aggregation: one MXU einsum per level
        agg = jnp.einsum(
            "bskc,bskw->bscw",
            feat * grouped_density,
            weights,
            preferred_element_type=jnp.float32,
        )
        S = agg.shape[1]
        agg = agg.reshape(B, S, -1)                           # [B, S, C*16]
        out = nn.relu(
            DenseBN(self.mlp[-1], use_bn=self.use_bn)(agg, train)
        )
        return new_xyz, out


class PointConvDensityClsSsg(nn.Module):
    """Returns (logits [B, num_classes], {}) on [B, N, 3] input."""

    num_classes: int = 40
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, train: bool = False, mask=None):
        # only level 1 sees the mask: its FPS/kNN select exclusively valid
        # points, so l1_xyz onward is an all-valid cloud
        l1_xyz, l1 = PointConvSetAbstraction(
            512, 32, (64, 64, 128), 0.1, use_bn=self.use_bn
        )(xyz, None, train, mask)
        l2_xyz, l2 = PointConvSetAbstraction(
            128, 64, (128, 128, 256), 0.2, use_bn=self.use_bn
        )(l1_xyz, l1, train)
        _, l3 = PointConvSetAbstraction(
            1, None, (256, 512, 1024), 0.4, group_all=True, use_bn=self.use_bn
        )(l2_xyz, l2, train)
        x = l3.reshape(l3.shape[0], -1)                       # [B, 1024]
        x = nn.relu(DenseBN(512, use_bn=self.use_bn)(x, train))
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = nn.relu(DenseBN(256, use_bn=self.use_bn)(x, train))
        x = nn.Dropout(0.4, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes)(x)
        return logits, {}
