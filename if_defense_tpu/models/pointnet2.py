"""PointNet++ (SSG) classifier (TPU-native re-design).

Architecture parity with `baselines/model/pointnet2.py:101-194,341-367`:
three set-abstraction levels — sa1(512 pts, r 0.2, 32 samples, MLP 64-64-128),
sa2(128 pts, r 0.4, 64 samples, MLP 128-128-256), sa3(group-all,
MLP 256-512-1024) — followed by an FC head with dropout 0.4.

FPS runs as an on-device fori_loop; ball-query grouping is one distance
matmul + masked sort per level. All shapes static.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from if_defense_tpu.models.common import DenseBN, PointwiseMLP
from if_defense_tpu.ops import (
    farthest_point_sample,
    index_points,
    query_ball_point,
)


def sample_and_group(npoint, radius, nsample, xyz, points):
    """FPS centres + ball-query groups with centred coordinates.

    Args:
        xyz: [B, N, 3]; points: [B, N, D] or None.
    Returns:
        new_xyz [B, npoint, 3], grouped [B, npoint, nsample, 3(+D)]
    """
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
    if points is not None:
        grouped = jnp.concatenate([grouped_xyz, index_points(points, idx)], -1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped


def sample_and_group_all(xyz, points):
    """Single group covering all points, centre at the origin."""
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), xyz.dtype)
    grouped = xyz[:, None]
    if points is not None:
        grouped = jnp.concatenate([grouped, points[:, None]], -1)
    return new_xyz, grouped


class SetAbstraction(nn.Module):
    """Grouped pointwise MLP + max-pool over each neighbourhood."""

    npoint: int | None
    radius: float | None
    nsample: int | None
    mlp: tuple
    group_all: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points)
        else:
            new_xyz, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points
            )
        feat = PointwiseMLP(list(self.mlp), use_bn=self.use_bn)(grouped, train)
        return new_xyz, jnp.max(feat, axis=2)     # pool over neighbourhood


class PointNet2ClsSsg(nn.Module):
    """Returns (logits [B, num_classes], {}) on [B, N, 3] input."""

    num_classes: int = 40
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        l1_xyz, l1 = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                    use_bn=self.use_bn)(xyz, None, train)
        l2_xyz, l2 = SetAbstraction(128, 0.4, 64, (128, 128, 256),
                                    use_bn=self.use_bn)(l1_xyz, l1, train)
        _, l3 = SetAbstraction(None, None, None, (256, 512, 1024),
                               group_all=True, use_bn=self.use_bn)(
            l2_xyz, l2, train
        )
        x = l3.reshape(l3.shape[0], -1)                       # [B, 1024]
        x = nn.relu(DenseBN(512, use_bn=self.use_bn)(x, train))
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = nn.relu(DenseBN(256, use_bn=self.use_bn)(x, train))
        x = nn.Dropout(0.4, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes)(x)
        return logits, {}
