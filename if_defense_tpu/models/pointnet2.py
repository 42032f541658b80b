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
import jax
import jax.numpy as jnp

from if_defense_tpu.models.common import DenseBN, PointwiseMLP
from if_defense_tpu.ops import (
    farthest_point_sample,
    gather_neighbors,
    index_points,
    query_ball_point,
)


def sample_and_group(npoint, radius, nsample, xyz, points, mask=None):
    """FPS centres + ball-query groups with centred coordinates.

    Args:
        xyz: [B, N, 3]; points: [B, N, D] or None.
        mask: optional [B, N] validity — masked points are neither FPS
            centres nor ball-query members, so every produced group
            contains only valid points (each centre is its own in-radius
            hit) and downstream levels need no masking.
    Returns:
        new_xyz [B, npoint, 3], grouped [B, npoint, nsample, 3(+D)]
    """
    fps_idx = farthest_point_sample(xyz, npoint, mask=mask)
    new_xyz = gather_neighbors(xyz, fps_idx)
    idx = query_ball_point(radius, nsample, xyz, new_xyz, mask=mask)
    grouped_xyz = gather_neighbors(xyz, idx) - new_xyz[:, :, None, :]
    if points is not None:
        grouped = jnp.concatenate(
            [grouped_xyz, gather_neighbors(points, idx)], -1)
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
    def __call__(self, xyz, points, train: bool = False, mask=None):
        if self.group_all:
            new_xyz, grouped = sample_and_group_all(xyz, points)
        else:
            new_xyz, grouped = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points, mask
            )
        feat = PointwiseMLP(list(self.mlp), use_bn=self.use_bn)(grouped, train)
        return new_xyz, jnp.max(feat, axis=2)     # pool over neighbourhood


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping SA (`baselines/model/pointnet2.py:197-255`):
    several (radius, nsample, mlp) branches around shared FPS centres,
    concatenated channel-wise."""

    npoint: int
    radius_list: tuple
    nsample_list: tuple
    mlp_list: tuple
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, points, train: bool = False):
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_neighbors(xyz, fps_idx)
        outs = []
        for radius, nsample, mlp in zip(
            self.radius_list, self.nsample_list, self.mlp_list
        ):
            idx = query_ball_point(radius, nsample, xyz, new_xyz)
            grouped_xyz = gather_neighbors(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [gather_neighbors(points, idx), grouped_xyz], -1)
            else:
                grouped = grouped_xyz
            feat = PointwiseMLP(list(mlp), use_bn=self.use_bn)(grouped, train)
            outs.append(jnp.max(feat, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN feature upsampling + pointwise MLP
    (`baselines/model/pointnet2.py:258-309`) — the segmentation-style
    decoder stage (also the PU-Net FP building block)."""

    mlp: tuple
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz1, xyz2, points1, points2, train: bool = False):
        # xyz1 [B, N, 3] targets; xyz2 [B, S, 3] sources with points2
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]
        if S == 1:
            interp = jnp.broadcast_to(points2, (B, N, points2.shape[-1]))
        else:
            from if_defense_tpu.ops import square_distance

            d = square_distance(xyz1, xyz2)
            neg_top, idx = jax.lax.top_k(-d, 3)
            w = 1.0 / (-neg_top + 1e-8)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            interp = jnp.sum(
                index_points(points2, idx) * w[..., None], axis=2)
        if points1 is not None:
            interp = jnp.concatenate([points1, interp], axis=-1)
        return PointwiseMLP(list(self.mlp), use_bn=self.use_bn)(interp, train)


class PointNet2ClsSsg(nn.Module):
    """Returns (logits [B, num_classes], {}) on [B, N, 3] input."""

    num_classes: int = 40
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, train: bool = False, mask=None):
        # only level 1 sees the mask: its FPS/ball-query select exclusively
        # valid points, so l1_xyz onward is an all-valid cloud
        l1_xyz, l1 = SetAbstraction(512, 0.2, 32, (64, 64, 128),
                                    use_bn=self.use_bn)(xyz, None, train,
                                                        mask)
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
