"""RS-CNN classifier (Relation-Shape CNN, CVPR'19, arXiv:1904.07601).

The reference repo reports RS-CNN results (`README.md:13,87`,
`imgs/hist_results_rscnn.png`) but ships no code — this is a from-paper
implementation of the single-scale (SSN) classifier: hierarchical set
abstraction where each neighbourhood's aggregation weights are *learned
from low-level geometric relations* h_ij = [d_ij, x_j - x_i, x_i, x_j]
(10-d) by a shared MLP, applied to neighbour features channel-wise, then
max-aggregated and channel-raised.

Same I/O contract as the other victims: [B, N, 3] -> (logits, {}).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from if_defense_tpu.models.common import DenseBN, PointwiseMLP
from if_defense_tpu.ops import (
    farthest_point_sample,
    gather_neighbors,
    query_ball_point,
)


def relation_features(grouped_xyz, new_xyz):
    """h_ij = [||x_j - x_i||, x_j - x_i, x_i, x_j], [B, S, ns, 10]."""
    diff = grouped_xyz - new_xyz[:, :, None, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1, keepdims=True),
                                1e-12))
    center = jnp.broadcast_to(new_xyz[:, :, None, :], grouped_xyz.shape)
    return jnp.concatenate([dist, diff, center, grouped_xyz], axis=-1)


class RelationConv(nn.Module):
    """One RS-Conv layer: learned relation weights -> mul -> max -> raise."""

    npoint: int | None
    radius: float | None
    nsample: int | None
    out_ch: int
    group_all: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False, mask=None):
        B, N, _ = xyz.shape
        if self.group_all:
            new_xyz = jnp.zeros((B, 1, 3), xyz.dtype)
            grouped_xyz = xyz[:, None]                    # [B, 1, N, 3]
            grouped_feats = (
                feats[:, None] if feats is not None else grouped_xyz
            )
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint, mask=mask)
            new_xyz = gather_neighbors(xyz, fps_idx)
            idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz,
                                   mask=mask)
            grouped_xyz = gather_neighbors(xyz, idx)
            grouped_feats = (
                gather_neighbors(feats, idx) if feats is not None
                else grouped_xyz - new_xyz[:, :, None, :]
            )

        in_ch = grouped_feats.shape[-1]
        h = relation_features(grouped_xyz, new_xyz)       # [B, S, ns, 10]
        # relation mapping M: 10 -> mid -> in_ch channel weights
        mid = max(in_ch // 2, 16)
        w = PointwiseMLP([mid], use_bn=self.use_bn)(h, train)
        w = nn.Dense(in_ch)(w)                            # no act on last
        weighted = w * grouped_feats                      # [B, S, ns, in_ch]
        agg = jnp.max(weighted, axis=2)                   # [B, S, in_ch]
        if self.use_bn:
            agg = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(agg)
        agg = nn.relu(agg)
        out = nn.relu(
            DenseBN(self.out_ch, use_bn=self.use_bn)(agg, train)
        )                                                 # channel raising
        return new_xyz, out


class RSCNN(nn.Module):
    """RS-CNN SSN classifier; returns (logits [B, num_classes], {})."""

    num_classes: int = 40
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, train: bool = False, mask=None):
        # only level 1 sees the mask: its FPS/ball-query select exclusively
        # valid points, so l1_xyz onward is an all-valid cloud
        l1_xyz, l1 = RelationConv(512, 0.23, 48, 128,
                                  use_bn=self.use_bn)(xyz, None, train,
                                                      mask)
        l2_xyz, l2 = RelationConv(128, 0.32, 64, 512,
                                  use_bn=self.use_bn)(l1_xyz, l1, train)
        _, l3 = RelationConv(None, None, None, 1024, group_all=True,
                             use_bn=self.use_bn)(l2_xyz, l2, train)
        x = l3.reshape(l3.shape[0], -1)                   # [B, 1024]
        x = nn.relu(DenseBN(512, use_bn=self.use_bn)(x, train))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(DenseBN(256, use_bn=self.use_bn)(x, train))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes)(x)
        return logits, {}
