"""DGCNN classifier (TPU-native re-design).

Architecture parity with `baselines/model/dgcnn.py:43-129`: a dynamic kNN
graph (k=20, self-match included — the reference top-k of negative distance
keeps self) recomputed before each of 4 EdgeConv blocks (64, 64, 128, 256),
a 1024-d embedding, max+avg global pools concatenated, leaky-relu(0.2) FC
head with dropout 0.5.

The EdgeConv gather is expressed as a batched `take_along_axis` over
channel-last features — XLA lowers it to an efficient dynamic-gather; the
kNN itself is one MXU matmul + top_k.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from if_defense_tpu.models.common import (
    DenseBN,
    PointwiseMLP,
    max_pool_points,
    mean_pool_points,
)
from if_defense_tpu.ops import gather_neighbors, knn_points


def get_graph_feature(x: jnp.ndarray, k: int, mask=None) -> jnp.ndarray:
    """EdgeConv features [feat_j - feat_i, feat_i] over the kNN graph.

    Args:
        x: [B, N, C] point features (graph built on these features).
        mask: optional [B, N] validity — masked points are never chosen
            as neighbours (their own rows are garbage but masked out of
            the global pools downstream).
    Returns:
        [B, N, k, 2C]
    """
    idx = knn_points(k, x, candidate_mask=mask)  # [B, N, k] (includes self)
    neigh = gather_neighbors(x, idx)             # [B, N, k, C]
    center = jnp.broadcast_to(x[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh - center, center], axis=-1)


class DGCNN(nn.Module):
    """Returns (logits [B, num_classes], {}) on [B, N, 3] input."""

    num_classes: int = 40
    k: int = 20
    emb_dims: int = 1024
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, train: bool = False, mask=None):
        slope = 0.2

        def edge_conv(feat, out_ch):
            g = get_graph_feature(feat, self.k, mask)        # [B, N, k, 2C]
            g = PointwiseMLP(
                [out_ch],
                use_bn=self.use_bn,
                negative_slope=slope,
                use_bias=False,
            )(g, train)
            return jnp.max(g, axis=2)                        # [B, N, out_ch]

        x1 = edge_conv(xyz, 64)
        x2 = edge_conv(x1, 64)
        x3 = edge_conv(x2, 128)
        x4 = edge_conv(x3, 256)

        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)       # [B, N, 512]
        x = PointwiseMLP(
            [self.emb_dims],
            use_bn=self.use_bn,
            negative_slope=slope,
            use_bias=False,
        )(x, train)                                           # [B, N, 1024]

        xmax = max_pool_points(x, mask)
        xavg = mean_pool_points(x, mask)
        x = jnp.concatenate([xmax, xavg], axis=-1)           # [B, 2048]

        x = nn.leaky_relu(
            DenseBN(512, use_bn=self.use_bn, use_bias=False)(x, train), slope
        )
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.leaky_relu(DenseBN(256, use_bn=self.use_bn)(x, train), slope)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes)(x)
        return logits, {}
