"""PointNet classifier (TPU-native re-design).

Architecture parity with `baselines/model/pointnet.py:11-205`: STN3d input
transform, shared MLP 64-128-1024 (last layer BN but no ReLU before the
global max-pool), FC head 512-256-40 with dropout(0.3) applied *before* the
second BN — an idiosyncrasy of the reference kept for weight-compatibility.
Channel-last [B, N, 3] I/O.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from if_defense_tpu.models.common import DenseBN, PointwiseMLP, max_pool_points


class STN(nn.Module):
    """Spatial/feature transform net predicting a k x k matrix (+identity)."""

    k: int = 3
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        # x: [B, N, k]; mask: optional [B, N] validity (masked points are
        # excluded from every pool — exact vs a compacted cloud in eval)
        h = PointwiseMLP([64, 128, 1024], use_bn=self.use_bn)(x, train)
        h = max_pool_points(h, mask)                              # [B, 1024]
        h = nn.relu(DenseBN(512, use_bn=self.use_bn)(h, train))
        h = nn.relu(DenseBN(256, use_bn=self.use_bn)(h, train))
        mat = nn.Dense(
            self.k * self.k, kernel_init=nn.initializers.zeros
        )(h)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(-1)
        mat = mat + eye
        return mat.reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """Global feature extractor: STN -> MLP(64) [-> fSTN] -> MLP(128, 1024) -> max."""

    feature_transform: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, train: bool = False, mask=None):
        trans = STN(k=3, use_bn=self.use_bn)(xyz, train, mask)    # [B, 3, 3]
        x = jnp.einsum("bnc,bcd->bnd", xyz, trans)
        x = PointwiseMLP([64], use_bn=self.use_bn)(x, train)

        trans_feat = None
        if self.feature_transform:
            trans_feat = STN(k=64, use_bn=self.use_bn)(x, train, mask)
            x = jnp.einsum("bnc,bcd->bnd", x, trans_feat)

        x = PointwiseMLP([128], use_bn=self.use_bn)(x, train)
        x = PointwiseMLP([1024], use_bn=self.use_bn, relu_last=False)(x, train)
        return max_pool_points(x, mask), trans, trans_feat        # [B, 1024]


class PointNetCls(nn.Module):
    """PointNet classifier; returns (logits [B, num_classes], aux dict)."""

    num_classes: int = 40
    feature_transform: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, xyz, train: bool = False, mask=None):
        feat, trans, trans_feat = PointNetFeat(
            feature_transform=self.feature_transform, use_bn=self.use_bn
        )(xyz, train, mask)
        x = nn.relu(DenseBN(512, use_bn=self.use_bn)(feat, train))
        x = nn.Dense(256)(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        x = nn.relu(x)
        logits = nn.Dense(self.num_classes)(x)
        aux = {"trans": trans}
        if trans_feat is not None:
            aux["trans_feat"] = trans_feat
        return logits, aux


def feature_transform_regularizer(trans: jnp.ndarray) -> jnp.ndarray:
    """|| T T^t - I ||_F penalty (`baselines/model/pointnet.py:197-205`)."""
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)
    m = jnp.einsum("bij,bkj->bik", trans, trans) - eye
    return jnp.mean(jnp.linalg.norm(m, axis=(1, 2)))
