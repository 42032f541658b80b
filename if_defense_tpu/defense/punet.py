"""PU-Net point upsampler (CVPR'18) — the DUP-Net restoration stage.

Architecture parity with `baselines/defense/DUP_Net/pu_net.py:8-132` (SA/FP
modules `pu_modules.py:12-183`, grouping `pu_utils.py:99-167`): 4
set-abstraction levels (1024/512/256/128 points, radii .05/.1/.2/.3, 32
samples, MLPs 32-32-64 / 64-64-128 / 128-128-256 / 256-256-512), 3 feature
propagations (3-NN inverse-distance interpolation + MLP to 64) back to the
input resolution, concat [xyz, l1, fp2, fp3, fp4] (259 ch), `up_ratio`
parallel expansion MLPs 256-128, and a 64->3 coordinate head. The shipped
DUP-Net config uses no batch norm (`DUP_Net.py:19-21`), so SharedMLP =
Dense+ReLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from if_defense_tpu.ops import (
    farthest_point_sample,
    index_points,
    query_ball_point,
    square_distance,
)


class SharedMLP(nn.Module):
    """Per-point Dense(+ReLU) stack; `activate_last=False` for the head."""

    features: tuple
    activate_last: bool = True

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if self.activate_last or i < n - 1:
                x = nn.relu(x)
        return x


class PUNetSA(nn.Module):
    """Set abstraction: FPS centres, ball-query grouping, MLP, max-pool."""

    npoint: int
    radius: float
    nsample: int
    mlp: tuple

    @nn.compact
    def __call__(self, xyz, feats):
        new_xyz = index_points(xyz, farthest_point_sample(xyz, self.npoint))
        idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz)
        grouped = index_points(xyz, idx) - new_xyz[:, :, None, :]
        if feats is not None:
            grouped = jnp.concatenate([grouped, index_points(feats, idx)], -1)
        h = SharedMLP(self.mlp)(grouped)              # [B, S, ns, C]
        return new_xyz, jnp.max(h, axis=2)


class PUNetFP(nn.Module):
    """3-NN inverse-distance feature interpolation + MLP."""

    mlp: tuple

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, known_feats):
        d = square_distance(unknown_xyz, known_xyz)   # [B, N, M]
        neg_top, idx = jax.lax.top_k(-d, 3)
        dists = -neg_top                               # [B, N, 3]
        w = 1.0 / (dists + 1e-8)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        gathered = index_points(known_feats, idx)      # [B, N, 3, C]
        interp = jnp.sum(gathered * w[..., None], axis=2)
        return SharedMLP(self.mlp)(interp)


class PUNet(nn.Module):
    """Input [B, npoint, 3] -> upsampled [B, npoint * up_ratio, 3]."""

    npoint: int = 1024
    up_ratio: int = 4

    @nn.compact
    def __call__(self, xyz):
        npoints = (self.npoint, self.npoint // 2,
                   self.npoint // 4, self.npoint // 8)
        mlps = ((32, 32, 64), (64, 64, 128),
                (128, 128, 256), (256, 256, 512))
        radii = (0.05, 0.1, 0.2, 0.3)

        l_xyz, l_feats = [xyz], [None]
        for k in range(4):
            lx, lf = PUNetSA(npoints[k], radii[k], 32, mlps[k])(
                l_xyz[k], l_feats[k]
            )
            l_xyz.append(lx)
            l_feats.append(lf)

        up = [
            PUNetFP((64,))(xyz, l_xyz[k + 2], l_feats[k + 2])
            for k in range(3)
        ]
        feats = jnp.concatenate([xyz, l_feats[1], *up], axis=-1)  # [B,N,259]

        expansions = [
            SharedMLP((256, 128))(feats) for _ in range(self.up_ratio)
        ]
        r_feats = jnp.concatenate(expansions, axis=1)   # [B, r*N, 128]

        h = SharedMLP((64,))(r_feats)
        return SharedMLP((3,), activate_last=False)(h)  # [B, r*N, 3]
