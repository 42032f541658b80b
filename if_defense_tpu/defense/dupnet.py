"""DUP-Net defense: SOR -> pad/duplicate to fixed size -> frozen PU-Net x4.

Parity with `baselines/defense/DUP_Net/DUP_Net.py:11-68`. The ragged-list
handling of `process_data` (:22-61) becomes a fixed-shape masked resample:
clouds with more inliers than `npoint` are randomly subsampled, clouds with
fewer are cyclically duplicated (+ random remainder in the reference; cyclic
here — same multiset up to one duplication round).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from if_defense_tpu.defense.punet import PUNet
from if_defense_tpu.defense.sor import sor_defense


def process_data_fixed(
    pc: jax.Array, mask: jax.Array, npoint: int, key: jax.Array
) -> jax.Array:
    """Resample a masked cloud to exactly `npoint` valid points.

    Args:
        pc: [B, K, 3]; mask: [B, K] (1 = valid); key: PRNG key.
    Returns:
        [B, npoint, 3]
    """
    B, K, _ = pc.shape

    def one(p, m, k):
        # random stable-ish order of valid points first
        u = jax.random.uniform(k, (K,))
        order = jnp.argsort((1.0 - m) * 2.0 + u)      # valid first, shuffled
        n = jnp.maximum(jnp.sum(m).astype(jnp.int32), 1)
        j = jnp.arange(npoint, dtype=jnp.int32)
        idx = order[jnp.mod(j, n)]
        return p[idx]

    return jax.vmap(one)(pc, mask, jax.random.split(key, B))


class DUPNet:
    """SOR + PU-Net pipeline with frozen pretrained parameters.

    Usage:
        dup = DUPNet(sor_k=2, sor_alpha=1.1, npoint=1024, up_ratio=4)
        out = dup(params, pc, key)   # [B, npoint * up_ratio, 3]
    """

    def __init__(self, sor_k: int = 2, sor_alpha: float = 1.1,
                 npoint: int = 1024, up_ratio: int = 4):
        self.sor_k = sor_k
        self.sor_alpha = sor_alpha
        self.npoint = npoint
        self.pu_net = PUNet(npoint=npoint, up_ratio=up_ratio)

    def init(self, key: jax.Array):
        sample = jnp.zeros((1, self.npoint, 3), jnp.float32)
        return self.pu_net.init(key, sample)

    def __call__(self, variables, pc: jax.Array, key: jax.Array) -> jax.Array:
        pc, mask = sor_defense(pc, self.sor_k, self.sor_alpha)
        proc = process_data_fixed(pc, mask, self.npoint, key)
        return self.pu_net.apply(variables, proc)
