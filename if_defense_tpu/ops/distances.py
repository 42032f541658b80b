"""Set distances between point clouds (Chamfer / Hausdorff).

Semantics follow `baselines/util/set_distance.py:35-70`: both directions are
returned per example, squared-L2 based, means/maxes over the point axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from if_defense_tpu.ops.pointops import square_distance


def chamfer_distance(adv: jax.Array, ori: jax.Array):
    """Bidirectional Chamfer distance.

    Args:
        adv: [B, N1, 3]
        ori: [B, N2, 3]
    Returns:
        (adv2ori [B], ori2adv [B]) — mean over points of the squared
        distance to the nearest point in the other set.
    """
    d = square_distance(adv, ori)                    # [B, N1, N2]
    adv2ori = jnp.mean(jnp.min(d, axis=2), axis=1)   # nearest ori per adv pt
    ori2adv = jnp.mean(jnp.min(d, axis=1), axis=1)   # nearest adv per ori pt
    return adv2ori, ori2adv


def hausdorff_distance(adv: jax.Array, ori: jax.Array):
    """Bidirectional (one-sided) Hausdorff distances.

    Returns:
        (adv2ori [B], ori2adv [B]) — max over points of the squared
        distance to the nearest point in the other set.
    """
    d = square_distance(adv, ori)
    adv2ori = jnp.max(jnp.min(d, axis=2), axis=1)
    ori2adv = jnp.max(jnp.min(d, axis=1), axis=1)
    return adv2ori, ori2adv
