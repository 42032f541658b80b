"""Adversarial + distance loss library for the attacks.

Per-example semantics match `baselines/attack/util/adv_utils.py` and
`dist_utils.py`; every function returns [B] so callers apply weights /
batch-averaging themselves (the CW framework needs per-example weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from if_defense_tpu.ops import chamfer_distance, hausdorff_distance, knn_self


def logits_adv_loss(
    logits: jax.Array, target: jax.Array, kappa: float = 0.0
) -> jax.Array:
    """CW margin loss: clamp(max_other - target_logit + kappa, 0), [B]."""
    B, K = logits.shape
    one_hot = jax.nn.one_hot(target, K)
    real = jnp.sum(one_hot * logits, axis=1)
    other = jnp.max((1.0 - one_hot) * logits - one_hot * 10000.0, axis=1)
    return jnp.maximum(other - real + kappa, 0.0)


def cross_entropy_adv_loss(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Per-example cross entropy toward the target class, [B]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]


def l2_dist(adv: jax.Array, ori: jax.Array) -> jax.Array:
    """Global L2 distance per cloud, [B].

    Floored before the sqrt so the gradient is finite at adv == ori (the CW
    init is ori + 1e-7 noise, which can round to exactly ori in f32).
    """
    return jnp.sqrt(jnp.maximum(jnp.sum((adv - ori) ** 2, axis=(1, 2)), 1e-12))


def chamfer_dist(adv, ori, method: str = "adv2ori") -> jax.Array:
    a2o, o2a = chamfer_distance(adv, ori)
    if method == "adv2ori":
        return a2o
    if method == "ori2adv":
        return o2a
    return (a2o + o2a) / 2.0


def hausdorff_dist(adv, ori, method: str = "adv2ori") -> jax.Array:
    a2o, o2a = hausdorff_distance(adv, ori)
    if method == "adv2ori":
        return a2o
    if method == "ori2adv":
        return o2a
    return (a2o + o2a) / 2.0


def knn_dist(pc: jax.Array, k: int = 5, alpha: float = 1.05,
             method: str = "sort") -> jax.Array:
    """Outlier-punishing mean-kNN distance (AAAI'20), [B].

    Threshold mask (mean + alpha * std of the per-point mean kNN sq-dist)
    is computed under stop_gradient like the reference's no_grad block.
    `method="approx"` swaps the exact top_k (a full TPU sort, ~60 ms at
    N=1024) for `approx_max_k` inside the 2500-iteration kNN attack loop.
    """
    _, d = knn_self(k, pc, return_dist=True, method=method)  # [B, K, k] sq
    value = jnp.mean(d, axis=-1)                         # [B, K]
    stats = jax.lax.stop_gradient(value)
    mean = jnp.mean(stats, axis=-1, keepdims=True)
    n = stats.shape[-1]
    std = jnp.sqrt(jnp.sum((stats - mean) ** 2, -1, keepdims=True) / (n - 1))
    mask = (stats > mean + alpha * std).astype(pc.dtype)
    return jnp.mean(value * mask, axis=1)


def chamfer_knn_dist(
    adv, ori, chamfer_method="adv2ori",
    knn_k: int = 5, knn_alpha: float = 1.05,
    chamfer_weight: float = 5.0, knn_weight: float = 3.0,
    knn_method: str = "sort",
) -> jax.Array:
    """Geometry-aware distance of the kNN attack (5*CD + 3*kNN), [B]."""
    return (
        chamfer_weight * chamfer_dist(adv, ori, chamfer_method)
        + knn_weight * knn_dist(adv, knn_k, knn_alpha, knn_method)
    )


def farthest_dist(clusters: jax.Array) -> jax.Array:
    """Sum over clusters of the max pairwise distance, [B].

    Args:
        clusters: [B, num_add, P, 3] added clusters.
    """
    delta = clusters[:, :, None, :, :] - clusters[:, :, :, None, :] + 1e-7
    norm = jnp.sqrt(jnp.sum(delta * delta, axis=-1))     # [B, na, P, P]
    far = jnp.max(jnp.max(norm, axis=2), axis=2)         # [B, na]
    return jnp.sum(far, axis=1)
