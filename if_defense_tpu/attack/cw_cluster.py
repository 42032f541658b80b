"""CW Add-Cluster and Add-Object attacks (CVPR'19 adversarial clusters/objects).

Parity with `baselines/attack/CW/Add_Cluster.py:48-278` and
`Add_Objects.py:50-367`. The DBSCAN vulnerable-region initialisation is a
one-shot host-side preprocessing (a ~128-point clustering per cloud — not a
TPU workload); the reference uses sklearn, here a small self-contained
numpy DBSCAN. The optimisation itself runs through the shared on-device
CW binary-search core.
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.attack.cw import (
    _add_fns,
    _cw_binary_search_chunked,
    _cw_fused_env,
    get_critical_points,
)
from if_defense_tpu.attack.losses import (
    chamfer_dist,
    farthest_dist,
    l2_dist,
    logits_adv_loss,
)

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")


def dbscan_labels(points: np.ndarray, eps: float, min_samples: int):
    """Minimal DBSCAN over a small point set; returns labels (-1 = noise)."""
    n = len(points)
    d = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    neighbors = [np.where(d[i] <= eps * eps)[0] for i in range(n)]
    core = np.array([len(nb) >= min_samples for nb in neighbors])
    labels = np.full(n, -1)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS expand from this core point
        labels[i] = cluster
        queue = list(neighbors[i])
        while queue:
            j = queue.pop()
            if labels[j] == -1:
                labels[j] = cluster
                if core[j]:
                    queue.extend(neighbors[j])
            elif labels[j] != cluster and not core[j]:
                pass
        cluster += 1
    return labels


def _init_clusters(
    cri_points: np.ndarray, num_add: int, cl_num_p: int, rng: np.random.Generator,
    eps: float = 0.2, min_samples: int = 3,
):
    """Pick `num_add` vulnerable regions of `cl_num_p` points each.

    Mirrors `Add_Cluster.py:83-130`: DBSCAN the critical points, take the
    `num_add` largest clusters, resample each to `cl_num_p` points; fall
    back to kNN balls around random critical points when clusters are few.
    """
    B = len(cri_points)
    out = np.zeros((B, num_add, cl_num_p, 3), np.float32)
    for i in range(B):
        points = cri_points[i]
        labels = dbscan_labels(points, eps, min_samples)
        keep = labels >= 0
        lab, pts = labels[keep], points[keep]
        if len(pts) == 0:
            lab, pts = np.zeros(len(points), int), points
        uniq, counts = np.unique(lab, return_counts=True)
        chosen = uniq[np.argsort(counts)[-num_add:]]
        clusters = []
        for c in chosen:
            cp = pts[lab == c]
            idx = rng.choice(len(cp), cl_num_p, replace=len(cp) <= cl_num_p)
            clusters.append(cp[idx])
        while len(clusters) < num_add:
            center = pts[rng.integers(0, len(pts))]
            dist = ((pts - center) ** 2).sum(-1)
            nn = np.argsort(dist)[:cl_num_p]
            ball = pts[nn]
            if len(ball) < cl_num_p:
                ball = ball[rng.choice(len(ball), cl_num_p, replace=True)]
            clusters.append(ball)
        out[i] = np.stack(clusters[:num_add])
    return out


def _init_object_centers(
    cri_points: np.ndarray, num_add: int, rng: np.random.Generator,
    eps: float = 0.2, min_samples: int = 3,
):
    """Cluster-center seeds for object placement (`Add_Objects.py:100-145`)."""
    B = len(cri_points)
    out = np.zeros((B, num_add, 3), np.float32)
    for i in range(B):
        points = cri_points[i]
        labels = dbscan_labels(points, eps, min_samples)
        keep = labels >= 0
        lab, pts = labels[keep], points[keep]
        if len(pts) == 0:
            lab, pts = np.zeros(len(points), int), points
        uniq, counts = np.unique(lab, return_counts=True)
        chosen = uniq[np.argsort(counts)[-num_add:]]
        centers = []
        for c in chosen:
            cp = pts[lab == c]
            mean = cp.mean(0)
            centers.append(cp[np.argmin(((cp - mean) ** 2).sum(-1))])
        while len(centers) < num_add:
            centers.append(pts[rng.integers(0, len(pts))])
        out[i] = np.stack(centers[:num_add])
    return out


def far_chamfer_dist(added: jax.Array, ori: jax.Array, num_add: int,
                     chamfer_weight: float = 0.1) -> jax.Array:
    """FarthestDist + 0.1 * Chamfer (`dist_utils.py:239-276`), [B]."""
    B = added.shape[0]
    clusters = added.reshape(B, num_add, -1, 3)
    return farthest_dist(clusters) + chamfer_weight * chamfer_dist(added, ori)


@functools.lru_cache(maxsize=8)
def _cluster_dist_fn(num_add: int):
    """Stable per-num_add distance fn (lru: stable identity for the
    chunked path's static jit args)."""

    def dist(added, ori):
        return far_chamfer_dist(added, ori, num_add)

    return dist


def cw_add_cluster(
    logits_fn: Callable,
    data: jax.Array,
    target: jax.Array,
    key: jax.Array,
    adv_fn: Callable = logits_adv_loss,
    num_add: int = 3,
    cl_num_p: int = 32,
    attack_lr: float = 1e-2,
    init_weight: float = 5.0,
    max_weight: float = 30.0,
    binary_step: int = 5,
    num_iter: int = 500,
    seed: int = 0,
    device_chunk_iters: int | None = None,
):
    """CW adversarial-cluster attack.

    Returns:
        (bestdist [B], adv_pc [B, K + num_add*cl_num_p, 3], success [B]).
    """
    ori = data
    cri = np.asarray(get_critical_points(logits_fn, ori, target, 128))
    clusters = _init_clusters(
        cri, num_add, cl_num_p, np.random.default_rng(seed)
    )
    flat0 = jnp.asarray(clusters.reshape(len(ori), num_add * cl_num_p, 3))

    fns = _add_fns(logits_fn, _cluster_dist_fn(num_add), adv_fn)
    env = {"ori": ori, "init0": flat0}
    common = dict(
        attack_lr=attack_lr, init_weight=init_weight,
        max_weight=max_weight, binary_step=binary_step, num_iter=num_iter,
    )
    if device_chunk_iters:
        obd, best_added, success = _cw_binary_search_chunked(
            fns, env, target, key,
            device_chunk_iters=device_chunk_iters, **common,
        )
    else:
        obd, best_added, success = _cw_fused_env(
            fns, common["attack_lr"], common["init_weight"],
            common["max_weight"], common["binary_step"],
            common["num_iter"], None, env, target, key,
        )
    return obd, jnp.concatenate([ori, best_added], axis=1), success


def _rotate_shift(objects, angles, shifts):
    """y-axis rotate each object by angles[..., 0], then translate.

    objects: [B, na, P, 3]; angles/shifts: [B, na, 3] -> [B, na, P, 3]
    (`Add_Objects.py:148-185` — only the y rotation is used).
    """
    ang = angles[..., 0]
    c, s = jnp.cos(ang), jnp.sin(ang)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    rot = jnp.stack(
        [c, z, s, z, o, z, -s, z, c], axis=-1
    ).reshape(*ang.shape, 3, 3)                       # [B, na, 3, 3]
    rotated = jnp.einsum("bnpc,bncd->bnpd", objects, rot)
    return rotated + shifts[:, :, None, :]


def load_airplane(obj_num_p: int, num_add: int, scaling: float,
                  rng: np.random.Generator) -> np.ndarray:
    """Load + normalise + scale the template object (`Add_Objects.py:76-98`)."""
    pc = np.load(os.path.join(ASSET_DIR, "airplane.npy")).astype(np.float32)
    out = np.zeros((num_add, obj_num_p, 3), np.float32)
    for i in range(num_add):
        perm = rng.permutation(len(pc))[:obj_num_p]
        sel = pc[perm]
        sel = sel - sel.mean(0)
        sel = sel / np.sqrt((sel**2).sum(-1)).max()
        out[i] = sel * scaling
    return out


@functools.lru_cache(maxsize=8)
def _object_fns(logits_fn, adv_fn, chamfer_weight: float):
    """Env-fn tuple for the chunked object attack. Per-batch arrays live
    in env (ori/objects0/centers); shapes are derived from them so one
    compilation covers every batch."""

    def make_points(env, adv):
        objs, angles, shifts = adv
        pts = _rotate_shift(objs, angles, shifts)
        return pts.reshape(pts.shape[0], -1, 3)

    def logits_env(env, adv):
        return logits_fn(
            jnp.concatenate([env["ori"], make_points(env, adv)], 1))

    def dist_env(env, adv):
        objs, _, _ = adv
        B = objs.shape[0]
        added = make_points(env, adv)
        l2 = l2_dist(objs.reshape(B, -1, 3),
                     env["objects0"].reshape(B, -1, 3))
        return l2 + chamfer_weight * chamfer_dist(added, env["ori"])

    def init_env(env, k):
        k1, k2, k3 = jax.random.split(k, 3)
        objects0, centers = env["objects0"], env["centers"]
        objs = objects0 + jax.random.normal(k1, objects0.shape) * 1e-7
        shifts = centers + jax.random.normal(k2, centers.shape) * 1e-7
        angles = jax.random.uniform(
            k3, centers.shape, maxval=jnp.pi
        )
        return (objs, angles, shifts)

    def post_env(env, adv):
        objs, angles, shifts = adv
        return (objs, jnp.mod(angles, 2 * jnp.pi), shifts)

    return (logits_env, dist_env, init_env, make_points, post_env, adv_fn)


def cw_add_object(
    logits_fn: Callable,
    data: jax.Array,
    target: jax.Array,
    key: jax.Array,
    adv_fn: Callable = logits_adv_loss,
    num_add: int = 3,
    obj_num_p: int = 64,
    scaling: float = 0.3,
    chamfer_weight: float = 0.2,
    attack_lr: float = 1e-2,
    init_weight: float = 5.0,
    max_weight: float = 40.0,
    binary_step: int = 5,
    num_iter: int = 500,
    seed: int = 0,
    device_chunk_iters: int | None = None,
):
    """CW adversarial-object attack: rigid template objects whose shape,
    y-rotation, and placement are optimised jointly.

    Returns:
        (bestdist [B], adv_pc [B, K + num_add*obj_num_p, 3], success [B]).
    """
    B = data.shape[0]
    ori = data
    rng = np.random.default_rng(seed)
    template = load_airplane(obj_num_p, num_add, scaling, rng)
    objects0 = jnp.asarray(np.tile(template[None], (B, 1, 1, 1)))
    cri = np.asarray(get_critical_points(logits_fn, ori, target, 128))
    centers = jnp.asarray(_init_object_centers(cri, num_add, rng))

    fns = _object_fns(logits_fn, adv_fn, chamfer_weight)
    env = {"ori": ori, "objects0": objects0, "centers": centers}
    common = dict(
        attack_lr=attack_lr, init_weight=init_weight,
        max_weight=max_weight, binary_step=binary_step, num_iter=num_iter,
    )
    if device_chunk_iters:
        obd, best_added, success = _cw_binary_search_chunked(
            fns, env, target, key,
            device_chunk_iters=device_chunk_iters, **common,
        )
    else:
        obd, best_added, success = _cw_fused_env(
            fns, common["attack_lr"], common["init_weight"],
            common["max_weight"], common["binary_step"],
            common["num_iter"], None, env, target, key,
        )
    return obd, jnp.concatenate([ori, best_added], axis=1), success
