"""Core point-cloud ops: pairwise distance, gather, kNN, FPS, ball query.

Semantics match the reference point-op idioms that are re-implemented 4x in
the PyTorch codebase (see `baselines/model/pointnet2.py:9-98`,
`baselines/model/pointconv.py:104-116`, `baselines/defense/DUP_Net/pu_utils.py`)
but are written TPU-first: distances as MXU matmuls, FPS as a fori_loop with
on-chip state, everything batched and fixed-shape.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Squared L2 distance between every pair of points.

    Matmul expansion ``|s|^2 + |d|^2 - 2 s.d`` (maps onto the MXU).

    Args:
        src: [B, N, C]
        dst: [B, M, C]
    Returns:
        [B, N, M] squared distances.
    """
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)        # [B, N, 1]
    d2 = jnp.sum(dst * dst, axis=-1, keepdims=True)        # [B, M, 1]
    # full-f32 matmul: distances feed top-k/threshold logic, bf16 passes
    # (the TPU default) lose too much precision there
    cross = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return s2 - 2.0 * cross + jnp.swapaxes(d2, -1, -2)


def pairwise_self_distance(xyz: jax.Array) -> jax.Array:
    """Squared L2 self-distance matrix, [B, N, 3] -> [B, N, N]."""
    return square_distance(xyz, xyz)


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: out[b, ..., c] = points[b, idx[b, ...], c].

    Args:
        points: [B, N, C]
        idx: [B, ...] integer indices into the N axis.
    Returns:
        [B, ..., C]
    """
    return jax.vmap(lambda p, i: p[i])(points, idx)


def knn_points(
    k: int,
    xyz: jax.Array,
    query: jax.Array | None = None,
    exclude_self: bool = False,
    return_dist: bool = False,
    method: str = "sort",
    candidate_mask: jax.Array | None = None,
):
    """k-nearest-neighbour indices of `query` points within `xyz`.

    Distance matrix is one batched matmul. Selection:
      - "sort": exact `lax.top_k` (full sort on TPU — exact but slow for
        large N; ties broken by lower index, matching torch.topk).
      - "approx": `lax.approx_max_k` — TPU-native partial reduction,
        ~10x faster at N=1024 with ~0.95 per-neighbour recall. Use in
        iterative loops where the graph is advisory (repulsion).

    Args:
        k: neighbours per query point.
        xyz: [B, N, 3] reference points.
        query: [B, Q, 3]; defaults to `xyz` itself.
        exclude_self: drop self-matches — used when query is xyz, mirrors
            `ONet/defense/pn_utils.py:64-80`. With "approx", self is
            masked out of the distance matrix instead of top-(k+1) slicing
            (approx selection may not rank the self-hit first).
        return_dist: also return the squared distances to the neighbours.
        candidate_mask: optional [B, N] validity mask — masked points are
            never selected as neighbours (fixed-shape masked forwards).
    Returns:
        idx [B, Q, k] (int32), optionally (idx, sqdist [B, Q, k]).
    """
    if query is None:
        query = xyz
    d = square_distance(query, xyz)                          # [B, Q, N]
    if candidate_mask is not None:
        d = jnp.where(candidate_mask[:, None, :] > 0, d, jnp.inf)
    if method == "approx":
        if exclude_self:
            n = xyz.shape[1]
            d = d + jnp.eye(n, dtype=d.dtype) * 1e10
        # selection-only scores: bf16 halves the [B, Q, N] matrix traffic
        # (returned distances stay f32)
        neg_top_bf, idx = jax.lax.approx_max_k(-d.astype(jnp.bfloat16), k)
        neg_top = neg_top_bf.astype(d.dtype)
        if return_dist:
            return idx.astype(jnp.int32), -neg_top
        return idx.astype(jnp.int32)
    kk = k + 1 if exclude_self else k
    neg_top, idx = jax.lax.top_k(-d, kk)                     # [B, Q, kk]
    if exclude_self:
        idx = idx[..., 1:]
        neg_top = neg_top[..., 1:]
    if return_dist:
        return idx.astype(jnp.int32), -neg_top
    return idx.astype(jnp.int32)


def knn_self(k: int, xyz: jax.Array, return_dist: bool = False,
             method: str = "sort"):
    """kNN within a cloud excluding self (reference `pn_utils.knn_point`)."""
    return knn_points(
        k, xyz, exclude_self=True, return_dist=return_dist, method=method
    )


def _onehot_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """out[b, ..., c] = points[b, idx[b, ...], c] via a one-hot matmul."""
    n = points.shape[1]
    lead = idx.shape[1:]
    onehot = jax.nn.one_hot(
        idx.reshape(idx.shape[0], -1), n, dtype=points.dtype)  # [B, M, N]
    # bf16x3 selection matmul: f32-accurate to ~1e-7 relative here (each
    # output picks exactly one input), ~1.5x faster than HIGHEST
    out = jnp.einsum(
        "bmn,bnc->bmc", onehot, points,
        precision=jax.lax.Precision.HIGH,
    )
    return out.reshape(idx.shape[0], *lead, points.shape[-1])


# gather_neighbors' VJP is ALWAYS a one-hot einsum: XLA scatter-add on
# TPU is serialized and catastrophically slow — measured on v5e at the
# PointNet++ attack shapes (scanned, tunnel-safe sync): 10.6 ms (C=3)
# and 7.6 ms (C=131) for scatter vs 2.2 / 3.4 ms for the one-hot
# contraction, which stays on the MXU.


def gather_neighbors(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbour features: out[b, ..., c] = points[b, idx[b,...], c].

    TPU-fast alternative to `index_points` for grouped gathers (XLA lowers
    small-row gathers to slow row-at-a-time loads; the one-hot matmul
    stays on the MXU — measured 1.8 ms vs 5.1 ms for [40,512,32,3] on
    v5e). The backward pass is ALWAYS a one-hot contraction too: XLA
    scatter-add of narrow rows measured 10.6 ms vs 2.2 ms at C=3.
    Accurate to ~1e-7 relative (bf16x3 selection matmul).

    Args:
        points: [B, N, C]; idx: [B, ...] int indices into the N axis.
    Returns:
        [B, ..., C]
    """
    return _gather_neighbors_vjp(points, idx)


@jax.custom_vjp
def _gather_neighbors_vjp(points, idx):
    return _onehot_gather(points, idx)


def _gather_fwd(points, idx):
    return _onehot_gather(points, idx), (points.shape, idx)


def _gather_bwd(res, ct):
    import numpy as _np

    shape, idx = res
    c = shape[-1]
    n = shape[1]
    onehot = jax.nn.one_hot(
        idx.reshape(idx.shape[0], -1), n, dtype=ct.dtype)
    dp = jnp.einsum(
        "bmn,bmc->bnc", onehot, ct.reshape(ct.shape[0], -1, c),
        precision=jax.lax.Precision.HIGH,
    )
    # indices are discrete: float0 cotangent
    d_idx = _np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return (dp, d_idx)


_gather_neighbors_vjp.defvjp(_gather_fwd, _gather_bwd)


def _fps_body(xyz, i, state):
    dist, farthest, out_idx = state
    out_idx = out_idx.at[i].set(farthest)
    centroid = xyz[farthest]                                 # [3]
    d = jnp.sum((xyz - centroid) ** 2, axis=-1)              # [N]
    dist = jnp.minimum(dist, d)
    farthest = jnp.argmax(dist).astype(jnp.int32)
    return dist, farthest, out_idx


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(
    xyz: jax.Array, npoint: int, start_idx: jax.Array | None = None,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Iterative farthest point sampling.

    Same algorithm as `baselines/model/pointnet2.py:53-74`: keep a running
    min-distance-to-selected-set per point, greedily pick the argmax. On
    TPU the whole sequential loop runs inside one Pallas kernel
    (`pallas_fps.fps_pallas`, state resident in VMEM); elsewhere it is a
    `lax.fori_loop`. Both produce identical indices.

    Args:
        xyz: [B, N, 3]
        npoint: number of points to select (static).
        start_idx: [B] int32 initial point per cloud; defaults to 0
            (the reference uses a random start; pass one for parity).
        mask: optional [B, N] validity mask — masked points are never
            selected (selection repeats valid points if npoint exceeds
            the valid count). Masked runs take the fori_loop path.
    Returns:
        [B, npoint] int32 indices.
    """
    B, N, _ = xyz.shape
    # index selection is discrete — no gradient flows through it (the
    # reference's CUDA FPS is equally non-differentiable; attack/defense
    # gradients flow through the downstream gathers instead). Without
    # this, differentiating a model that calls FPS on TPU hits
    # pallas_call's JVP rule (AssertionError) even though the int32
    # outputs carry no tangent.
    xyz = jax.lax.stop_gradient(xyz)
    if start_idx is None:
        # Mosaic rejects the kernel at small/ragged shapes (observed at
        # B=2, N=128 via DUP-Net: remote compile HTTP 500); gate on
        # VPU-friendly dims and fall back to the lax path elsewhere.
        # IFDEF_DISABLE_PALLAS_FPS=1 forces the lax path everywhere
        # (debugging escape hatch, same spirit as the repulsion
        # kernel's IFDEF_FORCE_FUSED_REPULSION)
        if (jax.default_backend() == "tpu" and mask is None
                and B % 8 == 0 and N % 128 == 0
                and not os.environ.get("IFDEF_DISABLE_PALLAS_FPS")):
            from if_defense_tpu.ops.pallas_fps import fps_pallas

            return fps_pallas(xyz, npoint)
        if mask is None:
            start_idx = jnp.zeros((B,), jnp.int32)
        else:
            # first valid point per cloud
            start_idx = jnp.argmax(mask > 0, axis=1).astype(jnp.int32)

    def single(xyz_b, start_b, valid_b):
        # invalid points start (and stay, through the running min) at
        # -inf so the farthest-argmax never selects them
        dist0 = jnp.where(valid_b > 0, jnp.inf, -jnp.inf
                          ).astype(xyz_b.dtype)
        out0 = jnp.zeros((npoint,), jnp.int32)

        def body(i, state):
            return _fps_body(xyz_b, i, state)

        _, _, out_idx = jax.lax.fori_loop(
            0, npoint, body, (dist0, start_b.astype(jnp.int32), out0)
        )
        return out_idx

    valid = (jnp.ones((B, N)) if mask is None else mask)
    return jax.vmap(single)(xyz, start_idx, valid)


def query_ball_point(
    radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array,
    mask: jax.Array | None = None, method: str = "count",
) -> jax.Array:
    """Radius neighbourhood grouping with fixed group size.

    Mirrors `baselines/model/pointnet2.py:77-98`: take the first `nsample`
    in-radius points (by index order); slots past the in-radius count are
    filled with the group's first in-radius point.

    Selection ("count"): the j-th (0-based) in-radius index of a
    group is the first n whose inclusive hit-count ``rank[n] =
    cumsum(in_radius)[n]`` reaches j+1 — and because rank is
    non-decreasing, that position equals ``sum_n [rank[n] <= j]``. One
    cumsum + one broadcast-compare-reduce (XLA fuses the [B, S, N,
    nsample] indicator into the reduction), instead of sorting the full
    [B, S, N] index tensor ("sort"). Both produce identical indices;
    "count" is the default after the on-chip A/B (v5e, scanned: 3.4 ms
    vs 6.0 ms at [40, 512, 1024] k=32; ~tied at [40, 128, 512] k=64).

    Args:
        radius: ball radius.
        nsample: points per group (static).
        xyz: [B, N, 3] all points.
        new_xyz: [B, S, 3] group centres.
        mask: optional [B, N] validity mask — masked points are treated
            as out-of-radius (never grouped).
        method: "count" (cumsum-rank selection) or "sort" (full sort).
    Returns:
        [B, S, nsample] int32 indices into N.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    # On TPU at kernel-friendly shapes, the fused Pallas kernel computes
    # the distance block and the count selection entirely in VMEM — no
    # [B, S, N] HBM round trip. Identical indices (asserted on-chip and
    # in tests); v5e scanned A/B: 1.33 ms vs 3.12 ms ("count") at
    # [40, 512, 1024] k=32. Mask and odd shapes fall back to XLA.
    if (method == "count" and mask is None
            and jax.default_backend() == "tpu"
            and N % 128 == 0 and S % 8 == 0 and nsample <= 128
            and not os.environ.get("IFDEF_DISABLE_PALLAS_BALLQUERY")):
        from if_defense_tpu.ops.pallas_ballquery import ballquery_pallas

        tile_s = next(t for t in (128, 64, 32, 16, 8) if S % t == 0)
        return ballquery_pallas(radius, nsample, xyz, new_xyz,
                                tile_s=tile_s)
    sqrdists = square_distance(new_xyz, xyz)                 # [B, S, N]
    if mask is not None:
        sqrdists = jnp.where(mask[:, None, :] > 0, sqrdists, jnp.inf)
    if method == "count":
        hit = (sqrdists <= radius**2).astype(jnp.int32)      # [B, S, N]
        rank = jnp.cumsum(hit, axis=-1)                      # [B, S, N]
        slots = jnp.arange(nsample, dtype=jnp.int32)
        # position of the (j+1)-th hit; N when the group has <= j hits
        idx = jnp.sum(
            (rank[..., None] <= slots).astype(jnp.int32), axis=-2
        )                                                    # [B, S, nsample]
    else:
        arange = jnp.arange(N, dtype=jnp.int32)
        # out-of-radius -> sentinel N so that sorting pushes them last
        idx = jnp.where(sqrdists > radius**2, N, arange[None, None, :])
        idx = jnp.sort(idx, axis=-1)[..., :nsample]          # [B, S, nsample]
    first = idx[..., :1]                                     # first (closest-index) hit
    idx = jnp.where(idx == N, first, idx)
    # degenerate case: no point in radius at all -> fall back to index 0
    idx = jnp.where(idx == N, 0, idx)
    return idx.astype(jnp.int32)
