"""Pallas TPU kernel: fused ball-query grouping (distance + selection).

`pointops.query_ball_point`'s XLA "count" path streams a [B, S, N] squared
-distance tensor to HBM and reduces a fused [B, S, N, nsample] indicator —
measured 0.73 ms (sqdist) + 3.4 ms (selection) per call at the PointNet++
L1 attack shapes ([40, 512, 1024] k=32, v5e). This kernel fuses both: per
(batch, centre-tile) grid step it computes the distance row block with one
MXU dot, ranks in-radius hits with a lane cumsum, and emits the first-k
-hit indices straight from VMEM — no [B, S, N] HBM round trip.

Selection semantics are identical to the reference
(`baselines/model/pointnet2.py:77-98`) and to both XLA paths: the j-th
slot holds the index of the (j+1)-th in-radius point in index order;
slots past the hit count repeat the first hit; centres with no hit at all
fall back to index 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ballquery_kernel(radius_sq, nsample, x_ref, q_ref, out_ref):
    # x_ref: [3, N] all points (channels on sublanes); q_ref: [TS, 3]
    # centres; out_ref: [TS, nsample] int32 indices.
    _, n = x_ref.shape
    x = x_ref[:]                                             # [3, N]
    q = q_ref[:]                                             # [TS, 3]
    x2 = jnp.sum(x * x, axis=0, keepdims=True)               # [1, N]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)               # [TS, 1]
    # HIGHEST: full-f32 distance like pointops.square_distance — bf16
    # passes move points across the radius threshold
    cross = jax.lax.dot_general(
        q, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                        # [TS, N]
    dist = q2 - 2.0 * cross + x2
    hit = (dist <= radius_sq).astype(jnp.float32)            # [TS, N]
    # inclusive prefix-sum along N as an MXU matmul (Mosaic has no cumsum
    # primitive): rank[n] = sum_m hit[m] * [m <= n]. Exact — products are
    # 0/1 and the f32 accumulation of <= N ones is integer-exact.
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    incl = (row <= col).astype(jnp.float32)                  # [N, N]
    rank = jax.lax.dot_general(
        hit, incl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [TS, N]
    # slot j = index of the (j+1)-th hit = #{n : rank[n] <= j}
    cols = [
        jnp.sum((rank <= j).astype(jnp.int32), axis=1, keepdims=True)
        for j in range(nsample)
    ]
    idx = jnp.concatenate(cols, axis=1)                      # [TS, nsample]
    first = idx[:, 0:1]
    idx = jnp.where(idx == n, first, idx)
    idx = jnp.where(idx == n, 0, idx)
    out_ref[:] = idx


@functools.partial(
    jax.jit,
    static_argnames=("radius", "nsample", "tile_s", "interpret"),
)
def ballquery_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    tile_s: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused ball query: ([B, N, 3], [B, S, 3]) -> [B, S, nsample] int32.

    Requires S % tile_s == 0 (the caller gates on shape friendliness and
    falls back to the XLA path otherwise).
    """
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    # index selection is discrete — no gradient flows through it, and
    # pallas_call has no JVP rule (same reasoning as pointops.
    # farthest_point_sample: the reference's CUDA ball query is equally
    # non-differentiable; gradients flow through the downstream gathers)
    xyz = jax.lax.stop_gradient(xyz)
    new_xyz = jax.lax.stop_gradient(new_xyz)
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)         # [B, 3, N]
    qt = new_xyz.astype(jnp.float32)
    grid = (b, s // tile_s)
    return pl.pallas_call(
        functools.partial(_ballquery_kernel, float(radius) ** 2, nsample),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 3, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, tile_s, 3), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, tile_s, nsample), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, nsample), jnp.int32),
        interpret=interpret,
    )(xt, qt)
