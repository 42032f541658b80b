"""Pallas TPU kernel for farthest point sampling.

FPS is inherently sequential (npoint greedy steps), so the lax.fori_loop
version pays per-iteration XLA dispatch overhead — ~30 ms for
[32, 1024] -> 512 on v5e. This kernel runs the whole loop inside ONE
Pallas program with all state (running min-distances, coordinates) resident
in VMEM; the centroid coordinate fetch is a one-hot masked reduction so
every step is pure VPU work over [B, N] tiles.

Falls back to the lax implementation off-TPU; `interpret=True` is used for
CPU testing. Same greedy semantics (start index 0 per cloud, first-max tie
breaking) as `pointops.farthest_point_sample`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint, x_ref, y_ref, z_ref, out_ref, dist_ref):
    # out_ref is [npoint, B]: the step index lands on the sublane dim,
    # where Mosaic supports dynamic stores (lane indices must be static)
    B, N = x_ref.shape
    dist_ref[:] = jnp.full((B, N), 1e30, jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    def body(i, far):
        out_ref[pl.ds(i, 1), :] = far[None, :]
        onehot = col == far[:, None]                       # [B, N]
        cx = jnp.sum(jnp.where(onehot, x_ref[:], 0.0), 1, keepdims=True)
        cy = jnp.sum(jnp.where(onehot, y_ref[:], 0.0), 1, keepdims=True)
        cz = jnp.sum(jnp.where(onehot, z_ref[:], 0.0), 1, keepdims=True)
        d = (
            (x_ref[:] - cx) ** 2
            + (y_ref[:] - cy) ** 2
            + (z_ref[:] - cz) ** 2
        )
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        return jnp.argmax(dist, axis=1).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, jnp.zeros((B,), jnp.int32))


def _fps_kernel_v2(npoint, p_ref, out_ref, dist_ref):
    """Reduction-count-minimised variant (A/B candidate, see fps_pallas).

    Coordinates arrive packed [3B, N] (x rows 0:B, y rows B:2B, z rows
    2B:3B) so the centroid fetch is ONE masked reduction over [3B, N]
    instead of three over [B, N], and the farthest-point selection is
    max + masked min-index (2 reductions) instead of argmax. Same greedy
    semantics and tie-breaking (first max = lowest index) as v1.
    """
    threeB, N = p_ref.shape
    B = threeB // 3
    dist_ref[:] = jnp.full((B, N), 1e30, jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (threeB, N), 1)

    def body(i, far):
        out_ref[pl.ds(i, 1), :] = far[None, :]
        far3 = jnp.concatenate([far, far, far], 0)          # [3B]
        onehot3 = col3 == far3[:, None]                     # [3B, N]
        c3 = jnp.sum(jnp.where(onehot3, p_ref[:], 0.0), 1, keepdims=True)
        sq = (p_ref[:] - c3) ** 2                           # [3B, N]
        d = sq[0:B] + sq[B : 2 * B] + sq[2 * B : 3 * B]     # [B, N]
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        m = jnp.max(dist, axis=1, keepdims=True)            # [B, 1]
        idx = jnp.min(jnp.where(dist == m, col, N), axis=1)
        return idx.astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, jnp.zeros((B,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret", "variant"))
def fps_pallas(
    xyz: jax.Array, npoint: int, interpret: bool = False, variant: int = 1
) -> jax.Array:
    """Farthest point sampling, [B, N, 3] -> [B, npoint] int32 indices.

    variant=1 is the production kernel; variant=2 is the packed-coords /
    fewer-reductions candidate (index-identical, kept until A/B'd on-chip
    by tools/profile_attack.py --fps_ab).
    """
    B, N, _ = xyz.shape
    if variant == 2:
        packed = jnp.concatenate(
            [xyz[..., 0], xyz[..., 1], xyz[..., 2]], axis=0)   # [3B, N]
        out = pl.pallas_call(
            functools.partial(_fps_kernel_v2, npoint),
            out_shape=jax.ShapeDtypeStruct((npoint, B), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
            interpret=interpret,
        )(packed)
        return out.T
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint),
        out_shape=jax.ShapeDtypeStruct((npoint, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out.T
