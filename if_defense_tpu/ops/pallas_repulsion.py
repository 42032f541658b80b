"""Fused kNN-repulsion loss as a Pallas TPU kernel.

The XLA path (`defense/repulsion.py`) does approx_max_k selection over the
[B, N, N] distance matrix, a one-hot gather of neighbour coordinates, then
the loss — ~3 ms/iter at the defense shapes, dominated by the selection.
This kernel fuses everything into distance TILES that never leave VMEM:

  forward:  per (batch, row-tile) compute the [NT, N] squared-distance
            tile by direct coordinate differences (exact f32 — the matmul
            expansion would catastrophically cancel in Mosaic's
            single-pass-bf16 dots), find each row's k-th smallest value by
            an unrolled masked-min scan (multiplicity-aware), and reduce
            the weighted loss terms.
  backward: recompute the tile, form the per-pair gradient coefficient
            G[i, j] analytically, and contract G against the points with
            two MXU matmuls — grad_p = 2 (rowsum(G) ⊙ p − G p) for the
            row side plus the transposed column side, accumulated across
            row tiles.

Neighbour-set semantics vs the reference (`repulsion_loss.py:7-74`): the
k nearest by value with the graph under stop_gradient. Ties AT the k-th
distance are weighted fractionally instead of broken by index — a
measure-zero event for continuous coords; for exact duplicates (common
after resampling) the tied loss terms are equal anyway, and zero-distance
pairs get zero gradient through the eps floor exactly like the reference's
`max(d², eps)`. The default XLA path's approx_max_k (recall ~0.95) is a
looser approximation than either.

Selected for bfloat16/compute runs on TPU (`repulsion_loss_auto`); the
f32 reference path keeps the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30


def _tile_rows(n: int) -> int:
    """Rows per tile: as large as VMEM allows (measured on v5e — fewer
    tile programs beats smaller tiles: 165/176/182 clouds/s in situ at
    NT 256/512/1024 for N=1024; the [NT, N] f32 distance tile and its
    ~3 live copies must stay within the ~16 MB VMEM budget)."""
    for nt in (1024, 512, 256):
        if n % nt == 0 and nt * n * 4 * 3 <= 12 * 2**20:
            return nt
    return 256


def _dist2_tile(p_ref, pt_ref, t, nt):
    """Exact-f32 [nt, N] squared-distance tile, self-distances -> +inf."""
    N = pt_ref.shape[-1]
    rows = p_ref[0, pl.ds(t * nt, nt), :].astype(jnp.float32)  # [nt, 3]
    d2 = jnp.zeros((nt, N), jnp.float32)
    for a in range(3):
        ra = rows[:, a : a + 1]                                # [nt, 1]
        ca = pt_ref[0, a : a + 1, :].astype(jnp.float32)       # [1, N]
        diff = ra - ca
        d2 = d2 + diff * diff
    i = t * nt + jax.lax.broadcasted_iota(jnp.int32, (nt, N), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (nt, N), 1)
    return jnp.where(i == j, _INF, d2)


def _select_weights(d2, k: int):
    """[NT, N] neighbour weights: 1 below the k-th smallest, fractional at
    ties, 0 above — multiplicity-aware threshold scan."""
    t0 = jnp.min(d2, axis=1, keepdims=True)                    # [NT, 1]
    c = jnp.sum((d2 <= t0).astype(jnp.int32), axis=1, keepdims=True)
    for _ in range(k - 1):
        need = c < k
        m = jnp.min(jnp.where(d2 > t0, d2, _INF), axis=1, keepdims=True)
        t0 = jnp.where(need, m, t0)
        c = jnp.where(
            need,
            jnp.sum((d2 <= t0).astype(jnp.int32), axis=1, keepdims=True),
            c,
        )
    n_lt = jnp.sum((d2 < t0).astype(jnp.float32), axis=1, keepdims=True)
    n_eq = jnp.sum((d2 == t0).astype(jnp.float32), axis=1, keepdims=True)
    frac = (k - n_lt) / jnp.maximum(n_eq, 1.0)
    return (d2 < t0).astype(jnp.float32) + (d2 == t0) * frac


def _fwd_kernel(p_ref, pt_ref, out_ref, *, k, radius, h, eps, nt):
    t = pl.program_id(1)
    d2 = _dist2_tile(p_ref, pt_ref, t, nt)
    w = _select_weights(d2, k)
    d = jnp.sqrt(jnp.maximum(d2, eps))
    term = (radius - d) * jnp.exp(-((d / h) ** 2))
    out_ref[0, 0, 0, 0] = jnp.sum(w * term)


def _bwd_kernel(p_ref, pt_ref, g_ref, grad_ref, *, k, radius, h, eps,
                nt):
    t = pl.program_id(1)
    N = pt_ref.shape[-1]
    d2 = _dist2_tile(p_ref, pt_ref, t, nt)
    w = _select_weights(d2, k)
    d = jnp.sqrt(jnp.maximum(d2, eps))
    e = jnp.exp(-((d / h) ** 2))
    # dterm/dd chained through d = sqrt(max(d2, eps)); zero inside the
    # eps floor, like the reference's max()
    dterm_dd = -e + (radius - d) * e * (-2.0 * d / (h * h))
    gscale = g_ref[0, 0, 0] / (N * k)
    G = jnp.where(d2 > eps, w * dterm_dd * (0.5 / d) * gscale, 0.0)

    p = p_ref[0].astype(jnp.float32)                           # [N, 3]
    rows = p_ref[0, pl.ds(t * nt, nt), :].astype(jnp.float32)  # [nt, 3]

    # row side: points i in this tile
    srow = jnp.sum(G, axis=1, keepdims=True)                   # [NT, 1]
    gp = jax.lax.dot_general(
        G, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [NT, 3]
    grad_rows = 2.0 * (srow * rows - gp)

    # column side: every point j, accumulated across row tiles
    scol = jnp.sum(G, axis=0)[:, None]                         # [N, 1]
    gtp = jax.lax.dot_general(
        G, rows, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [N, 3]
    grad_cols = 2.0 * (scol * p - gtp)

    @pl.when(t == 0)
    def _():
        grad_ref[0] = jnp.zeros_like(grad_ref[0])

    grad_ref[0] = grad_ref[0] + grad_cols.astype(grad_ref.dtype)
    grad_ref[0, pl.ds(t * nt, nt), :] = (
        grad_ref[0, pl.ds(t * nt, nt), :]
        + grad_rows.astype(grad_ref.dtype)
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(p, pt, *, k, radius, h, eps):
    B, N, _ = p.shape
    nt = _tile_rows(N)
    T = N // nt
    partial = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, radius=radius, h=h, eps=eps,
                          nt=nt),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # scalar outputs: TPU block rules need the last two block dims
        # equal to the array dims, so the per-tile partial is (1, 1)-shaped
        out_specs=pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, 1, 1), jnp.float32),
        interpret=_interpret(),
    )(p, pt)
    return jnp.sum(partial[:, :, 0, 0], axis=1) / (N * k)


def _bwd_call(p, pt, g, *, k, radius, h, eps):
    B, N, _ = p.shape
    nt = _tile_rows(N)
    T = N // nt
    return pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, radius=radius, h=h, eps=eps,
                          nt=nt),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 3), p.dtype),
        interpret=_interpret(),
    )(p, pt, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_repulsion_loss(
    pc: jax.Array,
    nn_size: int = 5,
    radius: float = 0.07,
    h: float = 0.03,
    eps: float = 1e-12,
) -> jax.Array:
    """Per-example repulsion loss, [B, N, 3] -> [B], fully fused.

    Same loss as `defense.repulsion.repulsion_loss` (graph under
    stop_gradient, k nearest by distance) with the tie semantics noted in
    the module docstring.
    """
    pt = jnp.swapaxes(pc, 1, 2)
    return _fwd_call(pc, pt, k=nn_size, radius=radius, h=h, eps=eps)


def _frl_fwd(pc, nn_size, radius, h, eps):
    pt = jnp.swapaxes(pc, 1, 2)
    loss = _fwd_call(pc, pt, k=nn_size, radius=radius, h=h, eps=eps)
    return loss, (pc, pt)


def _frl_bwd(nn_size, radius, h, eps, res, g):
    pc, pt = res
    grad = _bwd_call(
        pc, pt, g.astype(jnp.float32)[:, None, None],
        k=nn_size, radius=radius, h=h, eps=eps,
    )
    return (grad,)


fused_repulsion_loss.defvjp(_frl_fwd, _frl_bwd)


def fused_repulsion_supported(n: int) -> bool:
    """Static gate: row tiles must divide N and the [nt, N] tiles fit."""
    return n % _tile_rows(n) == 0 and n <= 4096


# ---------------------------------------------------------------------------
# Cached-graph variant: the kNN SELECTION scan is ~half the kernel's VPU
# passes, and the graph barely moves between iterations (points drift
# ~lr=1e-3/step). `fused_repulsion_mask` runs the selection once per
# refresh window and stores the neighbour set as an int8 [B, N, N] mask;
# `fused_repulsion_loss_masked` then computes loss/grad per iteration
# with the distance tile but NO selection. Tie semantics: ALL points
# tied at the k-th distance are included with weight 1 (the fractional
# tie weighting only differs for exact duplicates, whose zero-distance
# terms are constants with zero gradient through the eps floor — so
# gradients match the fractional scheme exactly there, and near-ties are
# measure-zero).
# ---------------------------------------------------------------------------


def _mask_tile_rows(n: int) -> int:
    """Like `_tile_rows` but budgets one extra live [nt, N] copy for the
    mask (int8 in VMEM plus its f32 conversion)."""
    for nt in (1024, 512, 256):
        if n % nt == 0 and nt * n * 4 * 4 <= 12 * 2**20:
            return nt
    return 256


def _mask_kernel(p_ref, pt_ref, mask_ref, *, k, nt):
    t = pl.program_id(1)
    d2 = _dist2_tile(p_ref, pt_ref, t, nt)
    w = _select_weights(d2, k)
    mask_ref[0] = (w > 0.0).astype(jnp.int8)


def fused_repulsion_mask(pc: jax.Array, nn_size: int = 5) -> jax.Array:
    """Neighbour mask int8 [B, N, N]: 1 where j is within the k-th
    nearest distance of i (ties included), 0 elsewhere; diag 0."""
    B, N, _ = pc.shape
    pt = jnp.swapaxes(pc, 1, 2)
    nt = _mask_tile_rows(N)
    T = N // nt
    return pl.pallas_call(
        functools.partial(_mask_kernel, k=nn_size, nt=nt),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nt, N), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.int8),
        interpret=_interpret(),
    )(pc, pt)


def _masked_fwd_kernel(p_ref, pt_ref, m_ref, out_ref, *, radius, h, eps,
                       nt):
    t = pl.program_id(1)
    d2 = _dist2_tile(p_ref, pt_ref, t, nt)
    w = m_ref[0].astype(jnp.float32)
    d = jnp.sqrt(jnp.maximum(d2, eps))
    term = (radius - d) * jnp.exp(-((d / h) ** 2))
    out_ref[0, 0, 0, 0] = jnp.sum(w * term)


def _masked_bwd_kernel(p_ref, pt_ref, m_ref, g_ref, grad_ref, *, k,
                       radius, h, eps, nt):
    t = pl.program_id(1)
    N = pt_ref.shape[-1]
    d2 = _dist2_tile(p_ref, pt_ref, t, nt)
    w = m_ref[0].astype(jnp.float32)
    d = jnp.sqrt(jnp.maximum(d2, eps))
    e = jnp.exp(-((d / h) ** 2))
    dterm_dd = -e + (radius - d) * e * (-2.0 * d / (h * h))
    gscale = g_ref[0, 0, 0] / (N * k)
    G = jnp.where(d2 > eps, w * dterm_dd * (0.5 / d) * gscale, 0.0)

    p = p_ref[0].astype(jnp.float32)
    rows = p_ref[0, pl.ds(t * nt, nt), :].astype(jnp.float32)

    srow = jnp.sum(G, axis=1, keepdims=True)
    gp = jax.lax.dot_general(
        G, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    grad_rows = 2.0 * (srow * rows - gp)

    scol = jnp.sum(G, axis=0)[:, None]
    gtp = jax.lax.dot_general(
        G, rows, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    grad_cols = 2.0 * (scol * p - gtp)

    @pl.when(t == 0)
    def _():
        grad_ref[0] = jnp.zeros_like(grad_ref[0])

    grad_ref[0] = grad_ref[0] + grad_cols.astype(grad_ref.dtype)
    grad_ref[0, pl.ds(t * nt, nt), :] = (
        grad_ref[0, pl.ds(t * nt, nt), :]
        + grad_rows.astype(grad_ref.dtype)
    )


def _masked_fwd_call(p, pt, mask, *, k, radius, h, eps):
    B, N, _ = p.shape
    nt = _mask_tile_rows(N)
    T = N // nt
    partial = pl.pallas_call(
        functools.partial(_masked_fwd_kernel, radius=radius, h=h,
                          eps=eps, nt=nt),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, N), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, 1, 1), jnp.float32),
        interpret=_interpret(),
    )(p, pt, mask)
    return jnp.sum(partial[:, :, 0, 0], axis=1) / (N * k)


def _masked_bwd_call(p, pt, mask, g, *, k, radius, h, eps):
    B, N, _ = p.shape
    nt = _mask_tile_rows(N)
    T = N // nt
    return pl.pallas_call(
        functools.partial(_masked_bwd_kernel, k=k, radius=radius, h=h,
                          eps=eps, nt=nt),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, N), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, N), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, N, 3), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 3), p.dtype),
        interpret=_interpret(),
    )(p, pt, mask, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_repulsion_loss_masked(
    pc: jax.Array,
    mask: jax.Array,
    nn_size: int = 5,
    radius: float = 0.07,
    h: float = 0.03,
    eps: float = 1e-12,
) -> jax.Array:
    """Per-example repulsion loss against a CACHED neighbour mask,
    [B, N, 3] x int8 [B, N, N] -> [B]. No selection work per call; the
    mask comes from `fused_repulsion_mask` at the refresh cadence.
    Gradients flow to `pc` only (the mask is data)."""
    pt = jnp.swapaxes(pc, 1, 2)
    return _masked_fwd_call(pc, pt, mask, k=nn_size, radius=radius, h=h,
                            eps=eps)


def _frlm_fwd(pc, mask, nn_size, radius, h, eps):
    pt = jnp.swapaxes(pc, 1, 2)
    loss = _masked_fwd_call(pc, pt, mask, k=nn_size, radius=radius, h=h,
                            eps=eps)
    return loss, (pc, pt, mask)


def _frlm_bwd(nn_size, radius, h, eps, res, g):
    pc, pt, mask = res
    grad = _masked_bwd_call(
        pc, pt, mask, g.astype(jnp.float32)[:, None, None],
        k=nn_size, radius=radius, h=h, eps=eps,
    )
    return (grad, None)


fused_repulsion_loss_masked.defvjp(_frlm_fwd, _frlm_bwd)
