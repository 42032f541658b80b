"""Fused bilinear plane sampling as a Pallas TPU kernel.

The XLA formulation of grid_sample (`ops/interp.py`) materialises a
[B, Q, W, C] intermediate in HBM for every plane and every pass: at the
defense shapes (B=48, Q=1024, W=64, C=32) that is ~200 MB per plane per
pass — the measured bandwidth bottleneck of the ConvONet-Opt loop.

This kernel keeps the intermediate entirely in VMEM. Per (batch, query
tile) the forward is three MXU matmuls and one VPU multiply:

    M1   = rowsel_tile [QT, H] @ plane [H, W*C]          (the row lerp)
    M2   = colsel_tile [QT, W] @ E [W, W*C]              (column broadcast)
    out  = (M1 * M2) [QT, W*C] @ S [W*C, C]              (the column lerp)

with E[w, wc] = 1{wc // C == w} and S[wc, c] = 1{wc % C == c} passed in as
precomputed constants (building them in-kernel lowers to signed int
div/rem VPU code on every grid step — measured dominant). The flat W*C
layout keeps the lane dimension full; reshapes that split lanes are not
legal in Mosaic. The backward pass (custom VJP) recomputes M1/M2 and emits
grad_rowsel / grad_colsel / grad_plane with four more MXU matmuls over the
same VMEM tiles.

Numerics: MXU accumulation is f32 (Mosaic mandates 32-bit accumulators);
intermediates are cast back to the input dtype between ops. In-kernel
matmuls on f32 inputs run single-pass bf16, so this path is only selected
for bfloat16 planes (`compute_dtype="bfloat16"` mode, measured
accuracy-neutral); the f32 reference path keeps the XLA einsums.

Gradients flow to the query coordinates through the selector construction
(outside the kernel, plain XLA autodiff) and to the plane features via
grad_plane — the kernel is usable both in the frozen-decoder defense loop
and in implicit-network training.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 256  # query-tile rows per grid step

# VMEM budget check: plane [H, W*C] + f32 [QT, W*C] temporaries
_MAX_WC = 4096
_MAX_H = 256


def _expand_mats(W: int, C: int, dtype):
    """(E [W, W*C], S [W*C, C]) selection constants (host-side numpy)."""
    import numpy as np

    wc = np.arange(W * C)
    E = (wc[None, :] // C == np.arange(W)[:, None]).astype(dtype)
    S = (wc[:, None] % C == np.arange(C)[None, :]).astype(dtype)
    return jnp.asarray(E), jnp.asarray(S)


def _fwd_kernel(rowsel_ref, colsel_ref, plane_ref, e_ref, s_ref, out_ref):
    rs = rowsel_ref[0]                      # [QT, H]
    cs = colsel_ref[0]                      # [QT, W]
    pw = plane_ref[0]                       # [H, W*C]
    cd = cs.dtype
    m1 = jnp.dot(rs, pw, preferred_element_type=jnp.float32).astype(cd)
    m2 = jnp.dot(cs, e_ref[...], preferred_element_type=jnp.float32
                 ).astype(cd)
    out = jnp.dot(m1 * m2, s_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(rowsel_ref, colsel_ref, plane_ref, e_ref, s_ref, g_ref,
                drow_ref, dcol_ref, dplane_ref):
    q = pl.program_id(1)
    rs = rowsel_ref[0]                      # [QT, H]
    cs = colsel_ref[0]                      # [QT, W]
    pw = plane_ref[0]                       # [H, WC]
    g = g_ref[0]                            # [QT, C]
    cd = cs.dtype
    E = e_ref[...]
    S = s_ref[...]

    # gexp[q, wc] = g[q, wc % C]
    gexp = jnp.dot(g, S.T, preferred_element_type=jnp.float32).astype(cd)
    m1 = jnp.dot(rs, pw, preferred_element_type=jnp.float32).astype(cd)
    m2 = jnp.dot(cs, E, preferred_element_type=jnp.float32).astype(cd)

    t2 = m1 * gexp                          # d(out)/d(colsel) pre-reduce
    dcol_ref[0] = jnp.dot(
        t2, E.T, preferred_element_type=jnp.float32
    ).astype(dcol_ref.dtype)

    t1 = m2 * gexp                          # colsel * g, expanded
    drow_ref[0] = jax.lax.dot_general(
        t1, pw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(drow_ref.dtype)                # [QT, H]

    dp = jax.lax.dot_general(
        rs, t1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                       # [H, WC]

    @pl.when(q == 0)
    def _():
        dplane_ref[0] = dp.astype(dplane_ref.dtype)

    @pl.when(q > 0)
    def _():
        dplane_ref[0] = dplane_ref[0] + dp.astype(dplane_ref.dtype)


def _interpret() -> bool:
    # CPU tests exercise the same kernel through the Pallas interpreter
    return jax.default_backend() != "tpu"


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, q: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _fwd_call(rowsel, colsel, planew):
    B, Qp, H = rowsel.shape
    W = colsel.shape[-1]
    WC = planew.shape[-1]
    C = WC // W
    E, S = _expand_mats(W, C, rowsel.dtype)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, Qp // QT),
        in_specs=[
            pl.BlockSpec((1, QT, H), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, W), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WC), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec((W, WC)),
            _const_spec((WC, C)),
        ],
        out_specs=pl.BlockSpec((1, QT, C), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qp, C), rowsel.dtype),
        interpret=_interpret(),
    )(rowsel, colsel, planew, E, S)


def _bwd_call(rowsel, colsel, planew, g):
    B, Qp, H = rowsel.shape
    W = colsel.shape[-1]
    WC = planew.shape[-1]
    C = WC // W
    E, S = _expand_mats(W, C, rowsel.dtype)
    # grad_plane accumulates across query tiles (q is the fastest grid
    # dim, so the output block is revisited consecutively)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(B, Qp // QT),
        in_specs=[
            pl.BlockSpec((1, QT, H), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, W), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WC), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec((W, WC)),
            _const_spec((WC, C)),
            pl.BlockSpec((1, QT, C), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, QT, H), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QT, W), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WC), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Qp, H), rowsel.dtype),
            jax.ShapeDtypeStruct((B, Qp, W), colsel.dtype),
            jax.ShapeDtypeStruct((B, H, WC), planew.dtype),
        ],
        interpret=_interpret(),
    )(rowsel, colsel, planew, E, S, g)


@jax.custom_vjp
def _fused_sample(rowsel, colsel, planew):
    return _fwd_call(rowsel, colsel, planew)


def _fused_sample_fwd(rowsel, colsel, planew):
    return _fwd_call(rowsel, colsel, planew), (rowsel, colsel, planew)


def _fused_sample_bwd(res, g):
    rowsel, colsel, planew = res
    return _bwd_call(rowsel, colsel, planew, g.astype(rowsel.dtype))


_fused_sample.defvjp(_fused_sample_fwd, _fused_sample_bwd)


def _selectors(plane, uv):
    """Weighted two-hot row/col selectors (as `bilinear_plane_sample`)."""
    B, H, W, C = plane.shape
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (W - 1)
    y = jnp.clip(uv[..., 1], 0.0, 1.0) * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, H - 1).astype(jnp.int32)
    rowsel = (
        jax.nn.one_hot(y0i, H, dtype=plane.dtype) * (1 - wy)
        + jax.nn.one_hot(y1i, H, dtype=plane.dtype) * wy
    )
    colsel = (
        jax.nn.one_hot(x0i, W, dtype=plane.dtype) * (1 - wx)
        + jax.nn.one_hot(x1i, W, dtype=plane.dtype) * wx
    )
    return rowsel, colsel


def fused_bilinear_plane_sample(plane: jax.Array, uv: jax.Array) -> jax.Array:
    """Drop-in replacement for `bilinear_plane_sample` via the Pallas kernel.

    Args:
        plane: [B, H, W, C] feature planes (bfloat16 recommended — see
            module docstring for the precision contract).
        uv: [B, Q, 2] coordinates in [0, 1], grid_sample (x, y) order.
    Returns:
        [B, Q, C]
    """
    B, H, W, C = plane.shape
    Q = uv.shape[1]
    rowsel, colsel = _selectors(plane, uv)
    pad = (-Q) % QT
    if pad:
        rowsel = jnp.pad(rowsel, ((0, 0), (0, pad), (0, 0)))
        colsel = jnp.pad(colsel, ((0, 0), (0, pad), (0, 0)))
    out = _fused_sample(rowsel, colsel, plane.reshape(B, H, W * C))
    return out[:, :Q]


def fused_sample_supported(plane_shape) -> bool:
    """Static shape/VMEM gate for the fused kernel."""
    if os.environ.get("IFDEF_DISABLE_PALLAS_INTERP"):
        return False
    _, H, W, C = plane_shape
    return H <= _MAX_H and W * C <= _MAX_WC
