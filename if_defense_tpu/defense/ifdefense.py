"""IF-Defense optimisation-based restoration (ONet-Opt / ConvONet-Opt).

Algorithm parity with `ConvONet/opt_defense.py` / `ONet/opt_defense.py`
(near-identical twins — implemented once here):
  1. optional SOR (k=2, alpha=1.1) -> validity mask
  2. per-cloud centre + scale into the padded unit cube (padding_scale 0.9)
  3. encode a fixed-size subset (600 ConvONet / 300 ONet points) once -> c
  4. init 1024 optimisation points = resample of the (masked) input +
     N(0, 0.01) noise, clamped to +-0.45
  5. 201 Adam(lr 1e-3) steps minimising
        K * mean BCE(decode(points, c), threshold=0.2)
      + 500 * mean repulsion(points)
  6. renormalise to the unit sphere

TPU-first: steps 2-6 are ONE jitted function per batch — the 201-step loop
is a `lax.scan` whose body fuses decoder forward+backward, the kNN
repulsion (a [1024 x 1024] MXU matmul + top-k), and the Adam update. The
encoder runs once per batch inside the same jit. Nothing touches the host
between input and defended output; the reference's per-cloud numpy
preprocessing loop (`opt_defense.py:277-281`) becomes batched masked
normalisation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from if_defense_tpu.defense.repulsion import (
    repulsion_knn,
    repulsion_loss_auto,
    repulsion_loss_masked_auto,
    repulsion_loss_with_idx,
    repulsion_mask_auto,
)
from if_defense_tpu.defense.sor import sor_defense
from if_defense_tpu.ops import normalize_unit_cube, normalize_unit_sphere


def sample_valid(
    pc: jax.Array, mask: jax.Array, n: int, key: jax.Array
) -> jax.Array:
    """Randomly sample `n` valid points per cloud (duplicating if short).

    Matches `preprocess_pc`'s no-replacement subsample (:134-141) when
    enough valid points exist, and `init_points`' duplication (:149-179)
    otherwise.
    """
    B, K, _ = pc.shape

    def one(p, m, k):
        u = jax.random.uniform(k, (K,))
        order = jnp.argsort((1.0 - m) * 2.0 + u)      # valid first, shuffled
        cnt = jnp.maximum(jnp.sum(m).astype(jnp.int32), 1)
        j = jnp.arange(n, dtype=jnp.int32)
        return p[order[jnp.mod(j, cnt)]]

    return jax.vmap(one)(pc, mask, jax.random.split(key, B))


def occupancy_bce(logits: jax.Array, threshold: float) -> jax.Array:
    """BCE-with-logits against the soft occupancy target, mean over all."""
    target = jnp.full_like(logits, threshold)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, target))


def make_opt_defense(
    decode_fn: Callable[[jax.Array, Any], jax.Array],
    encode_fn: Callable[[jax.Array], Any],
    *,
    input_npoint: int = 600,
    sample_npoint: int = 1024,
    padding_scale: float = 0.9,
    init_sigma: float = 0.01,
    iterations: int = 200,
    lr: float = 1e-3,
    rep_weight: float = 500.0,
    threshold: float = 0.2,
    sor: bool = True,
    sor_k: int = 2,
    sor_alpha: float = 1.1,
    exact_knn: bool = False,
    knn_refresh: int = 1,
    compute_dtype: str | None = None,
    interp_refresh: int = 1,
    corner_cache_fn: Callable | None = None,
    decode_cached_fn: Callable | None = None,
    rep_graph_cache: bool = False,
):
    """Build the jitted defense: (variables, pc [B, K, 3], key) ->
    [B, sample_npoint, 3].

    `encode_fn(variables, pc)` / `decode_fn(variables, p, c)` apply the
    frozen implicit model (ONet: c is a [B, 512] code; ConvONet: a dict of
    feature planes). The params travel as jit ARGUMENTS — closing over them
    would bake every weight into the lowered module as an MLIR constant
    (slow host fetches at trace time, bloated HLO).

    `knn_refresh`: rebuild the repulsion neighbour graph every R
    iterations (reference semantics = 1, the default; points move
    ~lr=1e-3 per step so modest R barely changes the graph and
    amortises the kNN selection cost).

    `compute_dtype="bfloat16"` runs the decoder/repulsion forward+backward
    in bf16 (params, latents and points cast inside the loss; the master
    points, Adam state and losses stay f32). Reference semantics = None
    (full f32).

    `interp_refresh=R > 1` (with `corner_cache_fn(variables, p, c)` and
    `decode_cached_fn(variables, p, c, cache)` provided) amortises the
    decoder's bilinear plane sampling: the 4 corner features per query are
    gathered once per R steps and re-lerped at the moving coordinates —
    the dominant [B, Q, W, C] selection einsums shrink from every step to
    every R-th. Points move ~lr (1e-3) per step against a ~1.6e-2 plane
    cell, so crossings inside a refresh window are rare and the lerp's
    linear extrapolation across a crossed cell edge is first-order
    accurate; validated accuracy-neutral on the synthetic end-to-end
    benchmark. Reference semantics = 1.

    `rep_graph_cache=True` (requires `interp_refresh > 1`) refreshes the
    repulsion NEIGHBOUR GRAPH on the corner-cache cadence instead of
    every step: the window start builds an int8 neighbour mask from the
    current f32 points (exact k-NN selection, ties included), and the
    per-iteration repulsion computes distances + loss against that
    frozen graph — skipping the k-selection scan that is ~half the
    fused kernel's VPU work. Points drift ~lr=1e-3/step against
    ~1.5e-2 neighbour spacing, so a window's graph is near-stationary;
    like interp_refresh this is an accuracy-validated deviation from
    the reference's per-step graph (semantics = False).
    """
    if rep_graph_cache and interp_refresh <= 1:
        raise ValueError(
            "rep_graph_cache refreshes the neighbour graph on the "
            "corner-cache cadence; it requires interp_refresh > 1")
    opt = optax.adam(lr)

    @jax.jit
    def defend(variables, pc: jax.Array, key: jax.Array) -> jax.Array:
        B, K, _ = pc.shape
        if sor:
            pc, mask = sor_defense(pc, sor_k, sor_alpha)
        else:
            mask = jnp.ones(pc.shape[:2], pc.dtype)

        proc = normalize_unit_cube(pc, padding_scale, mask)
        k_enc, k_init, k_noise = jax.random.split(key, 3)

        sel = sample_valid(proc, mask, input_npoint, k_enc)
        c = encode_fn(variables, sel)

        if compute_dtype is not None:
            cd = jnp.dtype(compute_dtype)
            loop_variables = jax.tree_util.tree_map(
                lambda x: x.astype(cd) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x, variables)
            c = jax.tree_util.tree_map(
                lambda x: x.astype(cd) if jnp.issubdtype(
                    x.dtype, jnp.floating) else x, c)
        else:
            cd = None
            loop_variables = variables

        pts = sample_valid(proc, mask, sample_npoint, k_init)
        noise = jax.random.normal(k_noise, pts.shape) * init_sigma
        pts = jnp.clip(
            pts + noise, -0.5 * padding_scale, 0.5 * padding_scale
        )

        # graph-refresh-every-step + approx selection is the shape the
        # fused Pallas repulsion covers exactly (and with EXACT k-NN);
        # exact_knn / knn_refresh>1 keep the index-carrying XLA path
        use_fused = knn_refresh == 1 and not exact_knn

        def loss_fn(p, idx):
            if cd is not None:
                p = p.astype(cd)
            occ = decode_fn(loop_variables, p, c)     # [B, sample_npoint]
            occ_loss = occupancy_bce(
                occ.astype(jnp.float32), threshold) * sample_npoint
            if use_fused:
                rep_each = repulsion_loss_auto(p)
            else:
                rep_each = repulsion_loss_with_idx(p, idx)
            rep = jnp.mean(rep_each.astype(jnp.float32)) * rep_weight
            return occ_loss + rep

        grad_fn = jax.grad(loss_fn)

        def step(carry, i):
            p, opt_state, idx = carry
            if use_fused:
                pass                       # selection fused into the loss
            elif knn_refresh == 1:
                idx = repulsion_knn(p, exact=exact_knn)
            else:
                idx = jax.lax.cond(
                    i % knn_refresh == 0,
                    lambda q, _: repulsion_knn(q, exact=exact_knn),
                    lambda _, old: old,
                    p, idx,
                )
            grads = grad_fn(p, idx)
            updates, opt_state = opt.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, opt_state, idx), None

        use_cache = (
            interp_refresh > 1
            and corner_cache_fn is not None
            and decode_cached_fn is not None
        )
        if use_cache:
            # the repulsion term honours the SAME exact_knn / knn_refresh
            # semantics as the uncached path unless rep_graph_cache
            # freezes the graph per window (the corner cache itself only
            # amortises the decoder's plane sampling)
            def loss_fn_cached(p, cache, mask, idx):
                if cd is not None:
                    p = p.astype(cd)
                occ = decode_cached_fn(loop_variables, p, c, cache)
                occ_loss = occupancy_bce(
                    occ.astype(jnp.float32), threshold) * sample_npoint
                if mask is not None:
                    rep_each = repulsion_loss_masked_auto(p, mask)
                elif use_fused:
                    rep_each = repulsion_loss_auto(p)
                else:
                    rep_each = repulsion_loss_with_idx(p, idx)
                rep = jnp.mean(
                    rep_each.astype(jnp.float32)) * rep_weight
                return occ_loss + rep

            def run_window(p, opt_state, idx, start, length):
                # cache and mask are WINDOW INVARIANTS: close over them
                # so the inner scan carries only (p, opt_state, idx) —
                # a carried cache would be copied (read+written) every
                # iteration by the while-loop
                cache = corner_cache_fn(
                    loop_variables, p.astype(cd) if cd is not None else p, c)
                mask = (repulsion_mask_auto(p) if rep_graph_cache
                        else None)

                def inner(carry, i):
                    p, opt_state, idx = carry
                    if use_fused or rep_graph_cache:
                        pass
                    elif knn_refresh == 1:
                        idx = repulsion_knn(p, exact=exact_knn)
                    else:
                        idx = jax.lax.cond(
                            i % knn_refresh == 0,
                            lambda q, _: repulsion_knn(q, exact=exact_knn),
                            lambda _, old: old,
                            p, idx,
                        )
                    grads = jax.grad(loss_fn_cached)(p, cache, mask, idx)
                    updates, opt_state = opt.update(grads, opt_state, p)
                    p = optax.apply_updates(p, updates)
                    return (p, opt_state, idx), None

                (p, opt_state, idx), _ = jax.lax.scan(
                    inner, (p, opt_state, idx),
                    start + jnp.arange(length))
                return p, opt_state, idx

            def block(carry, start):
                p, opt_state, idx = carry
                return run_window(
                    p, opt_state, idx, start, interp_refresh), None

            if use_fused:
                idx0 = jnp.zeros((B, sample_npoint, 1), jnp.int32)
            else:
                idx0 = repulsion_knn(pts, exact=exact_knn)
            n_blocks, tail = divmod(iterations + 1, interp_refresh)
            starts = jnp.arange(n_blocks) * interp_refresh
            carry, _ = jax.lax.scan(
                block, (pts, opt.init(pts), idx0), starts)
            if tail:
                carry = run_window(
                    *carry, n_blocks * interp_refresh, tail)
            return normalize_unit_sphere(carry[0])

        # reference runs `range(iterations + 1)` -> 201 steps
        if use_fused:
            idx0 = jnp.zeros((B, sample_npoint, 1), jnp.int32)  # unused
        else:
            idx0 = repulsion_knn(pts, exact=exact_knn)
        (pts, _, _), _ = jax.lax.scan(
            step, (pts, opt.init(pts), idx0),
            jnp.arange(iterations + 1),
        )
        return normalize_unit_sphere(pts)

    return defend


def _model_opt_defense(model, variables, default_input_npoint, **kwargs):
    kwargs.setdefault("input_npoint", default_input_npoint)

    def encode(v, pc):
        return model.apply(v, pc, method="encode_inputs")

    def decode(v, p, c):
        return model.apply(v, p, c, method="decode")

    defend = make_opt_defense(decode, encode, **kwargs)
    return functools.partial(defend, variables)


def _convonet_corner_fns(model):
    """(corner_cache_fn, decode_cached_fn) for the interp_refresh path."""
    from if_defense_tpu.implicit.convonet import normalize_coordinate
    from if_defense_tpu.ops.interp import (
        cached_bilinear_sample,
        plane_corner_features,
    )

    padding = model.padding

    def corner_cache(v, p, c):
        cache = {}
        for pl, plane in c.items():
            uv = normalize_coordinate(p, pl, padding)
            cache[pl] = plane_corner_features(plane, uv)
        return jax.lax.stop_gradient(cache)

    def decode_cached(v, p, c, cache):
        feat = 0
        for pl, plane in c.items():
            uv = normalize_coordinate(p, pl, padding)
            feat = feat + cached_bilinear_sample(
                *cache[pl], uv, plane.shape[1:3])
        return model.apply(v, p, feat, method="decode_head")

    return corner_cache, decode_cached


def convonet_opt_defense(model, variables, **kwargs):
    """ConvONet-Opt: the strongest IF-Defense variant.

    `interp_refresh > 1` enables the corner-cache decoder fast path
    (plane-type latents only — the 'grid' volume keeps exact sampling).
    """
    if (
        kwargs.get("interp_refresh", 1) > 1
        and "grid" not in model.plane_type
    ):
        cache_fn, cached_fn = _convonet_corner_fns(model)
        kwargs.setdefault("corner_cache_fn", cache_fn)
        kwargs.setdefault("decode_cached_fn", cached_fn)
    return _model_opt_defense(model, variables, 600, **kwargs)


def onet_opt_defense(model, variables, **kwargs):
    """ONet-Opt (z_dim 0: the vestigial VAE latent is dropped)."""
    return _model_opt_defense(model, variables, 300, **kwargs)
