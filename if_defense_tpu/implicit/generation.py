"""Mesh generation from implicit latents (the ONet-Mesh path).

Functional equivalent of `ONet/im2mesh/onet/generation.py:88-221` (and the
ConvONet twin), re-designed for TPU batching: instead of the reference's
MISE octree that ping-pongs host (Cython) <-> device every refinement round
(:112-130), occupancy is evaluated in two fully-batched passes:

  1. dense coarse grid (resolution0 + 1 points per axis, all clouds at
     once),
  2. a fixed-size set of active voxels (sign changes among corners,
     dilated once) refined to the final resolution — static shapes, one
     device call, far fewer points than a dense fine grid.

The dense fine grid is assembled host-side (coarse values upsampled by
nearest — sign-correct away from the surface — and refined values
scattered in), then handed to the native isosurface kernel. Vertex
coordinate conventions match `extract_mesh` (:160-200): grid padded by one
"outside" cell, vertices mapped into the (1 + padding) bounding box.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.native import marching_isosurface


def logit_threshold(threshold: float) -> float:
    """Occupancy-probability threshold -> logit iso value."""
    return float(np.log(threshold) - np.log(1.0 - threshold))


# Default query-box padding shared by every mesh caller (reference:
# `ONet/im2mesh/onet/generation.py` padding=0.1, box_size = 1 + padding).
DEFAULT_PADDING = 0.1


def quantize_wire_int8(vals_dev, iso: float):
    """Logits -> int8 wire format (1/16 steps in iso +- 8), on device.

    Rounds AWAY from zero so sign(q) == sign(v - iso) exactly:
    round-to-nearest would collapse logits in (iso, iso + 1/32] onto iso
    and flip their occupancy. The single product quantiser — profilers
    must use this too so profiled topology matches production.
    """
    x = jnp.clip((vals_dev - iso) * 16.0, -127, 127)
    q = jnp.where(x > 0, jnp.ceil(x), jnp.floor(x))
    return q.astype(jnp.int8)


def dequantize_wire_int8(q, iso: float) -> np.ndarray:
    """Host-side inverse of `quantize_wire_int8` (float32)."""
    return np.asarray(q).astype(np.float32) / 16.0 + iso


def make_grid(resolution: int, box_size: float) -> np.ndarray:
    """[R, R, R, 3] world coordinates, R = resolution + 1 points/axis."""
    g = (np.arange(resolution + 1) / resolution - 0.5) * box_size
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([X, Y, Z], axis=-1).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("decode_fn", "chunk", "query_dtype"))
def eval_points_batched(decode_fn, variables, c, points, chunk: int = 65536,
                        query_dtype: str | None = None):
    """Evaluate decode_fn on [B, P, 3] points in chunks, [B, P] logits.

    `query_dtype="bfloat16"` casts the queries inside the jit (pair with
    bf16-cast variables/c for a full-bf16 evaluation — a string static so
    the jit cache stays hit). NOTE: decode_fn is a STATIC argument hashed
    by identity — pass a stable function, not a per-call lambda, or every
    call recompiles.
    """
    B, P, _ = points.shape
    pad = (-P) % chunk
    pts = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
    if query_dtype is not None:
        pts = pts.astype(jnp.dtype(query_dtype))
    n_chunks = pts.shape[1] // chunk
    pts = pts.reshape(B, n_chunks, chunk, 3)

    def body(carry, chunk_pts):
        return carry, decode_fn(variables, chunk_pts, c)

    # scan over chunks; points axis stays static
    _, vals = jax.lax.scan(
        body, None, jnp.moveaxis(pts, 1, 0)
    )                                               # [n_chunks, B, chunk]
    vals = jnp.moveaxis(vals, 0, 1).reshape(B, -1)
    return vals[:, :P]


def _voxel_offsets(u: int) -> np.ndarray:
    """[(u+1)^3, 3] fine sample offsets inside one coarse voxel (ij
    order — the eval/assembly layout contract)."""
    return np.stack(np.meshgrid(
        np.arange(u + 1), np.arange(u + 1), np.arange(u + 1),
        indexing="ij"), -1).reshape(-1, 3)


# The refinement helpers live at module level so their jit caches persist
# across batches — per-call @jax.jit closures recompiled through the
# remote-compile tunnel on EVERY refinement call (~20 s/batch, measured;
# the actual device work is ~0.1 s).
@functools.partial(jax.jit, static_argnames=("r0",))
def _active_scores(vals, iso, *, r0: int):
    """Active (sign-mixed, 1-dilated) voxel scores of the coarse field.

    Returns ([B, r0^3] scores — 2 = raw surface voxel, 1 = dilation
    ring, 0 = inactive — and [B] int32 active counts). Only the counts
    need cross the wire (for the adaptive top-k bucket); the scores stay
    device-resident for `_topk_active`.
    """
    B = vals.shape[0]
    occ = vals > iso                                   # [B, r0+1]^3

    # voxel is active if its 8 corners disagree
    def corners(o):
        mn = o[:, :-1, :-1, :-1]
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    if dx == dy == dz == 0:
                        continue
                    mn = mn & o[:, dx:r0 + dx, dy:r0 + dy, dz:r0 + dz]
        mx = o[:, :-1, :-1, :-1]
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    if dx == dy == dz == 0:
                        continue
                    mx = mx | o[:, dx:r0 + dx, dy:r0 + dy, dz:r0 + dz]
        return (~mn) & mx                              # mixed corners

    act = corners(occ)                                 # [B, r0, r0, r0]
    # dilate by one voxel (3^3 max pool) like MISE's neighbour prop;
    # raw surface voxels get a higher score than the dilated ring so a
    # tight max_active budget drops ring voxels first
    a = act.astype(jnp.float32)[..., None]
    ring = jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, 3, 3, 3, 1), (1, 1, 1, 1, 1),
        "SAME",
    )[..., 0]
    score = ring + a[..., 0]                           # 2 = raw, 1 = ring
    flat = score.reshape(B, -1)
    counts = jnp.sum(flat > 0.5, axis=-1).astype(jnp.int32)
    return flat, counts


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_active(flat, k: int):
    """Top-k active voxels by score: ([B, k] int32 flat voxel ids,
    [B, k] bool genuinely-active mask). k is a power-of-two bucket so the
    jit cache stays small across batches with varying surface area."""
    top, idx = jax.lax.top_k(flat, k)                  # [B, k]
    return idx.astype(jnp.int32), top > 0.5


@functools.partial(jax.jit, static_argnames=("r0", "u"))
def _fine_indices(idx, *, r0: int, u: int):
    """[B, K*(u+1)^3, 3] int32 fine-lattice coords of the sample points
    of voxels `idx` [B, K] — built ON DEVICE (the expanded array is
    hundreds of MB and must not cross the host link)."""
    B = idx.shape[0]
    vx = jnp.stack([idx // (r0 * r0), (idx // r0) % r0, idx % r0], -1)
    fid = vx[:, :, None, :] * u + jnp.asarray(_voxel_offsets(u))[None, None]
    return fid.reshape(B, -1, 3).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("r0", "u", "box_size"))
def _fine_points(idx, *, r0: int, u: int, box_size: float):
    """World coordinates of `_fine_indices`, [B, K*(u+1)^3, 3] f32."""
    fid = _fine_indices(idx, r0=r0, u=u)
    return (fid.astype(jnp.float32) / (r0 * u) - 0.5) * box_size


def make_convonet_lattice_eval(model, rf: int, box_size: float,
                               chunk: int = 65536):
    """Fast lattice evaluator for ConvONet plane latents.

    Returns `eval_fn(variables, c, fidx [B, P, 3] int32) -> [B, P]
    logits`, jitted: planes are resized to the fine lattice once
    (`lattice_planes`), then each chunk of queries is a row gather +
    decoder head — no per-chunk selection einsums, which dominated
    refinement eval time (34.8 s -> gather-bound). Returns None for
    'grid'-type latents (kept on the exact trilinear path).
    """
    if "grid" in model.plane_type:
        return None

    @functools.partial(jax.jit, static_argnames=())
    def eval_fn(variables, c, fidx):
        lat = model.apply(variables, c, rf, box_size,
                          method="lattice_planes")
        B, P, _ = fidx.shape
        pad = (-P) % chunk
        f = jnp.pad(fidx, ((0, 0), (0, pad), (0, 0)))
        n_chunks = f.shape[1] // chunk
        f = jnp.moveaxis(f.reshape(B, n_chunks, chunk, 3), 1, 0)

        def body(carry, fc):
            return carry, model.apply(
                variables, fc, lat, rf, box_size, method="decode_lattice")

        _, vals = jax.lax.scan(body, None, f)
        return jnp.moveaxis(vals, 0, 1).reshape(B, -1)[:, :P]

    return eval_fn


def make_convonet_dense_eval(model, rf: int, box_size: float):
    """Dense-lattice evaluator for ConvONet plane latents.

    Returns `eval_fn(variables, c) -> [B, rf+1, rf+1, rf+1] logits`
    (jitted). Supersedes the two-pass coarse+refine scheme for ConvONet:
    gather-free slab evaluation of the full fine lattice is faster than
    refining half as many points through TPU gathers, needs no host-side
    assembly, and is exact everywhere. None unless the latent is exactly
    the three xz/xy/yz planes (`dense_lattice_logits` combines all
    three per slab; grid or partial-plane configs keep the exact path).
    """
    if set(model.plane_type) != {"xz", "xy", "yz"}:
        return None

    @jax.jit
    def eval_fn(variables, c):
        return model.apply(variables, c, rf, box_size,
                           method="dense_lattice_logits")

    return eval_fn


def make_convonet_sparse_eval(model, rf: int, box_size: float,
                              threshold: float = 0.2, block: int = 8,
                              max_blocks: int | None = None,
                              auto_demote: bool = True):
    """Sparse active-block evaluator: dense lattice on device, but only
    the surface-adjacent value blocks cross the wire.

    The dense int8 wire moves (rf+1)^3 bytes/cloud although marching only
    reads values at crossing cubes (~1-2% of the grid). This evaluator
    computes the dense lattice on device, quantises, finds the MIXED
    (sign-change) blocks with overlapping windows (window = block+1,
    stride = block — the one-point overlap guarantees every crossing cube
    lies inside some window), dilates one block toward +axes (a crossing
    cube's far corners live in the next block), and transfers only those
    blocks plus per-block sign flags. `assemble_sparse_grid` rebuilds a
    sign-exact int8 grid host-side: crossing-cube corner values are
    exact, uniform regions get sign-correct filler — identical marching
    topology and vertex positions to the dense int8 wire.

    The per-cloud block budget M is ADAPTIVE: a detect pass keeps the
    quantised grid on device and sends back only the [B] active-block
    counts (~160 B); the gather pass then runs with M = next power of
    two >= max(count) (one cached jit specialisation per bucket, <=
    log2(nb^3) over a whole run). The transfer therefore scales with the
    batch's actual surface area — a smooth ModelNet-like field moves
    ~1-2 % of the grid, a noisy field degrades gracefully toward dense
    instead of tripping a fallback. `max_blocks` is an optional hard cap
    (clipping then raises in `assemble_sparse_grid` as before).

    Returns None unless the dense evaluator applies. eval_fn(variables,
    c) -> dict of device arrays for `assemble_sparse_grid`:
      blocks  [B, M, block^3] int8 — gathered active blocks
      idx     [B, M] int32 flat block ids (-1 = unused slot)
      inside  [B, nb^3] bool — all-inside flag per block (filler signs)
      n_need  [B] int32 — blocks genuinely needed (n_need > M means the
              user cap clipped; callers log / raise the cap)
    """
    dense_fn = make_convonet_dense_eval(model, rf, box_size)
    if dense_fn is None:
        return None
    iso = logit_threshold(threshold)
    rp = rf + 1
    nb = -(-rp // block)                       # blocks per axis
    S = nb * block
    cap = min(max_blocks or nb**3, nb**3)

    @jax.jit
    def detect(variables, c):
        vals = dense_fn(variables, c)                    # [B, rp, rp, rp]
        q = quantize_wire_int8(vals, iso)
        B = q.shape[0]
        pad = S - rp
        qp = jnp.pad(q, ((0, 0),) + ((0, pad),) * 3,
                     constant_values=jnp.int8(-127))
        occ = (qp > 0)

        # overlapping windows over the SHELL-padded occupancy (the
        # downstream sampler pads a strongly-outside shell, so a field
        # that is inside at the grid boundary has crossings against the
        # shell — the front/back False padding makes those windows mixed
        # too). Window j covers points [j*block - 1, j*block + block - 1]
        # -> nb + 1 windows per axis.
        occw = jnp.pad(occ, ((0, 0),) + ((1, block),) * 3)
        f = occw.astype(jnp.float32)
        win = (1, block + 1, block + 1, block + 1)
        st = (1, block, block, block)
        w_any = jax.lax.reduce_window(
            f, -jnp.inf, jax.lax.max, win, st, "valid") > 0.5
        w_all = jax.lax.reduce_window(
            f, jnp.inf, jax.lax.min, win, st, "valid") > 0.5
        mixed = w_any & ~w_all                         # [B, nb+1]^3

        # window j's crossing cubes touch blocks {j-1, j}; block i is
        # needed by windows {i, i+1}
        transferred = jax.lax.reduce_window(
            mixed.astype(jnp.float32), -jnp.inf, jax.lax.max,
            (1, 2, 2, 2), (1, 1, 1, 1), "valid") > 0.5  # [B, nb]^3

        score = transferred.astype(jnp.float32).reshape(B, -1)

        # block-level (non-overlapping) all-inside flags for the filler
        ob = occ.reshape(B, nb, block, nb, block, nb, block)
        inside = ob.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            B, nb**3, block**3).all(axis=-1)
        n_need = jnp.sum(score, axis=-1).astype(jnp.int32)
        return qp, score, inside, n_need

    @functools.partial(jax.jit, static_argnames="m")
    def gather(qp, score, m):
        B = qp.shape[0]
        top, idx = jax.lax.top_k(score, m)               # [B, m]
        idx = jnp.where(top > 0.5, idx, -1).astype(jnp.int32)
        qb = qp.reshape(B, nb, block, nb, block, nb, block)
        qb = qb.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, nb**3, block**3)
        blocks = jnp.take_along_axis(
            qb, jnp.maximum(idx, 0).astype(jnp.int32)[:, :, None], axis=1)
        return blocks, idx

    def eval_fn(variables, c):
        qp, score, inside, n_need = detect(variables, c)
        # only the [B] counts cross the wire here; qp/score stay device-
        # resident until the bucketed gather below
        need = int(jnp.max(n_need))
        m = min(cap, max(64, 1 << max(need - 1, 0).bit_length()))
        # auto-demote: when the field is active nearly everywhere (e.g.
        # a barely-trained decoder whose surface fills the lattice), the
        # power-of-two bucket approaches nb^3 and the sparse wire ships
        # >= the dense grid's bytes PLUS the gather + per-block padding —
        # strictly slower than the dense int8 wire it was built to beat
        # (the BENCH_MESH r4 inversion). Ship the already-quantised dense
        # grid instead: identical int8 values, so downstream marching /
        # sampling is bit-identical either way.
        if auto_demote and m * block**3 + nb**3 >= rp**3:
            return {"dense": qp[:, :rp, :rp, :rp]}
        blocks, idx = gather(qp, score, m)
        return {"blocks": blocks, "idx": idx, "inside": inside,
                "n_need": n_need}

    eval_fn.sparse_meta = {"block": block, "nb": nb, "rp": rp, "M": cap,
                           "iso": iso}
    return eval_fn


def assemble_sparse_grid(out_b: dict, b: int, *, block: int, nb: int,
                         rp: int) -> np.ndarray:
    """Host half of the sparse wire: one cloud's int8 value grid.

    Raises RuntimeError when the static block budget clipped genuinely
    needed blocks (raise --sparse_blocks).
    """
    idx = np.asarray(out_b["idx"][b])
    n_need = int(out_b["n_need"][b])
    n_have = int((idx >= 0).sum())
    if n_need > n_have:
        raise RuntimeError(
            f"sparse wire clipped: {n_need} active blocks > budget "
            f"{len(idx)} — raise max_blocks")
    inside = np.asarray(out_b["inside"][b]).reshape(-1)
    # block-major layout [nb^3, block^3]: the filler broadcast and the
    # active-block fill are both single vectorised writes
    volb = np.where(inside, np.int8(1), np.int8(-1))[:, None]
    volb = np.broadcast_to(volb, (nb**3, block**3)).copy()
    blocks = np.asarray(out_b["blocks"][b])            # [M, block^3]
    valid = idx >= 0
    volb[idx[valid]] = blocks[valid]
    vol = volb.reshape(nb, nb, nb, block, block, block)
    vol = vol.transpose(0, 3, 1, 4, 2, 5).reshape(
        nb * block, nb * block, nb * block)
    return np.ascontiguousarray(vol[:rp, :rp, :rp])


def active_voxel_refinement(
    decode_fn: Callable,
    variables,
    c,
    coarse_logits: jax.Array,
    resolution0: int,
    upsample: int,
    box_size: float,
    iso: float,
    max_active: int = 4096,
    chunk: int = 8192,
    timings: dict | None = None,
    lattice_eval_fn=None,
    query_dtype: str | None = None,
    wire: str = "bf16",
):
    """Refine the occupancy field near the surface.

    Args:
        coarse_logits: [B, R0+1, R0+1, R0+1] dense coarse values.
        upsample: fine cells per coarse cell (power of 2; reference MISE
            uses 2 steps of x2 -> 4).
        timings: optional dict that receives per-phase wall seconds
            (eval / transfer / assemble) for profiling.
        wire: refined-value device->host format — "bf16" (default) or
            "int8" (`quantize_wire_int8`: occupancy signs exact,
            crossing-vertex positions shift <= one quantum; the coarse
            grid crosses quantised too). int8 matters on a slow host
            link: the refined values are the dominant transfer of the
            non-dense (ONet / grid-latent) mesh path.
    Returns:
        fine_vals [B, Rf+1, Rf+1, Rf+1] numpy (nearest-upsampled coarse
        values with refined values scattered in near the surface).

    The voxel budget is ADAPTIVE: only the [B] active counts cross the
    wire up front, then eval + transfer run at K = the next power of two
    >= the batch's max count (capped at max_active — a tight cap drops
    dilation-ring voxels first, as before). Eval work and wire bytes
    scale with the batch's actual surface area instead of the static
    budget; one cached jit specialisation per bucket.
    """
    import time as _time
    B = coarse_logits.shape[0]
    R0, U = resolution0, upsample
    Rf = R0 * U
    cap = min(max_active, R0**3)
    offs = _voxel_offsets(U)                       # [(U+1)^3, 3]

    flat, counts = _active_scores(coarse_logits, jnp.float32(iso), r0=R0)
    need = int(jnp.max(counts))                    # tiny fetch + barrier
    K = cap if need >= cap else \
        min(cap, max(256, 1 << max(need - 1, 0).bit_length()))
    idx_dev, act_dev = _topk_active(flat, K)

    t0 = _time.perf_counter()
    # compact wire: the refined values only feed the isosurface
    # crossing test — bf16 halves the (large) device->host transfer,
    # int8 quarters it. The widening back to f32 must happen HOST-side
    # (casting back on device would put f32 on the wire again).
    if lattice_eval_fn is not None:
        vals_dev = lattice_eval_fn(
            variables, c, _fine_indices(idx_dev, r0=R0, u=U))
    else:
        fine_pts = _fine_points(
            idx_dev, r0=R0, u=U, box_size=float(box_size))
        vals_dev = eval_points_batched(
            decode_fn, variables, c, fine_pts, chunk, query_dtype
        )                                              # [B, K*O]
    if wire == "int8":
        vals_dev = quantize_wire_int8(
            vals_dev.astype(jnp.float32), iso)
        coarse_dev = quantize_wire_int8(
            coarse_logits.astype(jnp.float32), iso)
    else:
        vals_dev = vals_dev.astype(jnp.bfloat16)
        coarse_dev = coarse_logits
    if timings is not None:
        # scalar fetch: a real device barrier (block_until_ready returns
        # early through the axon tunnel)
        float(jnp.ravel(vals_dev)[0])
    t1 = _time.perf_counter()
    if wire == "int8":
        fine_vals_at = dequantize_wire_int8(vals_dev, iso)
        coarse = dequantize_wire_int8(coarse_dev, iso)
    else:
        fine_vals_at = np.asarray(vals_dev).astype(np.float32)
        coarse = np.asarray(coarse_dev, np.float32)    # [B, R0+1]^3
    idx = np.asarray(idx_dev).astype(np.int64)         # [B, K]
    act = np.asarray(act_dev)                          # [B, K]
    t2 = _time.perf_counter()

    # assemble per cloud in the native kernel: nearest-upsampled coarse
    # values + refined values scattered by (voxel id, offset) — all fine-
    # grid addressing stays in C++ (the batched numpy repeat+scatter
    # dominated host time before; the [B, K, O] int64 index tensor after)
    from if_defense_tpu.native import assemble_fine_grid_vox

    Rp = Rf + 1
    O = len(offs)
    vals = fine_vals_at.reshape(B, -1, O)              # [B, K, O]
    fine = np.empty((B, Rp, Rp, Rp), np.float32)
    for b in range(B):
        a = act[b]
        fine[b] = assemble_fine_grid_vox(
            coarse[b], U, idx[b][a], vals[b][a])
    if timings is not None:
        timings["eval_s"] = t1 - t0
        timings["transfer_s"] = t2 - t1
        timings["assemble_s"] = _time.perf_counter() - t2
        timings["refine_k"] = K
        timings["wire_bytes"] = int(
            vals.size * (1 if wire == "int8" else 2) + idx.size * 4)
    return fine


def compute_value_grids(
    decode_fn: Callable,
    variables,
    c,
    *,
    threshold: float = 0.2,
    padding: float = DEFAULT_PADDING,
    resolution0: int = 32,
    upsample: int = 4,
    refine: bool = True,
    max_active: int = 8192,
    chunk: int = 8192,
    lattice_eval_fn=None,
    dense_eval_fn=None,
    wire: str = "bf16",
    compute_dtype: str | None = None,
):
    """Occupancy value grids for the batch, host-side.

    The shared front half of mesh generation (see `generate_meshes` for
    the argument semantics). Returns (values, iso) where values is
    [B, R+1, R+1, R+1] float32 — or int8 QUANTISED logits when the dense
    path runs with wire="int8" (iso at q == 0; `quantize_wire_int8`), so
    direct-sampling consumers never materialise the float grid.
    """
    iso = logit_threshold(threshold)
    box_size = 1.0 + padding

    B = jax.tree_util.tree_leaves(c)[0].shape[0]
    qdt = None
    if compute_dtype is not None and dense_eval_fn is None:
        cdt = jnp.dtype(compute_dtype)
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(cdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        variables, c = cast(variables), cast(c)
        qdt = compute_dtype                 # queries cast inside the jit
    if dense_eval_fn is not None and refine and upsample > 1:
        # values only feed crossing tests / lerp; compact wire format
        vals_dev = dense_eval_fn(variables, c)
        if wire == "int8":
            values = np.asarray(quantize_wire_int8(vals_dev, iso))
        else:
            values = np.asarray(
                vals_dev.astype(jnp.bfloat16)).astype(np.float32)
    else:
        grid = make_grid(resolution0, box_size)        # [R0+1]^3 x 3
        R0p = resolution0 + 1
        pts = jnp.asarray(grid.reshape(1, -1, 3))
        pts = jnp.broadcast_to(pts, (B, pts.shape[1], 3))
        coarse = eval_points_batched(
            decode_fn, variables, c, pts, chunk, qdt)
        coarse = coarse.reshape(B, R0p, R0p, R0p)

        if refine and upsample > 1:
            values = active_voxel_refinement(
                decode_fn, variables, c, coarse, resolution0, upsample,
                box_size, iso, max_active, chunk,
                lattice_eval_fn=lattice_eval_fn, query_dtype=qdt,
                wire=wire,
            )
        else:
            values = np.asarray(coarse)
    return values, iso


def sample_value_grid(values_b: np.ndarray, iso: float, box_size: float,
                      n: int, seed: int) -> np.ndarray:
    """Fused marching + area-weighted sampling of ONE cloud's value grid.

    [R+1]^3 float32 logits (or int8 quantised) -> [n, 3] world-coordinate
    surface samples, via the native soup sampler (no indexed mesh — see
    native/sample.cpp). Raises ValueError on a degenerate surface.
    """
    from if_defense_tpu.native import sample_isosurface

    pad_val = np.int8(-127) if values_b.dtype == np.int8 else -1e6
    vol = np.pad(values_b, 1, constant_values=pad_val)
    pts = sample_isosurface(vol, iso, n, seed)
    R = values_b.shape[0] - 1
    return ((pts - 1.0) / R - 0.5) * box_size


def mesh_from_value_grid(values_b: np.ndarray, iso: float,
                         box_size: float):
    """Explicit mesh from ONE cloud's value grid, world coordinates.

    The mesh twin of `sample_value_grid`: same padding and grid->world
    mapping, but returns (vertices [V, 3] f32, triangles [T, 3] i64)
    instead of fused surface samples — used by `--save_mesh` export
    (the reference keeps trimesh objects around for this,
    `ONet/remesh_defense.py:128-150`).
    """
    from if_defense_tpu.native import marching_isosurface

    if values_b.dtype == np.int8:
        # quantize_wire_int8 places the isovalue at q == 0; the cast to
        # f32 inside marching_isosurface preserves that
        pad_val, iso = np.int8(-127), 0.0
    else:
        pad_val = -1e6
    vol = np.pad(values_b, 1, constant_values=pad_val)
    verts, tris = marching_isosurface(vol, iso)
    R = values_b.shape[0] - 1
    return ((verts - 1.0) / R - 0.5) * box_size, tris


def generate_meshes(
    decode_fn: Callable,
    variables,
    c,
    *,
    threshold: float = 0.2,
    padding: float = DEFAULT_PADDING,
    resolution0: int = 32,
    upsample: int = 4,
    refine: bool = True,
    max_active: int = 8192,
    # chunk bounds the [B, chunk, W, C] bilinear intermediate; 8192 keeps
    # it HBM-resident (65536 spilled and ran 3x slower)
    chunk: int = 8192,
    simplify_nfaces: int | None = None,
    lattice_eval_fn=None,
    dense_eval_fn=None,
    wire: str = "bf16",
    compute_dtype: str | None = None,
):
    """Extract one mesh per latent in the batch.

    Args:
        decode_fn: (variables, points [B, P, 3], c) -> logits [B, P].
        c: batch latent (code or plane dict).
        simplify_nfaces: optional QEM simplification target
            (generation.py:210-213; the shipped configs leave it null).
        lattice_eval_fn: optional fast evaluator for lattice queries
            (`make_convonet_lattice_eval`) used by the refinement pass.
        dense_eval_fn: optional gather-free dense-lattice evaluator
            (`make_convonet_dense_eval`); when given, the coarse +
            refinement passes are replaced by ONE exact dense evaluation
            of the full fine lattice (fastest ConvONet path).
        wire: dense-path device->host format — "bf16" (default) or
            "int8" (logits quantised to 1/16 steps in iso +- 8, rounded
            away from zero; occupancy signs exact, crossing-vertex
            positions shift by <= one quantum — halves the transfer,
            which dominates when the host link is slow).
        compute_dtype: "bfloat16" runs the coarse + refinement occupancy
            evaluations in bf16 (params/latent/queries cast once) — the
            values only feed crossing tests and linear interpolation, and
            the ONet decoder's 256-wide CBN matmuls are MXU-bound, so
            this is the big lever for the non-dense (ONet / grid) path.
    Returns:
        list of (vertices [V, 3] float32 world coords, triangles [T, 3]).
    """
    values, iso = compute_value_grids(
        decode_fn, variables, c,
        threshold=threshold, padding=padding, resolution0=resolution0,
        upsample=upsample, refine=refine, max_active=max_active,
        chunk=chunk, lattice_eval_fn=lattice_eval_fn,
        dense_eval_fn=dense_eval_fn, wire=wire,
        compute_dtype=compute_dtype,
    )
    box_size = 1.0 + padding
    if values.dtype == np.int8:
        values = dequantize_wire_int8(values, iso)

    meshes = []
    R = values.shape[1] - 1
    for b in range(values.shape[0]):
        # pad with a strongly-outside shell so the surface closes
        # (extract_mesh :174-176)
        vol = np.pad(values[b], 1, constant_values=-1e6)
        verts, tris = marching_isosurface(vol, iso)
        verts = verts - 1.0                            # undo padding
        verts = verts / R                              # [0, 1]
        verts = (verts - 0.5) * box_size               # world box
        verts = verts.astype(np.float32)
        if simplify_nfaces is not None and len(tris) > simplify_nfaces:
            from if_defense_tpu.native import simplify_mesh

            verts, tris = simplify_mesh(verts, tris, simplify_nfaces)
        meshes.append((verts, tris))
    return meshes


def sample_surface(
    verts: np.ndarray, tris: np.ndarray, n: int, rng: np.random.Generator
) -> np.ndarray:
    """Uniform area-weighted surface sampling (trimesh.sample equivalent).

    Raises ValueError on empty/degenerate meshes — callers fall back like
    `ONet/remesh_defense.py:159-170`.
    """
    if len(tris) == 0:
        raise ValueError("empty mesh")
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    total = areas.sum()
    if not np.isfinite(total) or total <= 0:
        raise ValueError("degenerate mesh")
    probs = areas / total
    choice = rng.choice(len(tris), size=n, p=probs)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    return (
        v0[choice] + u * (v1[choice] - v0[choice])
        + v * (v2[choice] - v0[choice])
    ).astype(np.float32)


def estimate_normals(
    decode_fn: Callable,
    variables,
    c,
    vertices: np.ndarray,
    chunk: int = 8192,
) -> np.ndarray:
    """Vertex normals from the decoder gradient
    (`ONet/im2mesh/onet/generation.py:223-249`): n = -∇_v decode(v),
    normalised. One cloud per call (c is the [1, ...]-batched latent).

    Args:
        vertices: [V, 3] float32.
    Returns:
        [V, 3] float32 unit normals.
    """
    V = len(vertices)
    pad = (-V) % chunk
    pts = np.pad(vertices.astype(np.float32), ((0, pad), (0, 0)))

    @jax.jit
    def grad_chunk(v, p):
        g = jax.grad(lambda q: jnp.sum(decode_fn(v, q[None], c)))(p)
        return -g

    out = []
    for i in range(0, len(pts), chunk):
        out.append(np.asarray(grad_chunk(variables, jnp.asarray(
            pts[i : i + chunk]))))
    n = np.concatenate(out, 0)[:V]
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-10)


def refine_mesh(
    decode_fn: Callable,
    variables,
    c,
    verts: np.ndarray,
    tris: np.ndarray,
    *,
    steps: int = 30,
    threshold: float = 0.2,
    lr: float = 1e-4,
    normal_weight: float = 0.01,
    seed: int = 0,
):
    """Gradient-based mesh refinement
    (`ONet/im2mesh/onet/generation.py:251-314`, off in shipped configs).

    Optimises vertex positions with RMSprop so that Dirichlet-sampled
    face points sit on the `threshold` level set and face normals align
    with the (negated) decoder gradient. TPU-first: the whole
    `steps`-iteration loop is one jitted `lax.scan`; Dirichlet samples
    come from the JAX PRNG instead of per-step host numpy.

    Returns:
        refined vertices [V, 3] float32.
    """
    import optax

    v0 = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(tris, jnp.int32)
    opt = optax.rmsprop(lr)

    def loss_fn(v, key):
        fv = v[faces]                                    # [F, 3, 3]
        eps = jax.random.dirichlet(key, jnp.full((3,), 0.5), (len(tris),))
        face_point = jnp.sum(fv * eps[:, :, None], axis=1)
        e1 = fv[:, 1] - fv[:, 0]
        e2 = fv[:, 2] - fv[:, 1]
        face_normal = jnp.cross(e1, e2)
        face_normal = face_normal / (
            jnp.linalg.norm(face_normal, axis=1, keepdims=True) + 1e-10)

        def occ_sum(q):
            return jnp.sum(jax.nn.sigmoid(decode_fn(variables, q[None], c)))

        face_value, vjp = jax.value_and_grad(occ_sum)(face_point)
        normal_target = -vjp
        normal_target = normal_target / (
            jnp.linalg.norm(normal_target, axis=1, keepdims=True) + 1e-10)
        fv_sig = jax.nn.sigmoid(decode_fn(variables, face_point[None], c))[0]
        loss_target = jnp.mean((fv_sig - threshold) ** 2)
        loss_normal = jnp.mean(
            jnp.sum((face_normal - normal_target) ** 2, axis=1))
        return loss_target + normal_weight * loss_normal

    @jax.jit
    def run(v, key):
        def step(carry, k):
            v, opt_state = carry
            grads = jax.grad(loss_fn)(v, k)
            updates, opt_state = opt.update(grads, opt_state, v)
            return (optax.apply_updates(v, updates), opt_state), None

        keys = jax.random.split(key, steps)
        (v, _), _ = jax.lax.scan(step, (v, opt.init(v)), keys)
        return v

    return np.asarray(run(v0, jax.random.key(seed)))


def generate_mesh_sliding(
    encode_crop_fn: Callable,
    decode_crop_fn: Callable,
    variables,
    pc: np.ndarray,
    *,
    query_crop_size: float = 1.0,
    input_crop_size: float = 1.25,
    resolution0: int = 32,
    upsample: int = 4,
    threshold: float = 0.2,
    chunk: int = 65536,
):
    """Sliding-window mesh generation for scene-scale inputs
    (`ConvONet/src/conv_onet/generation.py:148-234`, crop configs only).

    Tiles the scene bounding box into query crops (each encoded from a
    larger input crop), evaluates a dense fine occupancy grid per crop,
    stitches the crops into one value grid and extracts a single mesh.

    Args:
        encode_crop_fn: (variables, pc [1, T, 3], input_vol [2, 3]) -> c.
        decode_crop_fn: (variables, p [1, Q, 3], c, input_vol) -> logits.
        pc: [T, 3] scene point cloud (single scene).
    Returns:
        (vertices [V, 3] world coords, triangles [F, 3]).
    """
    iso = logit_threshold(threshold)
    lb = pc.min(0) - 0.01
    ub = pc.max(0) + 0.01
    n_axis = np.maximum(
        np.ceil((ub - lb) / query_crop_size).astype(int), 1)
    r = resolution0 * upsample

    value_grid = np.empty(
        (n_axis[0] * r, n_axis[1] * r, n_axis[2] * r), np.float32)
    axes = [np.arange(n) for n in n_axis]
    for ix in axes[0]:
        for iy in axes[1]:
            for iz in axes[2]:
                lo = lb + np.array([ix, iy, iz]) * query_crop_size
                hi = lo + query_crop_size
                center = (lo + hi) / 2
                in_lo = center - input_crop_size / 2
                in_hi = center + input_crop_size / 2
                input_vol = np.stack([in_lo, in_hi]).astype(np.float32)

                c = encode_crop_fn(
                    variables, pc[None].astype(np.float32), input_vol)
                g = (np.arange(r) + 0.5) / r
                X, Y, Z = np.meshgrid(
                    lo[0] + g * query_crop_size,
                    lo[1] + g * query_crop_size,
                    lo[2] + g * query_crop_size, indexing="ij")
                q = np.stack([X, Y, Z], -1).reshape(-1, 3).astype(np.float32)
                vals = []
                for i in range(0, len(q), chunk):
                    qa = q[i : i + chunk]
                    pad = (-len(qa)) % chunk
                    if pad:
                        qa = np.pad(qa, ((0, pad), (0, 0)))
                    v = np.asarray(decode_crop_fn(
                        variables, jnp.asarray(qa[None]), c, input_vol))[0]
                    vals.append(v[: chunk - pad] if pad else v)
                value_grid[
                    ix * r : (ix + 1) * r,
                    iy * r : (iy + 1) * r,
                    iz * r : (iz + 1) * r,
                ] = np.concatenate(vals).reshape(r, r, r)

    vol = np.pad(value_grid, 1, constant_values=-1e6)
    verts, tris = marching_isosurface(vol.astype(np.float32), iso)
    # undo the 1-cell pad, then map grid index i to its query position
    # (i + 0.5)/r * crop — queries are CELL CENTERS, so the back-
    # transform carries the same half-cell offset
    verts = (verts - 1.0 + 0.5) / r * query_crop_size + lb
    return verts.astype(np.float32), tris
