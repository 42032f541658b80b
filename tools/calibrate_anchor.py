"""Calibrate the bench.py baseline anchor against the REAL reference.

VERDICT r3 item 5: the ~24 clouds/s V100 anchor was a FLOP model with
±2x error bars. This tool replaces the guessed constants with measured
ones by running the actual torch reference pipeline
(`/root/reference/ConvONet/opt_defense.py:182-239` semantics: SOR ->
preprocess -> encode once -> N+1 Adam iterations of decoder-BCE +
repulsion) on THIS host's CPU, next to our JAX implementation on the
same CPU, at identical config. That yields:

  * `same_host_speedup` — ours vs reference on identical silicon, the
    primary measured implementation-efficiency factor (no cross-hardware
    extrapolation at all);
  * `flops_per_cloud` — exact XLA cost-analysis FLOPs of our fused
    defense, used by bench.py to report MFU on the TPU;
  * `torch_cpu_efficiency` — the reference pipeline's achieved FLOPs/s
    divided by this CPU's measured matmul peak; applying that measured
    efficiency to a V100's f32 peak gives a calibrated (rather than
    assumed) anchor for the published-hardware comparison.

The reference model is built through its own `src.config.get_model`
(random weights — throughput is weight-independent) with two import
shims for packages absent in this environment (`torch_scatter`,
`trimesh`/compiled mesh libs, all unused on the opt-defense path).
Reference code is IMPORTED from /root/reference, never copied.

Legs run as separate invocations so torch and jax never share the
single core / allocator:

    python tools/calibrate_anchor.py --leg torch
    JAX_PLATFORMS=cpu python tools/calibrate_anchor.py --leg jax
    JAX_PLATFORMS=cpu python tools/calibrate_anchor.py --leg flops
    python tools/calibrate_anchor.py --leg summary

Each leg merges its keys into --out (default ANCHOR_CALIBRATION.json).
"""

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference/ConvONet"

# reference opt-defense hyperparameters (opt_defense.py:27-56 + config)
DEFAULTS = dict(
    input_npoint=600, sample_npoint=1024, padding_scale=0.9,
    init_sigma=0.01, lr=1e-3, rep_weight=500.0, threshold=0.2,
    sor_k=2, sor_alpha=1.1,
)

V100_F32_PEAK = 15.7e12   # published V100-SXM2 f32 peak FLOP/s


def _merge_out(out_path: str, update: dict) -> None:
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data.update(update)
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(update, indent=2))


# --------------------------------------------------------------------------
# torch leg: the actual reference pipeline on host CPU
# --------------------------------------------------------------------------

def _install_reference_shims():
    """Stub the modules the reference imports but never calls here."""
    import torch

    def _expand(index, src):
        return index.expand_as(src) if index.shape != src.shape else index

    def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
        index = _expand(index, src)
        if out is None:
            size = list(src.shape)
            size[dim] = (dim_size if dim_size is not None
                         else int(index.max()) + 1)
            out = src.new_zeros(size)
        out.scatter_reduce_(dim, index, src, reduce="mean",
                            include_self=False)
        return out

    def scatter_max(src, index, dim=-1, out=None, dim_size=None):
        index = _expand(index, src)
        size = list(src.shape)
        size[dim] = dim_size if dim_size is not None else int(index.max()) + 1
        out = src.new_zeros(size)
        out.scatter_reduce_(dim, index, src, reduce="amax",
                            include_self=False)
        return out, None

    ts = types.ModuleType("torch_scatter")
    ts.scatter_mean, ts.scatter_max = scatter_mean, scatter_max
    sys.modules["torch_scatter"] = ts

    # repulsion_loss.py:47 hard-codes `.cuda()` on a scalar; make .cuda a
    # CPU pass-through so the reference code runs unmodified on this host
    torch.Tensor.cuda = lambda self, *a, **k: self

    sys.modules["trimesh"] = types.ModuleType("trimesh")
    for name, attrs in [("src.utils.libmcubes", ("marching_cubes",)),
                        ("src.utils.libsimplify", ("simplify_mesh",)),
                        ("src.utils.libmise", ("MISE",))]:
        mod = types.ModuleType(name)
        for a in attrs:
            setattr(mod, a, None)
        sys.modules[name] = mod


def torch_leg(args):
    import numpy as np
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    sys.path.insert(0, REF_ROOT)
    _install_reference_shims()
    cwd = os.getcwd()
    os.chdir(REF_ROOT)  # config paths are relative
    try:
        import yaml
        if not hasattr(yaml, "_orig_load"):  # pyyaml>=6 needs a Loader;
            yaml._orig_load = yaml.load      # the reference predates that
            yaml.load = (lambda s, Loader=yaml.FullLoader:
                         yaml._orig_load(s, Loader=Loader))
        from src import config as rcfg
        cfg = rcfg.load_config("configs/convonet_3plane_mn40.yaml",
                               "configs/default.yaml")
        model = rcfg.get_model(cfg, device=torch.device("cpu"), dataset=None)
        from defense import SORDefense, repulsion_loss
    finally:
        os.chdir(cwd)
    model.eval()
    for p in model.parameters():
        p.requires_grad = False

    d = DEFAULTS
    sor = SORDefense(k=d["sor_k"], alpha=d["sor_alpha"], sor_batch=32)

    def preprocess(one_pc: np.ndarray, input_n: int):
        # opt_defense.py:115-147 minus .cuda()
        center = np.mean(one_pc, axis=0)
        centered = one_pc - center
        scale = (centered.max(axis=0) - centered.min(axis=0)).max()
        scaled = centered / scale * d["padding_scale"]
        if scaled.shape[0] > input_n:
            idx = np.random.choice(scaled.shape[0], input_n, replace=False)
            sel = scaled[idx]
        else:
            sel = scaled
        return (torch.from_numpy(scaled).float().unsqueeze(0),
                torch.from_numpy(sel).float().unsqueeze(0))

    def defend(pc_np: np.ndarray, iterations: int, sample_n: int,
               input_n: int = d["input_npoint"]):
        """One full reference defense batch; returns (total_s, opt_s)."""
        t0 = time.time()
        with torch.no_grad():
            sor_pc = sor(torch.from_numpy(pc_np).float())  # list of [k,3]
            proc = [preprocess(p.numpy(), input_n) for p in sor_pc]
            sel = torch.cat([p[1] for p in proc], dim=0)
            all_pc = [p[0][0] for p in proc]  # ragged after SOR
            c = model.encode_inputs(sel)
            # init_points (opt_defense.py:149-180)
            idx = [torch.randint(0, len(p), (sample_n,)) for p in all_pc]
            points = torch.stack(
                [all_pc[i][idx[i]] for i in range(len(all_pc))], dim=0)
            points = torch.clamp(
                points + torch.randn_like(points) * d["init_sigma"],
                min=-0.5 * d["padding_scale"], max=0.5 * d["padding_scale"])
        points.requires_grad_()
        occ_threshold = torch.ones(points.shape[:2]) * d["threshold"]
        opt = torch.optim.Adam([points], lr=d["lr"])
        t_opt = time.time()
        for _ in range(iterations + 1):  # reference runs N+1 steps
            occ = model.decode(points, c).logits
            occ_loss = F.binary_cross_entropy_with_logits(
                occ, occ_threshold, reduction="none").mean()
            occ_loss = occ_loss * points.shape[1]
            rep = repulsion_loss(points).mean() * d["rep_weight"]
            loss = occ_loss + rep
            opt.zero_grad()
            loss.backward()
            opt.step()
        t1 = time.time()
        return t1 - t0, t1 - t_opt

    rng = np.random.default_rng(0)
    pc = (rng.normal(size=(args.batch, 1024, 3)) * 0.3).astype(np.float32)

    defend(pc, iterations=2, sample_n=d["sample_npoint"])  # warmup
    totals, opts = [], []
    for _ in range(args.timed_batches):
        t_total, t_opt = defend(pc, args.iterations, d["sample_npoint"])
        totals.append(t_total)
        opts.append(t_opt)
    total_s = sum(totals)
    clouds_s = args.timed_batches * args.batch / total_s

    # dispatch-overhead probe: tiny shapes, compute ~ 0
    tiny = (rng.normal(size=(2, 64, 3)) * 0.3).astype(np.float32)
    defend(tiny, iterations=2, sample_n=32, input_n=32)
    _, t_tiny = defend(tiny, 100, sample_n=32, input_n=32)
    overhead_per_iter = t_tiny / 101

    # measured (not modeled) FLOPs of the reference loop: count one
    # optimize iteration fwd+bwd plus the once-per-batch encode
    from torch.utils.flop_counter import FlopCounterMode
    with torch.no_grad():
        sor_pc = sor(torch.from_numpy(pc).float())
        proc = [preprocess(p.numpy(), d["input_npoint"]) for p in sor_pc]
        sel = torch.cat([p[1] for p in proc], dim=0)
    with FlopCounterMode(display=False) as fc_enc:
        with torch.no_grad():
            c = model.encode_inputs(sel)
    encode_flops = fc_enc.get_total_flops()
    points = torch.rand(args.batch, d["sample_npoint"], 3) - 0.5
    points.requires_grad_()
    occ_threshold = torch.ones(points.shape[:2]) * d["threshold"]
    with FlopCounterMode(display=False) as fc_iter:
        occ = model.decode(points, c).logits
        occ_loss = F.binary_cross_entropy_with_logits(
            occ, occ_threshold, reduction="none").mean() * points.shape[1]
        loss = occ_loss + repulsion_loss(points).mean() * d["rep_weight"]
        loss.backward()
    iter_flops = fc_iter.get_total_flops()
    ref_flops_per_cloud = (
        encode_flops + (args.iterations + 1) * iter_flops) / args.batch

    # practical single-core matmul peak for the efficiency denominator
    a = torch.randn(1024, 1024)
    b = torch.randn(1024, 1024)
    a @ b
    t0 = time.time()
    for _ in range(10):
        a @ b
    matmul_peak = 10 * 2 * 1024**3 / (time.time() - t0)

    _merge_out(args.out, {"torch_cpu": {
        "clouds_per_sec": round(clouds_s, 4),
        "sec_per_batch": round(total_s / args.timed_batches, 2),
        "opt_loop_sec_per_iter": round(
            sum(opts) / args.timed_batches / (args.iterations + 1), 4),
        "overhead_sec_per_iter": round(overhead_per_iter, 5),
        "matmul_peak_flops": matmul_peak,
        "ref_flops_per_cloud": ref_flops_per_cloud,
        "ref_encode_flops_per_batch": encode_flops,
        "ref_iter_flops_per_batch": iter_flops,
        "batch": args.batch, "iterations": args.iterations,
        "timed_batches": args.timed_batches,
        "torch_version": torch.__version__,
    }})


# --------------------------------------------------------------------------
# jax leg: our implementation at the identical config on the same CPU
# --------------------------------------------------------------------------

def jax_leg(args):
    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from if_defense_tpu.defense import convonet_opt_defense
    from if_defense_tpu.implicit import ConvOccupancyNetwork

    model = ConvOccupancyNetwork()
    rng = np.random.default_rng(0)
    init_pc = jnp.asarray(rng.uniform(-0.45, 0.45, (2, 600, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.normal(size=(args.batch, 1024, 3)) * 0.3,
                     jnp.float32)
    key = jax.random.key(1)

    def measure(compute_dtype, interp_refresh):
        defend = convonet_opt_defense(
            model, variables, iterations=args.iterations,
            input_npoint=DEFAULTS["input_npoint"],
            sample_npoint=DEFAULTS["sample_npoint"],
            compute_dtype=compute_dtype, interp_refresh=interp_refresh)
        out = defend(pc, key)
        float(out[0, 0, 0])  # compile + warmup
        t0 = time.time()
        for i in range(args.timed_batches):
            out = defend(pc, jax.random.fold_in(key, i))
        float(out[0, 0, 0])
        return args.timed_batches * args.batch / (time.time() - t0)

    f32_cps = measure(None, 1)
    fast_cps = measure("bfloat16", 16)
    _merge_out(args.out, {"jax_cpu": {
        "clouds_per_sec_f32": round(f32_cps, 4),
        "clouds_per_sec_bf16_r16": round(fast_cps, 4),
        "batch": args.batch, "iterations": args.iterations,
        "timed_batches": args.timed_batches,
    }})


# --------------------------------------------------------------------------
# flops leg: exact XLA cost analysis of the fused defense
# --------------------------------------------------------------------------

def flops_leg(args):
    import numpy as np

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from if_defense_tpu.defense import convonet_opt_defense
    from if_defense_tpu.implicit import ConvOccupancyNetwork

    model = ConvOccupancyNetwork()
    rng = np.random.default_rng(0)
    init_pc = jnp.asarray(rng.uniform(-0.45, 0.45, (2, 600, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = jnp.asarray(rng.normal(size=(args.batch, 1024, 3)) * 0.3,
                     jnp.float32)
    key = jax.random.key(1)

    out = {}
    for name, (dtype, refresh, repc) in {
            "f32": (None, 1, False),
            "bf16_r16": ("bfloat16", 16, False),
            "bf16_r16_repc": ("bfloat16", 16, True),
            "f32_r16_repc": (None, 16, True)}.items():
        defend = convonet_opt_defense(
            model, variables, iterations=args.iterations,
            input_npoint=DEFAULTS["input_npoint"],
            sample_npoint=DEFAULTS["sample_npoint"],
            compute_dtype=dtype, interp_refresh=refresh,
            rep_graph_cache=repc)
        cost = jax.jit(defend).lower(pc, key).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        out[f"flops_per_cloud_{name}"] = cost["flops"] / args.batch
        out[f"bytes_per_cloud_{name}"] = (
            cost.get("bytes accessed", 0.0) / args.batch)
    out.update(batch=args.batch, iterations=args.iterations)
    _merge_out(args.out, {"xla_cost": out})


# --------------------------------------------------------------------------
# summary leg: derived calibration numbers
# --------------------------------------------------------------------------

def summary_leg(args):
    with open(args.out) as f:
        data = json.load(f)
    t = data.get("torch_cpu")
    j = data.get("jax_cpu")
    c = data.get("xla_cost")
    if not (t and j and c):
        raise SystemExit("run the torch, jax and flops legs first")
    ref_flops = t["ref_flops_per_cloud"]
    same_host_f32 = j["clouds_per_sec_f32"] / t["clouds_per_sec"]
    same_host_fast = j["clouds_per_sec_bf16_r16"] / t["clouds_per_sec"]
    # measured FLOP efficiency of the torch pipeline on this CPU
    # (achieved matmul-convention FLOPs/s over the measured single-core
    # matmul peak), then that SAME efficiency applied to a V100's f32
    # peak -> calibrated anchor. For this pipeline shape (hundreds of
    # small unfused kernels per iteration, one host sync per step) GPU
    # efficiency does not exceed CPU efficiency, so the anchor is an
    # optimistic (high) estimate of the reference and the speedups
    # derived from it are conservative (low).
    eff = ref_flops * t["clouds_per_sec"] / t["matmul_peak_flops"]
    v100_anchor = eff * V100_F32_PEAK / ref_flops
    # the reference also cannot beat its own per-iteration dispatch
    # floor regardless of hardware (measured at near-zero-compute
    # shapes; GPU launch latency only adds to it)
    dispatch_bound = 192 / ((t["iterations"] + 1)
                            * t["overhead_sec_per_iter"])
    summary = {
        "torch_cpu_clouds_per_sec": t["clouds_per_sec"],
        "ref_flops_per_cloud": ref_flops,
        "torch_cpu_efficiency_vs_matmul_peak": round(eff, 4),
        "v100_anchor_clouds_per_sec": round(min(v100_anchor,
                                                dispatch_bound), 1),
        "v100_anchor_dispatch_bound": round(dispatch_bound, 1),
        "same_host_speedup_f32": round(same_host_f32, 3),
        "same_host_speedup_bf16_r16": round(same_host_fast, 3),
        "our_flops_per_cloud_f32": c["flops_per_cloud_f32"],
        "our_flops_per_cloud_bf16_r16": c.get("flops_per_cloud_bf16_r16"),
        "note": (
            "v100_anchor scales the torch reference's MEASURED FLOP "
            "efficiency on this CPU (matmul-convention FLOPs from "
            "FlopCounterMode over measured 1-core matmul peak) to V100 "
            "f32 peak, capped by the measured per-iteration dispatch "
            "floor at batch 192 — replacing bench.py's assumed 24 "
            "clouds/s +-2x model. same_host_speedup_* compares the two "
            "implementations on THIS CPU; ours trades gathers for "
            "einsum/matmul contractions (the right trade on the MXU, "
            "the wrong one on a 1-core scalar CPU), so it understates "
            "the TPU-fit by design. our_flops_per_cloud_* are exact XLA "
            "cost-analysis counts used by bench.py for TPU MFU."),
    }
    _merge_out(args.out, {"summary": summary})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", required=True,
                    choices=["torch", "jax", "flops", "summary"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iterations", type=int, default=200)
    ap.add_argument("--timed_batches", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ANCHOR_CALIBRATION.json"))
    args = ap.parse_args()
    {"torch": torch_leg, "jax": jax_leg,
     "flops": flops_leg, "summary": summary_leg}[args.leg](args)


if __name__ == "__main__":
    main()
