"""Calibrate a torch-reference anchor for the MESH defense path.

VERDICT r4 item 4: ANCHOR_CALIBRATION.json calibrates only ConvONet-Opt;
the ONet-Mesh workload (`/root/reference/ONet/remesh_defense.py:128-171`,
MISE loop `ONet/im2mesh/onet/generation.py:112-130`) had repo-side
numbers but no reference-side anchor. This tool measures the reference's
mesh-defense device cost on THIS host's CPU and scales it to a V100
anchor with the same recipe as tools/calibrate_anchor.py.

What is timed (the reference's per-cloud device work, B=1 per cloud as
`remesh_defense.py` runs it):
  * SOR + preprocess + `encode_inputs` on the 300-point input
    (`remesh_defense.py:96-147`, config `pointcloud_n: 300`);
  * every `eval_points` decoder call of the MISE refinement loop
    (`generation.py:112-130`), batched at `points_batch_size` exactly as
    the reference splits them.

What is NOT timed (assumed free — each omission makes the anchor FASTER
than the real reference, so our reported speedups are conservative):
  * the MISE octree bookkeeping itself (C++ in the reference; the
    reference's Cython extensions cannot be built here — no Cython in
    the image — so a faithful numpy/python port of `mise.pyx` drives the
    refinement, EXCLUDED from the clock);
  * marching cubes, simplification, and trimesh surface sampling.

Because the torch model carries random weights (no pretrained .pth
exists in this environment), its outputs would give a degenerate
occupancy field and MISE would refine almost nothing. The refinement is
therefore driven by an ANALYTIC occupancy oracle (sphere / torus logits,
realistic surface topology and active-voxel counts); the torch decoder
is still evaluated on exactly the point batches the oracle-driven MISE
queries — same count, same shapes, same cost — and its outputs are
discarded. Point counts per cloud are recorded so the assumption is
auditable.

Legs (separate invocations so torch never shares the core with jax):

    python tools/calibrate_mesh_anchor.py --leg torch
    python tools/calibrate_mesh_anchor.py --leg host_proxy
    python tools/calibrate_mesh_anchor.py --leg summary

`summary` writes `mesh_summary` into ANCHOR_CALIBRATION.json and
`vs_baseline_calibrated` fields into BENCH_MESH.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference/ONet"
V100_F32_PEAK = 15.7e12

# reference generation config (configs/onet_mn40.yaml:34-40 +
# configs/default.yaml:60-74): resolution_0 32, upsampling_steps 2,
# threshold 0.2, padding 0.1 (generation box_size = 1 + padding)
RES0 = 32
UPSAMPLING_STEPS = 2
THRESHOLD = 0.2
PADDING = 0.1
POINTS_BATCH_SIZE = 100000
INPUT_NPOINT = 300     # data.pointcloud_n (remesh_defense.py:44)
SAMPLE_NPOINT = 1024
PADDING_SCALE = 0.9
SOR_K, SOR_ALPHA = 2, 1.1


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
# Faithful python port of the reference MISE octree (mise.pyx) — the
# UNTIMED refinement driver. Same query/update/subdivision semantics:
# grid points live at full-resolution integer coords; a leaf voxel below
# max depth subdivides when its adjacent known grid points straddle the
# logit threshold; each subdivision adds the 27-corner lattice of the
# voxel, querying only new points.
# --------------------------------------------------------------------------

class MiseSim:
    def __init__(self, resolution_0: int, depth: int, threshold: float):
        self.res0 = resolution_0
        self.depth = depth
        self.threshold = threshold
        self.vsize0 = 1 << depth
        self.resolution = resolution_0 * self.vsize0
        # voxel: [x, y, z, level, is_leaf, children(dict|None)]
        self.voxels: list[list] = []
        self.vox_children: list[dict | None] = []
        for i in range(resolution_0):
            for j in range(resolution_0):
                for k in range(resolution_0):
                    self.voxels.append(
                        [i * self.vsize0, j * self.vsize0, k * self.vsize0,
                         0, True])
                    self.vox_children.append(None)
        # grid points: insertion-ordered dict loc -> value (None=unknown)
        self.points: dict[tuple, float | None] = {}
        for i in range(resolution_0 + 1):
            for j in range(resolution_0 + 1):
                for k in range(resolution_0 + 1):
                    self.points[(i * self.vsize0, j * self.vsize0,
                                 k * self.vsize0)] = None

    def query(self):
        import numpy as np
        unknown = [loc for loc, v in self.points.items() if v is None]
        return np.asarray(unknown, dtype=np.int64).reshape(-1, 3)

    def _voxel_idx(self, x: int, y: int, z: int) -> int:
        r = self.resolution
        if not (0 <= x < r and 0 <= y < r and 0 <= z < r):
            return -1
        idx = ((x >> self.depth) * self.res0 + (y >> self.depth)) \
            * self.res0 + (z >> self.depth)
        rel = (x & (self.vsize0 - 1), y & (self.vsize0 - 1),
               z & (self.vsize0 - 1))
        vsize = self.vsize0
        while not self.voxels[idx][4]:
            vsize >>= 1
            ci = 1 if rel[0] >= vsize else 0
            cj = 1 if rel[1] >= vsize else 0
            ck = 1 if rel[2] >= vsize else 0
            idx = self.vox_children[idx][(ci, cj, ck)]
            rel = (rel[0] - ci * vsize, rel[1] - cj * vsize,
                   rel[2] - ck * vsize)
        return idx

    def update(self, pts, values) -> None:
        for (x, y, z), v in zip(map(tuple, pts.tolist()), values.tolist()):
            if (x, y, z) not in self.points:
                raise ValueError("Point not in grid!")
            self.points[(x, y, z)] = float(v)
        # subdivide: mark voxels adjacent to known points by side
        pos: set[int] = set()
        neg: set[int] = set()
        for (x, y, z), v in self.points.items():
            if v is None:
                continue
            for dx in (-1, 0):
                for dy in (-1, 0):
                    for dz in (-1, 0):
                        idx = self._voxel_idx(x + dx, y + dy, z + dz)
                        if idx < 0:
                            continue
                        if v >= self.threshold:
                            pos.add(idx)
                        if v <= self.threshold:
                            neg.add(idx)
        for idx in sorted(pos & neg):
            vx = self.voxels[idx]
            if vx[4] and vx[3] < self.depth:
                self._subdivide(idx)

    def _subdivide(self, idx: int) -> None:
        x0, y0, z0, level, _ = self.voxels[idx]
        new_level = level + 1
        size = 1 << (self.depth - new_level)
        self.voxels[idx][4] = False
        self.vox_children[idx] = {}
        for i in range(2):
            for j in range(2):
                for k in range(2):
                    self.vox_children[idx][(i, j, k)] = len(self.voxels)
                    self.voxels.append(
                        [x0 + i * size, y0 + j * size, z0 + k * size,
                         new_level, True])
                    self.vox_children.append(None)
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    loc = (x0 + i * size, y0 + j * size, z0 + k * size)
                    if loc not in self.points:
                        self.points[loc] = None


# --------------------------------------------------------------------------
# Analytic occupancy oracles (smooth logits; threshold-crossing surfaces
# with realistic active-voxel counts). Coordinates in the generation box
# [-box/2, box/2]^3 like generation.py:118-122.
# --------------------------------------------------------------------------

def _oracle(name: str):
    import numpy as np

    sharp = 40.0
    logit_thr = float(np.log(THRESHOLD) - np.log(1.0 - THRESHOLD))

    def sphere(p):
        return logit_thr + sharp * (0.35 - np.linalg.norm(p, axis=-1))

    def torus(p):
        ring = np.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2) - 0.3
        return logit_thr + sharp * (
            0.12 - np.sqrt(ring ** 2 + p[..., 2] ** 2))

    return {"sphere": sphere, "torus": torus}[name]


# --------------------------------------------------------------------------
# torch leg
# --------------------------------------------------------------------------

def _install_reference_shims():
    for name, attrs in [
            ("trimesh", ()),
            ("im2mesh.utils.libmcubes", ("marching_cubes",)),
            ("im2mesh.utils.libsimplify", ("simplify_mesh",)),
            ("im2mesh.utils.libmise", ("MISE",))]:
        mod = types.ModuleType(name)
        for a in attrs:
            setattr(mod, a, None)
        sys.modules[name] = mod


def torch_leg(args):
    import numpy as np
    import torch

    torch.manual_seed(0)
    _install_reference_shims()
    sys.path.insert(0, REF_ROOT)
    cwd = os.getcwd()
    os.chdir(REF_ROOT)
    try:
        import yaml
        if not hasattr(yaml, "_orig_load"):
            yaml._orig_load = yaml.load
            yaml.load = (lambda s, Loader=yaml.FullLoader:
                         yaml._orig_load(s, Loader=Loader))
        from im2mesh import config as rcfg
        cfg = rcfg.load_config("configs/onet_mn40.yaml",
                               "configs/default.yaml")
        model = rcfg.get_model(cfg, device=torch.device("cpu"),
                               dataset=None)
        from defense import SORDefense
    finally:
        os.chdir(cwd)
    model.eval()
    for p in model.parameters():
        p.requires_grad = False

    box = 1.0 + PADDING
    sor = SORDefense(k=SOR_K, alpha=SOR_ALPHA, sor_batch=32)

    def preprocess(one_pc: np.ndarray):
        # remesh_defense.py:96-125 minus .cuda()
        center = np.mean(one_pc, axis=0)
        centered = one_pc - center
        scale = (centered.max(axis=0) - centered.min(axis=0)).max()
        scaled = centered / scale * PADDING_SCALE
        if scaled.shape[0] > INPUT_NPOINT:
            idx = np.random.choice(scaled.shape[0], INPUT_NPOINT,
                                   replace=False)
            scaled = scaled[idx]
        return torch.from_numpy(scaled).float().unsqueeze(0)

    def defend_one(one_pc: np.ndarray, oracle):
        """One reference mesh defense; returns (timed_s, n_points,
        n_rounds). Only SOR/preprocess/encode + decoder evals are on the
        clock; the MISE port and the oracle are not."""
        timed = 0.0
        t0 = time.time()
        with torch.no_grad():
            sor_pc = sor(torch.from_numpy(one_pc).float().unsqueeze(0))
            inp = preprocess(sor_pc[0].numpy())
            c = model.encode_inputs(inp)
            z = model.get_z_from_prior((1,), sample=False)
        timed += time.time() - t0

        sim = MiseSim(RES0, UPSAMPLING_STEPS,
                      float(np.log(THRESHOLD) - np.log(1 - THRESHOLD)))
        n_points = 0
        n_rounds = 0
        pts = sim.query()
        while pts.shape[0] != 0:
            n_rounds += 1
            n_points += pts.shape[0]
            pf = box * (pts.astype(np.float64) / sim.resolution - 0.5)
            # timed: the reference's eval_points split
            # (generation.py:139-157), outputs discarded
            t0 = time.time()
            p_t = torch.from_numpy(pf.astype(np.float32))
            for chunk in torch.split(p_t, POINTS_BATCH_SIZE):
                with torch.no_grad():
                    model.decode(chunk.unsqueeze(0), z, c)
            timed += time.time() - t0
            sim.update(pts, oracle(pf))
            pts = sim.query()
        return timed, n_points, n_rounds

    rng = np.random.default_rng(0)
    clouds = [(rng.normal(size=(1024, 3)) * 0.3).astype(np.float32)
              for _ in range(args.clouds)]
    oracles = [_oracle("sphere" if i % 2 == 0 else "torus")
               for i in range(args.clouds)]

    defend_one(clouds[0], oracles[0])  # warmup
    per_cloud = []
    for pc, orc in zip(clouds, oracles):
        per_cloud.append(defend_one(pc, orc))
    total_s = sum(t for t, _, _ in per_cloud)
    clouds_s = len(per_cloud) / total_s
    pts_per_cloud = sum(n for _, n, _ in per_cloud) / len(per_cloud)

    # measured decode FLOPs per point + encode FLOPs per cloud
    from torch.utils.flop_counter import FlopCounterMode
    probe_n = 4096
    probe = torch.rand(1, probe_n, 3) - 0.5
    inp = torch.rand(1, INPUT_NPOINT, 3) - 0.5
    with FlopCounterMode(display=False) as fc_enc:
        with torch.no_grad():
            c = model.encode_inputs(inp)
            z = model.get_z_from_prior((1,), sample=False)
    with FlopCounterMode(display=False) as fc_dec:
        with torch.no_grad():
            model.decode(probe, z, c)
    enc_flops = fc_enc.get_total_flops()
    dec_flops_per_point = fc_dec.get_total_flops() / probe_n
    flops_per_cloud = enc_flops + dec_flops_per_point * pts_per_cloud

    a = torch.randn(1024, 1024)
    b = torch.randn(1024, 1024)
    a @ b
    t0 = time.time()
    for _ in range(10):
        a @ b
    matmul_peak = 10 * 2 * 1024 ** 3 / (time.time() - t0)

    _merge_out(args.out, {"torch_cpu_mesh": {
        "clouds_per_sec": round(clouds_s, 4),
        "sec_per_cloud": round(total_s / len(per_cloud), 3),
        "mise_points_per_cloud": round(pts_per_cloud, 1),
        "mise_rounds": [r for _, _, r in per_cloud],
        "ref_flops_per_cloud": flops_per_cloud,
        "decode_flops_per_point": dec_flops_per_point,
        "encode_flops_per_cloud": enc_flops,
        "matmul_peak_flops": matmul_peak,
        "clouds": args.clouds,
        "resolution_0": RES0, "upsampling_steps": UPSAMPLING_STEPS,
        "torch_version": torch.__version__,
    }})


def host_proxy_leg(args):
    """Time the per-cloud HOST work the device-only anchor assumes free,
    with proxies GENEROUS to the reference:

      * marching cubes + surface sampling → our fused native
        mt_sample kernel on the 129^3 dense grid (measured 8.6x faster
        than a split march+sample pipeline, and the reference
        additionally pays `MISE.to_dense()` + trimesh's python mesh
        construction before it can even start sampling);
      * the MISE octree bookkeeping itself stays UNTIMED (C++ in the
        reference and unbuildable here — no Cython in this image).
    """
    import numpy as np
    from if_defense_tpu import native

    res = RES0 * (1 << UPSAMPLING_STEPS)  # 128, grid 129^3
    box = 1.0 + PADDING
    lin = box * (np.arange(res + 1, dtype=np.float64) / res - 0.5)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    times = []
    for i in range(args.clouds + 1):  # +1 warmup
        vol = _oracle("sphere" if i % 2 == 0 else "torus")(
            g).astype(np.float32)
        t0 = time.time()
        pts = native.sample_isosurface(
            vol, float(np.log(THRESHOLD) - np.log(1 - THRESHOLD)),
            SAMPLE_NPOINT)
        dt = time.time() - t0
        assert pts.shape == (SAMPLE_NPOINT, 3)
        if i > 0:
            times.append(dt)
    _merge_out(args.out, {"mesh_host_proxy": {
        "sec_per_cloud": round(sum(times) / len(times), 4),
        "resolution": res, "clouds": args.clouds,
        "kernel": "native.sample_isosurface (fused march+sample)",
    }})


def summary_leg(args):
    with open(args.out) as f:
        cal = json.load(f)
    tm = cal["torch_cpu_mesh"]
    # identical recipe to the opt summary: achieved FLOP efficiency on
    # this CPU applied to V100 f32 peak — equivalently
    # clouds_s * (V100_peak / cpu_peak)
    eff = (tm["ref_flops_per_cloud"] * tm["clouds_per_sec"]
           / tm["matmul_peak_flops"])
    anchor_dev = eff * V100_F32_PEAK / tm["ref_flops_per_cloud"]
    mesh_summary = {
        "torch_cpu_mesh_clouds_per_sec": tm["clouds_per_sec"],
        "torch_cpu_mesh_efficiency_vs_matmul_peak": round(eff, 4),
        "v100_mesh_anchor_device_only_clouds_per_sec": round(
            anchor_dev, 2),
        "note": ("ONet-Mesh (MISE) anchor: reference decoder/encoder "
                 "measured on this CPU over the exact MISE-query point "
                 "batches (analytic oracle drives refinement), "
                 "efficiency scaled to V100 f32 peak. device_only "
                 "assumes ALL host work free (a strict upper bound on "
                 "the reference); the headline anchor adds the host "
                 "work per cloud measured by the mesh_host_proxy leg — "
                 "itself a proxy GENEROUS to the reference (our fused "
                 "native march+sample kernel stands in for its "
                 "to_dense + libmcubes + trimesh pipeline; MISE octree "
                 "bookkeeping still free)."),
    }
    hp = cal.get("mesh_host_proxy")
    if hp:
        anchor = 1.0 / (1.0 / anchor_dev + hp["sec_per_cloud"])
        mesh_summary["host_proxy_sec_per_cloud"] = hp["sec_per_cloud"]
        mesh_summary["v100_mesh_anchor_clouds_per_sec"] = round(anchor, 2)
    else:
        anchor = anchor_dev
        mesh_summary["v100_mesh_anchor_clouds_per_sec"] = round(anchor, 2)
    _merge_out(args.out, {"mesh_summary": mesh_summary})

    bm_path = os.path.join(os.path.dirname(args.out), "BENCH_MESH.json")
    if os.path.exists(bm_path):
        with open(bm_path) as f:
            bm = json.load(f)
        bm["calibrated_anchor_clouds_per_sec"] = round(anchor, 2)
        vs = {}
        for k, v in bm.get("results_cli_160_clouds", {}).items():
            vs[k] = round(v / anchor, 2)
        for k, v in bm.get("results_matrix_320_cloud_files", {}).items():
            vs[k] = round(v["median"] / anchor, 2)
        bm["vs_baseline_calibrated"] = vs
        bm["anchor_note"] = mesh_summary["note"]
        with open(bm_path, "w") as f:
            json.dump(bm, f, indent=1)
        print(json.dumps({"BENCH_MESH.vs_baseline_calibrated": vs},
                         indent=2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--leg", required=True,
                   choices=["torch", "host_proxy", "summary"])
    p.add_argument("--clouds", type=int, default=4)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ANCHOR_CALIBRATION.json"))
    args = p.parse_args()
    if args.leg == "torch":
        torch_leg(args)
    elif args.leg == "host_proxy":
        host_proxy_leg(args)
    else:
        summary_leg(args)


if __name__ == "__main__":
    main()
