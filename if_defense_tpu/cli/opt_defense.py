"""IF-Defense optimisation CLI (ONet-Opt / ConvONet-Opt).

Mirrors `{ONet,ConvONet}/opt_defense.py`: reads npz, restores every test
(and optionally train) cloud by implicit-surface optimisation, writes
`<variant>_opt-<file>.npz` into a `<Variant>-Opt/` subfolder.

Usage:
    python -m if_defense_tpu.cli.opt_defense --variant convonet \
        --data_root adv.npz --weights weights/convonet_mn40.npz
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from if_defense_tpu.data import load_npz, save_npz
from if_defense_tpu.defense.ifdefense import (
    convonet_opt_defense,
    onet_opt_defense,
)
from if_defense_tpu.implicit import ConvOccupancyNetwork, OccupancyNetwork
from if_defense_tpu.parallel import best_data_mesh, replicate, shard_batch
from if_defense_tpu.utils import MetricsWriter
from if_defense_tpu.utils.cache import BoundedCache
from if_defense_tpu.utils.params_io import load_params_npz


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="IF-Defense opt restoration")
    p.add_argument("--variant", default="convonet",
                   choices=["convonet", "onet"])
    p.add_argument("--data_root", required=True,
                   help="npz file or directory")
    p.add_argument("--weights", required=True,
                   help="pretrained implicit-model params npz")
    p.add_argument("--train", action="store_true",
                   help="also defend train_pc (hybrid training data)")
    p.add_argument("--sample_npoint", type=int, default=1024)
    p.add_argument("--padding_scale", type=float, default=0.9)
    p.add_argument("--init_sigma", type=float, default=0.01)
    p.add_argument("--iterations", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=192)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--rep_weight", type=float, default=500.0)
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--no_sor", action="store_true")
    p.add_argument("--sor_k", type=int, default=2)
    p.add_argument("--sor_alpha", type=float, default=1.1)
    p.add_argument("--knn_refresh", type=int, default=1,
                   help="rebuild the repulsion kNN graph every R "
                        "iterations (1 = reference semantics)")
    p.add_argument("--exact_knn", action="store_true",
                   help="exact top-k repulsion neighbour selection "
                        "instead of the fused/approx kernel (slower; "
                        "strict reference semantics)")
    p.add_argument("--interp_refresh", type=int, default=1,
                   help="refresh the decoder's cached bilinear corner "
                        "features every R iterations (convonet only; "
                        "1 = reference semantics, 8 measured "
                        "accuracy-neutral and ~1.7x faster)")
    p.add_argument("--compute_dtype", default=None,
                   choices=[None, "bfloat16"],
                   help="run the decoder/repulsion fwd+bwd in bf16 "
                        "(f32 master points + Adam; ~1.7x faster, "
                        "accuracy-neutral in our experiments)")
    p.add_argument("--rep_graph_cache", action="store_true",
                   help="freeze the repulsion neighbour graph per "
                        "corner-cache window (requires "
                        "--interp_refresh > 1; skips the k-selection "
                        "scan each step — accuracy-validated deviation "
                        "from per-step graphs)")
    p.add_argument("--seed", type=int, default=1)
    return p.parse_args(argv)


_DEFEND_CACHE = BoundedCache()


def build_defend_fn(args):
    """Build (defend_fn, mesh): the fused defense, data-parallel over the
    device mesh (params replicated, cloud batches sharded on dp).

    Cached per (variant, weights file, config): through the remote-
    compile tunnel a jit-cache miss costs ~15 s — far more than the
    device work on a 320-cloud file — so repeated main() calls in one
    process (benchmark drivers, pipelines defending many files) must
    reuse the compiled defense instead of rebuilding the closure.
    """
    common = dict(
        sample_npoint=args.sample_npoint,
        padding_scale=args.padding_scale,
        init_sigma=args.init_sigma,
        iterations=args.iterations,
        lr=args.lr,
        rep_weight=args.rep_weight,
        threshold=args.threshold,
        sor=not args.no_sor,
        sor_k=args.sor_k,
        sor_alpha=args.sor_alpha,
        knn_refresh=args.knn_refresh,
        exact_knn=args.exact_knn,
        compute_dtype=args.compute_dtype,
    )
    if args.variant == "convonet":
        common["interp_refresh"] = args.interp_refresh
        common["rep_graph_cache"] = args.rep_graph_cache
    wpath = os.path.abspath(args.weights)
    key = (args.variant, wpath, os.path.getmtime(wpath),
           args.batch_size, tuple(sorted(common.items())))

    def build():
        mesh = best_data_mesh(args.batch_size)
        variables = replicate(load_params_npz(args.weights), mesh)
        if args.variant == "convonet":
            fn = convonet_opt_defense(
                ConvOccupancyNetwork(), variables, **common)
        else:
            fn = onet_opt_defense(OccupancyNetwork(), variables, **common)
        return fn, mesh

    return _DEFEND_CACHE.get_or_build(key, build)


def defend_clouds(defend, mesh, pc: np.ndarray, args) -> np.ndarray:
    """Batch the jitted defense over all clouds (padding the tail).

    Each batch is sharded over the mesh's dp axis before the call, so the
    201-step restoration runs SPMD across all devices.
    """
    key = jax.random.key(args.seed)
    B = args.batch_size
    outs = []
    for i in range(0, len(pc), B):
        batch = pc[i : i + B].astype(np.float32)
        pad = B - len(batch)
        if pad:
            batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)], 0)
        key, sub = jax.random.split(key)
        out = np.asarray(defend(shard_batch(batch, mesh), sub))
        outs.append(out[: B - pad] if pad else out)
    return np.concatenate(outs, 0)


def get_save_name(path: str, variant: str) -> str:
    folder = os.path.join(
        os.path.dirname(os.path.abspath(path)),
        "ConvONet-Opt" if variant == "convonet" else "ONet-Opt",
    )
    return os.path.join(
        folder, f"{variant}_opt-{os.path.basename(path)}"
    )


def defend_file(path: str, defend, mesh, args) -> str:
    d = load_npz(path)
    t0 = time.time()
    out = {"test_label": d.test_label}
    if d.target_label is not None:
        out["target_label"] = d.target_label
    out["test_pc"] = defend_clouds(defend, mesh, d.test_pc[..., :3], args)
    n = len(out["test_pc"])
    if args.train:
        out["train_pc"] = defend_clouds(
            defend, mesh, d.train_pc[..., :3], args)
        out["train_label"] = d.train_label
        n += len(out["train_pc"])
    dt = time.time() - t0
    save_path = get_save_name(path, args.variant)
    save_npz(save_path, out)
    MetricsWriter(save_path + ".metrics.jsonl").write(
        variant=args.variant, data=path, clouds=n, seconds=dt,
        clouds_per_sec=n / max(dt, 1e-9), output=save_path,
    )
    print(f"defense result saved to {save_path} "
          f"({n} clouds in {dt:.1f}s, {n / max(dt, 1e-9):.2f} clouds/s)")
    return save_path


def main(argv=None):
    args = parse_args(argv)
    defend, mesh = build_defend_fn(args)
    if os.path.isdir(args.data_root):
        files = [
            os.path.join(args.data_root, f)
            for f in sorted(os.listdir(args.data_root))
            if os.path.isfile(os.path.join(args.data_root, f))
        ]
    else:
        files = [args.data_root]
    return [defend_file(f, defend, mesh, args) for f in files]


if __name__ == "__main__":
    main()
