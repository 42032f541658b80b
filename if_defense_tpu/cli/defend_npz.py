"""Baseline-defense CLI: apply SRS / SOR / DUP-Net to an npz file.

Mirrors `baselines/defend_npz.py:13-108`: reads `test_pc`, applies the
defense in fixed-size batches, writes `<defense>_<file>.npz` into a
`<defense>/` subfolder next to the input. SOR output is fixed-shape
(inliers first, cyclically duplicated padding) instead of ragged — see
`defense/sor.py` for why that is evaluation-equivalent.

Usage:
    python -m if_defense_tpu.cli.defend_npz --data_root adv.npz \
        [--defense srs|sor|dup] [--punet_weights weights/punet_1024_up4.npz]
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import numpy as np

from if_defense_tpu.data import load_npz, save_npz
from if_defense_tpu.defense import DUPNet, sor_defense_fixed, srs_defense
from if_defense_tpu.parallel import best_data_mesh, replicate, shard_batch
from if_defense_tpu.utils.cache import BoundedCache
from if_defense_tpu.utils.params_io import load_params_npz

DEFAULT_PUNET_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "weights",
    "punet_1024_up4.npz",
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Apply baseline defenses to npz")
    p.add_argument("--data_root", required=True,
                   help="npz file or directory of npz files")
    p.add_argument("--defense", default="", choices=["", "srs", "sor", "dup"],
                   help="apply all three if unspecified")
    p.add_argument("--srs_drop_num", type=int, default=500)
    p.add_argument("--sor_k", type=int, default=2)
    p.add_argument("--sor_alpha", type=float, default=1.1)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--npoint", type=int, default=1024,
                   help="DUP-Net PU-Net input size")
    p.add_argument("--punet_weights", default=DEFAULT_PUNET_WEIGHTS)
    p.add_argument("--seed", type=int, default=1)
    return p.parse_args(argv)


_DEFENSE_CACHE = BoundedCache()


def build_defense_fn(name: str, args, mesh=None):
    """Return (fn(batch_pc, key) -> np.ndarray, output_points).

    With a mesh, batches are sharded on dp (params replicated) so each
    defense runs SPMD over the devices. Cached per config across main()
    invocations in one process: through the remote-compile tunnel a jit
    rebuild (DUP-Net especially) costs more than defending a whole file.
    The PU-Net weights' mtime is in the key so re-converted weights at
    the same path are picked up; FIFO-bounded.
    """
    wpath = os.path.abspath(args.punet_weights)
    wmtime = os.path.getmtime(wpath) if os.path.exists(wpath) else None
    key = (name, args.srs_drop_num, args.sor_k, args.sor_alpha,
           args.npoint, wpath, wmtime, args.batch_size, mesh is not None)
    return _DEFENSE_CACHE.get_or_build(
        key, lambda: _build_defense_fn(name, args, mesh))


def _build_defense_fn(name: str, args, mesh=None):
    if name == "srs":
        fn = jax.jit(
            functools.partial(srs_defense, drop_num=args.srs_drop_num)
        )
        return lambda pc, key: np.asarray(fn(pc, key=key)), None
    if name == "sor":
        fn = jax.jit(
            functools.partial(sor_defense_fixed, k=args.sor_k,
                              alpha=args.sor_alpha)
        )

        def run(pc, key):
            out, _count = fn(pc)
            return np.asarray(out)

        return run, None
    if name == "dup":
        dup = DUPNet(sor_k=args.sor_k, sor_alpha=args.sor_alpha,
                     npoint=args.npoint, up_ratio=4)
        variables = load_params_npz(args.punet_weights)
        if mesh is not None:
            variables = replicate(variables, mesh)
        call = jax.jit(lambda pc, key: dup(variables, pc, key))
        return lambda pc, key: np.asarray(call(pc, key)), args.npoint * 4
    raise ValueError(name)


def defend_file(path: str, name: str, args, run=None) -> str:
    d = load_npz(path)
    test_pc = d.test_pc[..., :3].astype(np.float32)
    mesh = best_data_mesh(args.batch_size)
    if run is None:
        run, _ = build_defense_fn(name, args, mesh)

    key = jax.random.key(args.seed)
    outs = []
    B = args.batch_size
    n = len(test_pc)
    for i in range(0, n, B):
        batch = test_pc[i : i + B]
        pad = B - len(batch)
        if pad:
            batch = np.concatenate([batch, batch[-1:].repeat(pad, 0)], 0)
        key, sub = jax.random.split(key)
        out = run(shard_batch(batch, mesh), sub)
        outs.append(out[: B - pad] if pad else out)
    def_pc = np.concatenate(outs, 0)

    folder = os.path.join(os.path.dirname(os.path.abspath(path)), name)
    save_path = os.path.join(folder, f"{name}_{os.path.basename(path)}")
    save_npz(
        save_path,
        {"test_pc": def_pc, "test_label": d.test_label,
         "target_label": d.target_label},
    )
    print(f"{name} defense saved to {save_path}")
    return save_path


def main(argv=None):
    args = parse_args(argv)
    defenses = [args.defense] if args.defense else ["srs", "sor", "dup"]
    paths = []
    if os.path.isdir(args.data_root):
        files = [
            os.path.join(args.data_root, f)
            for f in sorted(os.listdir(args.data_root))
            if os.path.isfile(os.path.join(args.data_root, f))
        ]
    else:
        files = [args.data_root]
    mesh = best_data_mesh(args.batch_size)
    for name in defenses:
        # one jitted defense per name — its compile cache covers all files
        run, _ = build_defense_fn(name, args, mesh)
        for f in files:
            paths.append(defend_file(f, name, args, run))
    return paths


if __name__ == "__main__":
    main()
