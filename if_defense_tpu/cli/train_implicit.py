"""Implicit-network (ONet / ConvONet) occupancy training CLI.

Produces the pretrained weights the IF-Defense drivers consume
(equivalent role to `pretrain/onet.pth` / `pretrain/convonet.pth` in the
reference configs). Input: an occupancy npz built by
`tools/build_occupancy_dataset.py` (or any npz with pointcloud / points /
points_occ arrays).

Usage:
    python -m if_defense_tpu.cli.train_implicit --variant convonet \
        --data occ_mn40.npz --steps 100000 --output weights/convonet_mn40
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from if_defense_tpu.implicit import ConvOccupancyNetwork, OccupancyNetwork
from if_defense_tpu.implicit.training import (
    OccupancyBatchSampler,
    init_occupancy_model,
    make_occupancy_train_step,
)
from if_defense_tpu.utils import MetricsWriter
from if_defense_tpu.utils.params_io import save_params_npz


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train an occupancy network")
    p.add_argument("--variant", default="convonet",
                   choices=["convonet", "onet"])
    p.add_argument("--data", required=True, help="occupancy npz")
    p.add_argument("--val_data", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--pointcloud_n", type=int, default=None,
                   help="encoder input points (default 600 conv/300 onet)")
    p.add_argument("--pointcloud_noise", type=float, default=0.005)
    p.add_argument("--points_subsample", type=int, default=2048)
    p.add_argument("--log_every", type=int, default=200)
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--output", default="weights/implicit")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".",
                exist_ok=True)
    metrics = MetricsWriter(args.output + ".metrics.jsonl")

    if args.variant == "convonet":
        model = ConvOccupancyNetwork()
        pointcloud_n = args.pointcloud_n or 600
    else:
        model = OccupancyNetwork()
        pointcloud_n = args.pointcloud_n or 300

    with np.load(args.data) as npz:
        sampler = OccupancyBatchSampler(
            pointcloud=npz["pointcloud"],
            points=npz["points"],
            points_occ=npz["points_occ"],
            pointcloud_n=pointcloud_n,
            pointcloud_noise=args.pointcloud_noise,
            points_subsample=args.points_subsample,
            seed=args.seed,
        )

    variables = init_occupancy_model(
        model, jax.random.key(args.seed), pointcloud_n)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx, train_step = make_occupancy_train_step(model, args.lr)
    opt_state = tx.init(params)

    t0 = time.time()
    for step in range(1, args.steps + 1):
        inputs, queries, occ = sampler.sample(args.batch_size)
        params, batch_stats, opt_state, m = train_step(
            params, batch_stats, opt_state, inputs, queries, occ)
        if step % args.log_every == 0 or step == args.steps:
            metrics.write(step=step, loss=float(m["loss"]),
                          acc=float(m["acc"]),
                          steps_per_sec=step / (time.time() - t0))
        if step % args.save_every == 0 or step == args.steps:
            out = {"params": params}
            if batch_stats is not None:
                out["batch_stats"] = batch_stats
            save_params_npz(
                args.output + ".npz", jax.tree.map(np.asarray, out))
    print(f"weights saved to {args.output}.npz")
    return args.output + ".npz"


if __name__ == "__main__":
    main()
