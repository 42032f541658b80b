"""Occupancy-network training (ONet / ConvONet).

The reference defense repos consume pretrained `.pth` weights
(`ONet/configs/onet_mn40.yaml` test.model_file) trained with the original
Occupancy-Networks recipe; this module provides that training loop natively
so weights can be produced inside the framework: BCE on occupancy labels of
query points, conditioned on a noisy surface pointcloud (pointcloud_n
points + sigma 0.005 noise, points_subsample 2048 queries — the values in
`{ONet,ConvONet}/configs/*_mn40.yaml`), Adam 1e-4.

Dataset format (one npz): per-shape arrays
    pointcloud [S, N, 3]   surface samples (encoder input pool)
    points     [S, P, 3]   query points in the padded unit cube
    points_occ [S, P]      occupancy labels {0, 1}
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class OccupancyBatchSampler:
    """Host-side batch sampler over the occupancy npz arrays."""

    pointcloud: np.ndarray
    points: np.ndarray
    points_occ: np.ndarray
    pointcloud_n: int = 300
    pointcloud_noise: float = 0.005
    points_subsample: int = 2048
    seed: int = 0

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)

    def __len__(self):
        return len(self.pointcloud)

    def sample(self, batch_size: int):
        """Returns (inputs [B, n, 3], queries [B, p, 3], occ [B, p])."""
        idx = self.rng.integers(0, len(self.pointcloud), batch_size)
        pcs = self.pointcloud[idx]
        sel = self.rng.integers(
            0, pcs.shape[1], (batch_size, self.pointcloud_n))
        inputs = np.take_along_axis(pcs, sel[..., None], axis=1)
        inputs = inputs + self.rng.normal(
            0, self.pointcloud_noise, inputs.shape)
        qsel = self.rng.integers(
            0, self.points.shape[1], (batch_size, self.points_subsample))
        queries = np.take_along_axis(self.points[idx], qsel[..., None], 1)
        occ = np.take_along_axis(self.points_occ[idx], qsel, 1)
        return (
            inputs.astype(np.float32),
            queries.astype(np.float32),
            occ.astype(np.float32),
        )


def make_occupancy_train_step(model, learning_rate: float = 1e-4):
    """Jitted step: (params_state, inputs, queries, occ) -> (state, metrics).

    state = (variables, opt_state). For ONet the CBN decoder carries batch
    stats (updated in train mode); ConvONet has none.
    """
    tx = optax.adam(learning_rate)

    def loss_fn(params, batch_stats, inputs, queries, occ):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            (logits), updates = model.apply(
                variables, inputs, queries, train=True,
                mutable=["batch_stats"],
            )
            new_stats = updates["batch_stats"]
        else:
            logits = model.apply(variables, inputs, queries)
            new_stats = None
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, occ))
        acc = jnp.mean((logits > 0) == (occ > 0.5))
        return loss, (acc, new_stats)

    @jax.jit
    def train_step(params, batch_stats, opt_state, inputs, queries, occ):
        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, inputs, queries, occ)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, {"loss": loss, "acc": acc}

    return tx, train_step


def init_occupancy_model(model, key, pointcloud_n=300, points_subsample=64):
    inputs = jnp.zeros((1, pointcloud_n, 3))
    queries = jnp.zeros((1, points_subsample, 3))
    try:
        return model.init(key, inputs, queries, train=True)
    except TypeError:
        return model.init(key, inputs, queries)
