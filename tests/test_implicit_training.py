"""Occupancy-training tests on tiny synthetic shapes."""

import jax
import numpy as np

from if_defense_tpu.implicit import ConvOccupancyNetwork, OccupancyNetwork
from if_defense_tpu.implicit.training import (
    OccupancyBatchSampler,
    init_occupancy_model,
    make_occupancy_train_step,
)


def _toy_sampler(seed=0):
    rng = np.random.default_rng(seed)
    S, N, P = 4, 256, 512
    centers = rng.uniform(-0.2, 0.2, (S, 3))
    pcs, qs, occ = [], [], []
    for s in range(S):
        d = rng.normal(size=(N, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pcs.append(centers[s] + 0.25 * d)
        q = rng.uniform(-0.55, 0.55, (P, 3))
        qs.append(q)
        occ.append(np.linalg.norm(q - centers[s], axis=1) < 0.25)
    return OccupancyBatchSampler(
        pointcloud=np.stack(pcs).astype(np.float32),
        points=np.stack(qs).astype(np.float32),
        points_occ=np.stack(occ).astype(np.float32),
        pointcloud_n=64,
        points_subsample=128,
    )


def _train(model, steps=12):
    sampler = _toy_sampler()
    variables = init_occupancy_model(model, jax.random.key(0), 64)
    params = variables["params"]
    stats = variables.get("batch_stats")
    tx, step_fn = make_occupancy_train_step(model, 1e-3)
    opt_state = tx.init(params)
    losses = []
    for _ in range(steps):
        inputs, queries, occ = sampler.sample(4)
        params, stats, opt_state, m = step_fn(
            params, stats, opt_state, inputs, queries, occ)
        losses.append(float(m["loss"]))
    return losses


def test_convonet_occupancy_training_decreases_loss():
    losses = _train(ConvOccupancyNetwork())
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_onet_occupancy_training_decreases_loss():
    losses = _train(OccupancyNetwork())
    assert losses[-1] < losses[0]


def test_sampler_shapes():
    s = _toy_sampler()
    inputs, queries, occ = s.sample(3)
    assert inputs.shape == (3, 64, 3)
    assert queries.shape == (3, 128, 3)
    assert occ.shape == (3, 128)
    assert set(np.unique(occ)) <= {0.0, 1.0}
