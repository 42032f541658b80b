"""Training-engine tests: loss decreases, checkpoint round-trips, sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.models import build_model
from if_defense_tpu.parallel import best_data_mesh, data_parallel_mesh, shard_batch
from if_defense_tpu.training import (
    create_train_state,
    cross_entropy_loss,
    eval_variables,
    make_eval_step,
    make_train_step,
)


def test_cross_entropy_matches_manual():
    logits = jnp.array([[2.0, 0.0, -1.0], [0.0, 3.0, 0.0]])
    labels = jnp.array([0, 1])
    got = float(cross_entropy_loss(logits, labels))
    p = jax.nn.log_softmax(logits)
    want = -float((p[0, 0] + p[1, 1]) / 2)
    assert abs(got - want) < 1e-6


def test_smoothing_loss_larger_for_confident_preds():
    logits = jnp.array([[10.0, -10.0]])
    labels = jnp.array([0])
    plain = float(cross_entropy_loss(logits, labels, smoothing=False))
    smooth = float(cross_entropy_loss(logits, labels, smoothing=True))
    assert smooth > plain


def test_train_step_decreases_loss():
    model = build_model("pointnet", num_classes=4)
    rng = np.random.default_rng(0)
    xyz = jnp.array(rng.normal(size=(8, 32, 3)), jnp.float32)
    label = jnp.array(rng.integers(0, 4, 8))
    state = create_train_state(
        model, jax.random.key(0), xyz, learning_rate=1e-3,
        total_epochs=1, steps_per_epoch=30,
    )
    step = make_train_step(model)
    losses = []
    for i in range(8):
        state, m = step(state, xyz, label, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(tmp_path):
    from if_defense_tpu.utils import restore_checkpoint, save_checkpoint
    from if_defense_tpu.utils.checkpoint import restore_checkpoint_raw

    model = build_model("pointnet", num_classes=4)
    xyz = jnp.zeros((2, 16, 3))
    state = create_train_state(model, jax.random.key(0), xyz)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, {"model": "pointnet", "acc": 0.9})
    state2, meta = restore_checkpoint(path, state)
    assert meta["model"] == "pointnet"
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    raw = restore_checkpoint_raw(path)
    assert raw["metadata"]["acc"] == 0.9


def test_sharded_eval_matches_single_device():
    model = build_model("pointnet", num_classes=4)
    xyz = jnp.array(np.random.default_rng(0).normal(size=(8, 32, 3)), jnp.float32)
    state = create_train_state(model, jax.random.key(0), xyz)
    ev = make_eval_step(model)
    variables = eval_variables(state)
    logits_single = np.asarray(ev(variables, xyz))

    mesh = data_parallel_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.devices.size == 8
    xyz_sharded = shard_batch(xyz, mesh)
    logits_sharded = np.asarray(ev(variables, xyz_sharded))
    np.testing.assert_allclose(logits_single, logits_sharded, atol=2e-5)


def test_best_data_mesh_divisibility():
    mesh = best_data_mesh(6)
    assert 6 % mesh.devices.size == 0
