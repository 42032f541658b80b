"""Victim-model smoke + behavioural tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from if_defense_tpu.models import build_model, feature_transform_regularizer

B, N, NC = 2, 64, 40


def _init_and_apply(name, train=False, **kwargs):
    model = build_model(name, num_classes=NC, **kwargs)
    xyz = jax.random.normal(jax.random.key(0), (B, N, 3))
    variables = model.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        xyz,
        train=True,
    )
    if train:
        (logits, aux), updates = model.apply(
            variables,
            xyz,
            train=True,
            rngs={"dropout": jax.random.key(3)},
            mutable=["batch_stats"],
        )
        return logits, aux, variables, updates
    logits, aux = model.apply(variables, xyz, train=False)
    return logits, aux, variables, None


@pytest.mark.parametrize("name", ["pointnet", "pointnet2", "dgcnn", "pointconv", "rscnn"])
def test_forward_shape(name):
    logits, aux, _, _ = _init_and_apply(name)
    assert logits.shape == (B, NC)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ["pointnet", "dgcnn"])
def test_train_mode_updates_batch_stats(name):
    logits, aux, variables, updates = _init_and_apply(name, train=True)
    assert "batch_stats" in updates
    # at least one running stat must move away from init
    leaves = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_pointnet_aux_transform():
    logits, aux, _, _ = _init_and_apply("pointnet")
    assert aux["trans"].shape == (B, 3, 3)
    reg = feature_transform_regularizer(aux["trans"])
    assert np.isfinite(float(reg))


def test_pointnet_input_gradient_flows():
    """White-box attacks need d logits / d xyz."""
    model = build_model("pointnet", num_classes=NC)
    xyz = jax.random.normal(jax.random.key(0), (B, N, 3))
    variables = model.init(
        {"params": jax.random.key(1), "dropout": jax.random.key(2)},
        xyz,
        train=True,
    )

    def loss(x):
        logits, _ = model.apply(variables, x, train=False)
        return logits[:, 0].sum()

    g = jax.grad(loss)(xyz)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_registry_error():
    with pytest.raises(ValueError, match="unknown model"):
        build_model("nope")
