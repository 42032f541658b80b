"""Training engine for victim classifiers.

Recipe parity with `baselines/train.py` / `hybrid_train.py`: Adam(lr 1e-3,
weight-decay 1e-4), cosine anneal to 1e-5 over the epoch budget, cross
entropy (optional eps-0.2 label smoothing — `baselines/util/utils.py:17-34`),
optional PointNet feature-transform regulariser.

TPU-first: one jitted train step (forward+backward+update fused by XLA),
data parallelism by sharding the batch axis over the device mesh — no DDP,
no gradient-allreduce code; XLA inserts the collectives from the sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from if_defense_tpu.models import feature_transform_regularizer


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, smoothing: bool = False
) -> jax.Array:
    """CE loss, optionally with eps=0.2 label smoothing."""
    n_class = logits.shape[-1]
    if smoothing:
        eps = 0.2
        one_hot = jax.nn.one_hot(labels, n_class)
        soft = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (n_class - 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(soft * logp, axis=-1))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jax.Array,
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
    total_epochs: int = 200,
    steps_per_epoch: int = 1,
    eta_min: float = 1e-5,
) -> TrainState:
    """Initialise parameters and the Adam+cosine schedule."""
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng}, sample_input, train=True
    )
    schedule = optax.cosine_decay_schedule(
        init_value=learning_rate,
        decay_steps=max(1, total_epochs * steps_per_epoch),
        alpha=eta_min / learning_rate,
    )
    # torch Adam weight_decay is L2 added to the gradient (not decoupled)
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats"),
    )


def make_train_step(model, smoothing: bool = False, fea_reg_weight: float = 0.0):
    """Build the jitted train step: (state, xyz, label, rng) -> (state, metrics)."""

    @jax.jit
    def train_step(state: TrainState, xyz, label, dropout_rng):
        def loss_fn(params):
            (logits, aux), updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                xyz,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss = cross_entropy_loss(logits, label, smoothing)
            if fea_reg_weight > 0.0 and "trans_feat" in aux:
                loss = loss + fea_reg_weight * feature_transform_regularizer(
                    aux["trans_feat"]
                )
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        acc = jnp.mean(jnp.argmax(logits, -1) == label)
        return state, {"loss": loss, "acc": acc}

    return train_step


def make_eval_step(model):
    """Build the jitted eval step: (variables, xyz) -> logits.

    `variables` is a plain dict {"params": ..., "batch_stats": ...} so both
    TrainState-backed and raw-checkpoint eval use the same step.
    """

    @jax.jit
    def eval_step(variables, xyz):
        logits, _ = model.apply(variables, xyz, train=False)
        return logits

    return eval_step


def eval_variables(state) -> dict:
    """Extract the eval variable dict from a TrainState-like object."""
    variables = {"params": state.params}
    if getattr(state, "batch_stats", None) is not None:
        variables["batch_stats"] = state.batch_stats
    return variables


@dataclasses.dataclass
class AverageMeter:
    """Running average accumulator (`baselines/util/utils.py:58-74`)."""

    sum: float = 0.0
    count: int = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
