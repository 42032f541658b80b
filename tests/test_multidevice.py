"""Multi-device SPMD equivalence for the product paths.

The reference's whole DDP story lives in its attack drivers
(`baselines/attack_scripts/targeted_perturb_attack.py:99-130`): shard the
batch over ranks, run the same computation, merge shards. Here that is
batch-axis sharding over the device mesh — these tests run the ATTACK and
the FUSED DEFENSE on the 8-device CPU mesh and assert the outputs match
the single-device run (same keys, same math; only the partitioning
differs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.attack.cw import cw_perturb
from if_defense_tpu.defense import convonet_opt_defense
from if_defense_tpu.implicit import ConvOccupancyNetwork
from if_defense_tpu.models import build_model
from if_defense_tpu.parallel import (
    data_parallel_mesh,
    replicate,
    shard_batch,
)
from if_defense_tpu.training import create_train_state, eval_variables


def _tiny_victim(num_classes=4, n=32, b=8):
    model = build_model("pointnet", num_classes=num_classes)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(b, n, 3)), jnp.float32)
    state = create_train_state(model, jax.random.key(0), pc)
    variables = eval_variables(state)
    return model, variables, pc


def test_sharded_cw_perturb_matches_single_device():
    model, variables, pc = _tiny_victim()
    target = jnp.asarray(np.arange(8) % 4)
    key = jax.random.key(1)

    def make_logits_fn(v):
        def logits_fn(x):
            logits, _ = model.apply(v, x, train=False)
            return logits
        return logits_fn

    _, adv_single, succ_single = cw_perturb(
        make_logits_fn(variables), pc, target, key,
        binary_step=2, num_iter=8)

    mesh = data_parallel_mesh()
    assert mesh.devices.size == 8
    v_rep = replicate(variables, mesh)
    pc_sh = shard_batch(np.asarray(pc), mesh)
    tgt_sh = shard_batch(np.asarray(target), mesh)
    _, adv_sharded, succ_sharded = cw_perturb(
        make_logits_fn(v_rep), pc_sh, tgt_sh, key,
        binary_step=2, num_iter=8)

    np.testing.assert_array_equal(
        np.asarray(succ_single), np.asarray(succ_sharded))
    np.testing.assert_allclose(
        np.asarray(adv_single), np.asarray(adv_sharded), atol=1e-5)


def test_sharded_opt_defense_matches_single_device():
    conv = ConvOccupancyNetwork()
    init_pc = jnp.zeros((2, 32, 3))
    variables = conv.init(jax.random.key(2), init_pc, init_pc)
    rng = np.random.default_rng(3)
    pc = np.asarray(rng.normal(size=(8, 96, 3)), np.float32) * 0.3
    key = jax.random.key(4)

    kwargs = dict(iterations=3, input_npoint=32, sample_npoint=64)
    defend_single = convonet_opt_defense(conv, variables, **kwargs)
    out_single = np.asarray(defend_single(jnp.asarray(pc), key))

    mesh = data_parallel_mesh()
    defend_sharded = convonet_opt_defense(
        conv, replicate(variables, mesh), **kwargs)
    out_sharded = np.asarray(defend_sharded(shard_batch(pc, mesh), key))

    assert np.isfinite(out_sharded).all()
    np.testing.assert_allclose(out_single, out_sharded, atol=1e-5)


def test_sharded_opt_defense_bench_config_matches_single_device(
        monkeypatch):
    """The BENCH configuration (bf16 inner loop + corner-cache
    interp_refresh + FUSED Pallas repulsion, forced into interpret mode
    here) sharded over the 8-device mesh must match the single-device
    run — the path the TPU actually executes is the path this exercises
    (VERDICT r2 item 3)."""
    monkeypatch.setenv("IFDEF_FORCE_FUSED_REPULSION", "1")
    conv = ConvOccupancyNetwork()
    init_pc = jnp.zeros((2, 32, 3))
    variables = conv.init(jax.random.key(6), init_pc, init_pc)
    rng = np.random.default_rng(7)
    pc = np.asarray(rng.normal(size=(8, 96, 3)), np.float32) * 0.3
    key = jax.random.key(8)

    # sample_npoint=256: smallest fused-kernel-supported tile size
    kwargs = dict(iterations=17, input_npoint=32, sample_npoint=256,
                  compute_dtype="bfloat16", interp_refresh=8)
    defend_single = convonet_opt_defense(conv, variables, **kwargs)
    out_single = np.asarray(defend_single(jnp.asarray(pc), key))

    mesh = data_parallel_mesh()
    defend_sharded = convonet_opt_defense(
        conv, replicate(variables, mesh), **kwargs)
    out_sharded = np.asarray(defend_sharded(shard_batch(pc, mesh), key))

    assert np.isfinite(out_sharded).all()
    # identical math per example; partition-order bf16 reductions drift a
    # few points by <1e-3 over the 17 iterations (observed 6/6144 at
    # 7.5e-4), everything else matches to fp roundoff
    np.testing.assert_allclose(out_single, out_sharded, atol=1.5e-3)


def test_fused_repulsion_grad_under_sharded_jit(monkeypatch):
    """fused_repulsion_loss (custom_vjp pallas_call) value+grad under a
    dp-sharded jit == unsharded == the XLA formulation."""
    from if_defense_tpu.ops.pallas_repulsion import fused_repulsion_loss

    mesh = data_parallel_mesh()
    rng = np.random.default_rng(9)
    pc = jnp.asarray(rng.normal(size=(8, 256, 3)), jnp.float32) * 0.3
    pc_sh = shard_batch(np.asarray(pc), mesh)

    loss = jax.jit(lambda p: fused_repulsion_loss(p))
    grad = jax.jit(jax.grad(lambda p: fused_repulsion_loss(p).sum()))

    np.testing.assert_allclose(
        np.asarray(loss(pc)), np.asarray(loss(pc_sh)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grad(pc)), np.asarray(grad(pc_sh)), atol=1e-6)

    # and the fused kernel agrees with the XLA exact formulation
    from if_defense_tpu.defense.repulsion import repulsion_loss

    ref = np.asarray(repulsion_loss(pc, exact=True))
    np.testing.assert_allclose(np.asarray(loss(pc_sh)), ref, atol=1e-5)


def test_sharded_dense_mesh_eval_matches_single_device():
    """The mesh defense's device-side core (encode + dense-lattice
    occupancy evaluation) sharded on dp must match single-device values
    (`cli/remesh_defense.py` shards exactly this)."""
    from if_defense_tpu.implicit.generation import make_convonet_dense_eval

    model = ConvOccupancyNetwork(plane_resolution=16)
    rng = np.random.default_rng(5)
    init_pc = jnp.zeros((2, 32, 3))
    variables = model.init(jax.random.key(0), init_pc, init_pc)
    pc = np.asarray(rng.uniform(-0.4, 0.4, (8, 64, 3)), np.float32)

    encode = jax.jit(lambda v, p: model.apply(v, p, method="encode_inputs"))
    dense_fn = make_convonet_dense_eval(model, 8, 1.1)

    single = np.asarray(dense_fn(variables, encode(variables,
                                                   jnp.asarray(pc))))

    mesh = data_parallel_mesh()
    v_rep = replicate(variables, mesh)
    pc_sh = shard_batch(pc, mesh)
    sharded = np.asarray(dense_fn(v_rep, encode(v_rep, pc_sh)))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5)


def test_sharded_chunked_cw_matches_single_device():
    """The host-chunked CW path (TPU CLI default) under a dp-sharded
    batch: the eager init/bisection glue between jitted segments must
    preserve shardings and match the single-device result."""
    model, variables, pc = _tiny_victim()
    target = jnp.asarray(np.arange(8) % 4)
    key = jax.random.key(1)

    def make_logits_fn(v):
        def logits_fn(x):
            logits, _ = model.apply(v, x, train=False)
            return logits
        return logits_fn

    _, adv_single, succ_single = cw_perturb(
        make_logits_fn(variables), pc, target, key,
        binary_step=2, num_iter=8, device_chunk_iters=3)

    mesh = data_parallel_mesh()
    v_rep = replicate(variables, mesh)
    pc_sh = shard_batch(np.asarray(pc), mesh)
    tgt_sh = shard_batch(np.asarray(target), mesh)
    _, adv_sharded, succ_sharded = cw_perturb(
        make_logits_fn(v_rep), pc_sh, tgt_sh, key,
        binary_step=2, num_iter=8, device_chunk_iters=3)

    np.testing.assert_array_equal(
        np.asarray(succ_single), np.asarray(succ_sharded))
    np.testing.assert_allclose(
        np.asarray(adv_single), np.asarray(adv_sharded), atol=1e-5)
