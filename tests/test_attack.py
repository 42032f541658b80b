"""Attack tests on a tiny victim: loss semantics, clip ops, end-to-end CW.

Uses a deliberately weak linear 'victim' so attacks succeed within few
iterations even at tiny scale.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.attack import (
    chamfer_knn_dist,
    clip_points_l2,
    clip_points_linf,
    cw_add,
    cw_knn,
    cw_perturb,
    fgm,
    ifgm,
    l2_dist,
    logits_adv_loss,
    pgd,
    saliency_drop,
)
from if_defense_tpu.attack.losses import chamfer_dist
from if_defense_tpu.attack.cw_cluster import dbscan_labels

NC = 4
W = jax.random.normal(jax.random.key(42), (3, NC))


def toy_logits_fn(pc):
    """Linear victim: logits = sum(pc) @ W — differentiable, any N.

    Sum (not mean) pooling keeps per-point gradients O(1) so the CW budget
    term doesn't dominate at tiny scale.
    """
    return jnp.sum(pc, axis=1) @ W


def _data(B=4, K=32, seed=0):
    rng = np.random.default_rng(seed)
    pc = jnp.asarray(rng.normal(size=(B, K, 3)), jnp.float32) * 0.3
    logits = toy_logits_fn(pc)
    label = jnp.argmax(logits, -1)
    target = (label + 2) % NC
    return pc, label, target


def test_logits_adv_loss_zero_when_target_dominates():
    logits = jnp.array([[10.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0]])
    target = jnp.array([0, 0])
    loss = logits_adv_loss(logits, target)
    assert float(loss[0]) == 0.0
    assert float(loss[1]) == 5.0


def test_clip_l2_budget():
    pc, _, _ = _data()
    ori = pc
    moved = pc + 1.0
    clipped = clip_points_l2(moved, ori, budget=0.5)
    norms = np.sqrt(((np.asarray(clipped - ori)) ** 2).sum((1, 2)))
    np.testing.assert_allclose(norms, 0.5, rtol=1e-4)


def test_clip_linf_per_point():
    pc, _, _ = _data()
    moved = pc + jnp.array([1.0, 0.0, 0.0])
    clipped = clip_points_linf(moved, pc, budget=0.2)
    per_point = np.sqrt(((np.asarray(clipped - pc)) ** 2).sum(-1))
    assert per_point.max() <= 0.2 + 1e-5


def test_cw_perturb_succeeds_on_toy_victim():
    pc, label, target = _data()
    dist, adv, success = cw_perturb(
        toy_logits_fn, pc, target, jax.random.key(0),
        binary_step=3, num_iter=40,
    )
    adv = np.asarray(adv)
    assert adv.shape == pc.shape
    pred = np.argmax(np.asarray(toy_logits_fn(jnp.asarray(adv))), -1)
    assert (pred == np.asarray(target)).mean() >= 0.75
    assert np.asarray(success).mean() >= 0.75
    # successful distances are finite and small-ish
    d = np.asarray(dist)[np.asarray(success)]
    assert np.isfinite(d).all()


def test_cw_add_appends_points():
    pc, label, target = _data()
    _, adv, success = cw_add(
        toy_logits_fn, pc, target, jax.random.key(0),
        chamfer_dist, num_add=8, binary_step=2, num_iter=30,
    )
    assert np.asarray(adv).shape == (4, 32 + 8, 3)
    # clean part untouched
    np.testing.assert_allclose(np.asarray(adv)[:, :32], np.asarray(pc))


def test_cw_knn_runs_and_clips():
    pc, label, target = _data()
    adv, success = cw_knn(
        toy_logits_fn, pc, target, jax.random.key(0),
        chamfer_knn_dist, num_iter=30, budget=0.1,
    )
    per_point = np.sqrt(((np.asarray(adv - pc)) ** 2).sum(-1))
    assert per_point.max() <= 0.1 + 1e-4


def test_fgm_family():
    pc, label, target = _data()
    budget = 0.08 * np.sqrt(32 * 3)
    adv, _ = fgm(toy_logits_fn, pc, target, budget)
    assert np.isfinite(np.asarray(adv)).all()
    adv, succ = ifgm(toy_logits_fn, pc, target, jax.random.key(0),
                     budget, budget / 10, 10)
    norms = np.sqrt(((np.asarray(adv - pc)) ** 2).sum((1, 2)))
    assert (norms <= budget * 1.01).all()
    assert np.asarray(succ).mean() >= 0.75
    adv, _ = pgd(toy_logits_fn, pc, target, jax.random.key(1),
                 budget, budget / 10, 10)
    assert np.isfinite(np.asarray(adv)).all()


def toy_masked_logits_fn(pc, mask):
    """Mask-aware toy victim: masked-sum pooling (= compacted sum)."""
    m = mask[..., None].astype(pc.dtype)
    return jnp.sum(pc * m, axis=1) @ W


def test_saliency_drop_shrinks_cloud():
    pc, label, _ = _data()
    out, still = saliency_drop(
        toy_masked_logits_fn, pc, label, num_drop=10, k=5)
    assert np.asarray(out).shape == (4, 22, 3)


def test_dbscan_two_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(20, 3)) * 0.01
    b = rng.normal(size=(20, 3)) * 0.01 + 5.0
    pts = np.concatenate([a, b])
    labels = dbscan_labels(pts, eps=0.2, min_samples=3)
    assert len(set(labels[:20])) == 1
    assert len(set(labels[20:])) == 1
    assert labels[0] != labels[20]


def test_mixed_precision_victim_close_to_f32():
    """bf16-trunk/f32-head victim (attack/mixed.py): logits match f32
    within bf16 trunk tolerance, head params stay f32."""
    import jax.numpy as jnp

    from if_defense_tpu.attack.mixed import (
        cast_trunk_bf16,
        make_mixed_logits_fn,
    )
    from if_defense_tpu.models import build_model
    from if_defense_tpu.training import create_train_state, eval_variables

    model = build_model("pointnet", num_classes=8)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(4, 64, 3)), jnp.float32)
    state = create_train_state(model, jax.random.key(0), pc)
    variables = eval_variables(state)

    f32_logits = model.apply(variables, pc, train=False)[0]
    mixed = make_mixed_logits_fn(model, variables, 8)(pc)
    assert mixed.dtype == jnp.float32
    rel = np.abs(np.asarray(f32_logits) - np.asarray(mixed)).max() / (
        np.abs(np.asarray(f32_logits)).max() + 1e-9)
    assert rel < 0.02

    cv = cast_trunk_bf16(variables, 8)
    flat = jax.tree_util.tree_leaves_with_path(cv["params"])
    kept = {"/".join(str(getattr(p, "key", "?")) for p in path)
            for path, x in flat if x.dtype == jnp.float32}
    assert any(k.endswith("kernel") and "Dense" in k for k in kept)
    # ONLY the head Dense stays f32 — an f32 BatchNorm would promote
    # every activation after it back to f32 and kill the bf16 trunk
    assert len(kept) == 2 and all(
        k.endswith(("kernel", "bias")) for k in kept), kept
    assert sum(1 for _, x in flat if x.dtype == jnp.bfloat16) > 10
    bs = jax.tree_util.tree_leaves(cv["batch_stats"])
    assert all(x.dtype == jnp.bfloat16 for x in bs)


def test_cw_chunked_matches_fused():
    """device_chunk_iters must be a pure execution-shape change: the
    host-chunked CW (bounded device calls, required for heavyweight
    victims on TPU) returns bit-identical results to the fused
    single-program path, for every CW-family attack."""
    import jax.numpy as jnp

    from if_defense_tpu.attack.cw import cw_add, cw_knn, cw_perturb
    from if_defense_tpu.attack.cw_cluster import (
        cw_add_cluster,
        cw_add_object,
    )
    from if_defense_tpu.attack.losses import chamfer_dist, chamfer_knn_dist
    from if_defense_tpu.models import build_model
    from if_defense_tpu.training import create_train_state, eval_variables

    model = build_model("pointnet", num_classes=8)
    rng = np.random.default_rng(0)
    # >=128 points: the cluster/object DBSCAN init reads 128 critical pts
    pc = jnp.asarray(rng.normal(size=(4, 160, 3)), jnp.float32)
    state = create_train_state(model, jax.random.key(0), pc)
    variables = eval_variables(state)

    def logits_fn(x):
        return model.apply(variables, x, train=False)[0]

    target = jnp.asarray([1, 2, 3, 4], jnp.int32)
    key = jax.random.key(7)
    add_dist = functools.partial(chamfer_dist, method="adv2ori")

    cases = [
        ("perturb", lambda c: cw_perturb(
            logits_fn, pc, target, key, binary_step=3, num_iter=25,
            device_chunk_iters=c)),
        ("add", lambda c: cw_add(
            logits_fn, pc, target, key, add_dist, num_add=16,
            binary_step=2, num_iter=20, device_chunk_iters=c)),
        ("cluster", lambda c: cw_add_cluster(
            logits_fn, pc, target, key, num_add=2, cl_num_p=8,
            binary_step=2, num_iter=20, seed=0, device_chunk_iters=c)),
        ("object", lambda c: cw_add_object(
            logits_fn, pc, target, key, num_add=2, obj_num_p=16,
            binary_step=2, num_iter=20, seed=0, device_chunk_iters=c)),
        ("knn", lambda c: cw_knn(
            logits_fn, pc, target, key, chamfer_knn_dist,
            num_iter=30, device_chunk_iters=c)),
    ]
    for name, fn in cases:
        fused = [np.asarray(x) for x in fn(None)]
        # chunk size that does NOT divide num_iter (remainder segment)
        chunked = [np.asarray(x) for x in fn(8)]
        assert len(fused) == len(chunked)
        for f, c in zip(fused, chunked):
            np.testing.assert_array_equal(f, c, err_msg=name)
