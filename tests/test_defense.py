"""Defense tests: SOR golden semantics, SRS, DUP-Net pipeline, repulsion."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from if_defense_tpu.defense import (
    DUPNet,
    process_data_fixed,
    repulsion_loss,
    sor_defense,
    sor_defense_fixed,
    srs_defense,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PUNET_WEIGHTS = os.path.join(REPO, "weights", "punet_1024_up4.npz")


def _np_sor_mask(pc, k=2, alpha=1.1):
    """Reference SOR formula in numpy (SOR.py:23-47)."""
    B, K, _ = pc.shape
    d = ((pc[:, :, None, :] - pc[:, None, :, :]) ** 2).sum(-1)
    mask = np.zeros((B, K), bool)
    for b in range(B):
        s = np.sort(d[b], axis=-1)[:, 1 : k + 1]  # exclude self
        value = s.mean(-1)
        mean, std = value.mean(), value.std(ddof=1)
        mask[b] = value <= mean + alpha * std
    return mask


def test_sor_matches_numpy_reference():
    rng = np.random.default_rng(0)
    pc = rng.normal(size=(3, 64, 3)).astype(np.float32)
    pc[:, 0] *= 10  # plant an obvious outlier
    _, mask = sor_defense(jnp.array(pc))
    want = _np_sor_mask(pc)
    np.testing.assert_array_equal(np.asarray(mask) > 0.5, want)
    assert not want[:, 0].any()  # the planted outliers got dropped


def test_sor_fixed_inliers_first():
    rng = np.random.default_rng(1)
    pc = rng.normal(size=(2, 32, 3)).astype(np.float32)
    pc[:, 5] *= 20
    out, count = sor_defense_fixed(jnp.array(pc))
    out, count = np.asarray(out), np.asarray(count)
    _, mask = sor_defense(jnp.array(pc))
    mask = np.asarray(mask) > 0.5
    for b in range(2):
        inliers = pc[b][mask[b]]
        assert count[b] == len(inliers)
        np.testing.assert_allclose(out[b, : count[b]], inliers)
        # padding cyclically duplicates inliers
        np.testing.assert_allclose(
            out[b, count[b]],
            inliers[0] if count[b] < 32 else out[b, count[b]],
        )


def test_srs_shapes_and_subset():
    rng = np.random.default_rng(0)
    pc = rng.normal(size=(2, 64, 3)).astype(np.float32)
    out = np.asarray(srs_defense(jnp.array(pc), 16, jax.random.key(0)))
    assert out.shape == (2, 48, 3)
    # every output point is one of the inputs, no duplicates
    for b in range(2):
        rows = {tuple(r) for r in np.round(out[b], 6)}
        assert len(rows) == 48
        src = {tuple(r) for r in np.round(pc[b], 6)}
        assert rows <= src


def test_process_data_fixed_only_valid_points():
    rng = np.random.default_rng(0)
    pc = rng.normal(size=(2, 16, 3)).astype(np.float32)
    mask = np.ones((2, 16), np.float32)
    mask[0, 4:] = 0  # only 4 valid -> must duplicate
    out = np.asarray(
        process_data_fixed(jnp.array(pc), jnp.array(mask), 8, jax.random.key(0))
    )
    assert out.shape == (2, 8, 3)
    valid_rows = {tuple(r) for r in np.round(pc[0, :4], 6)}
    for r in np.round(out[0], 6):
        assert tuple(r) in valid_rows


def test_repulsion_matches_numpy():
    rng = np.random.default_rng(0)
    pc = rng.normal(size=(2, 32, 3)).astype(np.float32)
    got = np.asarray(repulsion_loss(jnp.array(pc)))
    # numpy oracle
    d = ((pc[:, :, None, :] - pc[:, None, :, :]) ** 2).sum(-1)
    want = []
    for b in range(2):
        order = np.argsort(d[b], axis=-1, kind="stable")[:, 1:6]
        dist = np.sqrt(np.maximum(
            np.take_along_axis(d[b], order, -1), 1e-12))
        w = np.exp(-((dist / 0.03) ** 2))
        want.append(((0.07 - dist) * w).mean())
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.skipif(
    not os.path.exists(PUNET_WEIGHTS), reason="converted weights missing"
)
def test_dupnet_pipeline_with_pretrained_weights():
    from if_defense_tpu.utils.params_io import load_params_npz

    rng = np.random.default_rng(0)
    pc = rng.normal(size=(2, 1024, 3)).astype(np.float32) * 0.3
    dup = DUPNet(npoint=1024, up_ratio=4)
    variables = load_params_npz(PUNET_WEIGHTS)
    out = np.asarray(dup(variables, jnp.array(pc), jax.random.key(0)))
    assert out.shape == (2, 4096, 3)
    assert np.isfinite(out).all()
    # upsampled cloud should stay near the input's scale
    assert np.abs(out).max() < 10 * np.abs(pc).max()


def test_cached_defense_honors_exact_knn(monkeypatch):
    """interp_refresh>1 + exact_knn must NOT silently fall back to the
    fused/approx repulsion (regression: the cached loop hardcoded
    repulsion_loss_auto)."""
    import if_defense_tpu.defense.ifdefense as ifd
    from if_defense_tpu.implicit import ConvOccupancyNetwork

    def boom(*a, **k):
        raise AssertionError("fused/approx path used despite exact_knn")

    monkeypatch.setattr(ifd, "repulsion_loss_auto", boom)

    model = ConvOccupancyNetwork(plane_resolution=16)
    zeros = jnp.zeros((1, 32, 3))
    variables = model.init(jax.random.key(0), zeros, zeros)
    defend = ifd.convonet_opt_defense(
        model, variables, iterations=3, input_npoint=16,
        sample_npoint=32, interp_refresh=2, exact_knn=True)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(2, 64, 3)) * 0.3, jnp.float32)
    out = defend(pc, jax.random.key(1))
    assert np.isfinite(np.asarray(out)).all()
