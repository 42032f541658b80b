"""Implicit-network and opt-defense tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from if_defense_tpu.defense import convonet_opt_defense
from if_defense_tpu.defense.ifdefense import occupancy_bce, sample_valid
from if_defense_tpu.implicit import ConvOccupancyNetwork, OccupancyNetwork
from if_defense_tpu.implicit.convonet import (
    coordinate2index,
    normalize_coordinate,
)


def _rand_pc(B=2, N=96, seed=0, scale=0.4):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, (B, N, 3)), jnp.float32)


def test_normalize_coordinate_range():
    p = _rand_pc(scale=2.0)  # includes outliers beyond the cube
    for pl in ("xz", "xy", "yz"):
        uv = np.asarray(normalize_coordinate(p, pl))
        assert (uv >= 0).all() and (uv < 1.0).all()


def test_coordinate2index_bounds():
    p = _rand_pc()
    idx = np.asarray(coordinate2index(normalize_coordinate(p, "xz"), 64))
    assert idx.min() >= 0 and idx.max() < 64 * 64


def test_convonet_forward_and_grad():
    model = ConvOccupancyNetwork()
    pc, q = _rand_pc(), _rand_pc(seed=1, N=33)
    variables = model.init(jax.random.key(0), pc, q)
    c = model.apply(variables, pc, method="encode_inputs")
    assert set(c) == {"xz", "xy", "yz"}
    logits = model.apply(variables, q, c, method="decode")
    assert logits.shape == (2, 33)

    # query-point gradients drive the restoration loop
    g = jax.grad(
        lambda p: jnp.sum(model.apply(variables, p, c, method="decode"))
    )(q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_onet_forward_eval_mode():
    model = OccupancyNetwork()
    pc, q = _rand_pc(), _rand_pc(seed=1, N=33)
    variables = model.init(jax.random.key(0), pc, q)
    assert "batch_stats" in variables  # CBN decoder carries running stats
    logits = model.apply(variables, q, pc, method="__call__")
    # NOTE: __call__(pc, p) signature: encode pc then decode p
    logits = model.apply(variables, pc, q)
    assert logits.shape == (2, 33)
    assert np.isfinite(np.asarray(logits)).all()


def test_occupancy_bce_minimised_at_threshold():
    # d/dx BCE(x, t) = sigmoid(x) - t -> zero at logit(t)
    t = 0.2
    logit = float(np.log(t / (1 - t)))
    g = jax.grad(lambda x: occupancy_bce(x, t))(jnp.full((1, 4), logit))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_sample_valid_only_picks_valid():
    pc = _rand_pc(B=1, N=16)
    mask = np.ones((1, 16), np.float32)
    mask[0, 4:] = 0
    out = np.asarray(sample_valid(pc, jnp.asarray(mask), 8, jax.random.key(0)))
    valid = {tuple(r) for r in np.round(np.asarray(pc)[0, :4], 6)}
    for r in np.round(out[0], 6):
        assert tuple(r) in valid


def test_opt_defense_end_to_end_shapes():
    model = ConvOccupancyNetwork()
    pc = _rand_pc(B=2, N=128)
    variables = model.init(jax.random.key(0), pc, pc)
    defend = convonet_opt_defense(
        model, variables, iterations=3, input_npoint=64, sample_npoint=96
    )
    out = np.asarray(defend(pc, jax.random.key(1)))
    assert out.shape == (2, 96, 3)
    assert np.isfinite(out).all()
    # output is unit-sphere normalised
    r = np.sqrt((out**2).sum(-1)).max(1)
    np.testing.assert_allclose(r, 1.0, atol=1e-4)
    np.testing.assert_allclose(out.mean(1), 0.0, atol=1e-4)


def test_convonet_grid_plane_type():
    """The 'grid' volumetric variant (UNet3D + trilinear sampling)."""
    model = ConvOccupancyNetwork(plane_type=("grid",), grid_resolution=8)
    pc, q = _rand_pc(N=64), _rand_pc(seed=2, N=17)
    variables = model.init(jax.random.key(0), pc, q)
    c = model.apply(variables, pc, method="encode_inputs")
    assert set(c) == {"grid"}
    assert c["grid"].shape == (2, 8, 8, 8, 32)
    logits = model.apply(variables, q, c, method="decode")
    assert logits.shape == (2, 17)
    g = jax.grad(
        lambda p: jnp.sum(model.apply(variables, p, c, method="decode"))
    )(q)
    assert np.isfinite(np.asarray(g)).all()


def test_trilinear_grid_sample_matches_manual():
    from if_defense_tpu.ops.interp import trilinear_grid_sample

    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)), jnp.float32)
    # at exact grid points, sampling returns the stored value
    uvw = jnp.array([[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
                      [1 / 3, 2 / 3, 1.0]]])
    out = np.asarray(trilinear_grid_sample(grid, uvw))
    np.testing.assert_allclose(out[0, 0], np.asarray(grid)[0, 0, 0, 0],
                               atol=1e-5)
    np.testing.assert_allclose(out[0, 1], np.asarray(grid)[0, 3, 3, 3],
                               atol=1e-5)
    # uvw = (x=1/3, y=2/3, z=1) -> grid[z=3, y=2, x=1]
    np.testing.assert_allclose(out[0, 2], np.asarray(grid)[0, 3, 2, 1],
                               atol=1e-4)


def test_pointnetpp_convonet_variant():
    from if_defense_tpu.implicit.pointnetpp_encoder import PointConvONet

    model = PointConvONet()
    pc, q = _rand_pc(N=128), _rand_pc(seed=3, N=19)
    variables = model.init(jax.random.key(0), pc, q)
    pos, fea = model.apply(variables, pc, method="encode_inputs")
    assert pos.shape == (2, 256, 3) and fea.shape == (2, 256, 32)
    logits = model.apply(variables, q, (pos, fea), method="decode")
    assert logits.shape == (2, 19)
    g = jax.grad(lambda p: jnp.sum(
        model.apply(variables, p, (pos, fea), method="decode")))(q)
    assert np.isfinite(np.asarray(g)).all()
