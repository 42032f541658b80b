"""Pallas FPS kernel vs the lax reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from if_defense_tpu.ops import farthest_point_sample
from if_defense_tpu.ops.pallas_fps import fps_pallas


def test_fps_pallas_matches_lax():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(8, 128, 3)), jnp.float32)
    a = np.asarray(farthest_point_sample(pts, 32))
    b = np.asarray(fps_pallas(pts, 32, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_fps_pallas_selects_distinct_points():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    idx = np.asarray(fps_pallas(pts, 16, interpret=True))
    for b in range(2):
        assert len(set(idx[b].tolist())) == 16
