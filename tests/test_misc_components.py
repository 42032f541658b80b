"""Tests for the smaller inventory components: IoU, MSG/FP, registry,
decoder variants, latent encoder, profiling."""

import jax
import jax.numpy as jnp
import numpy as np

from if_defense_tpu.ops import compute_iou


def test_compute_iou():
    a = jnp.array([[1, 1, 0, 0]], jnp.float32)
    b = jnp.array([[1, 0, 1, 0]], jnp.float32)
    np.testing.assert_allclose(np.asarray(compute_iou(a, b)), [1 / 3])
    np.testing.assert_allclose(np.asarray(compute_iou(a, a)), [1.0])


def test_msg_and_fp_shapes():
    from if_defense_tpu.models.pointnet2 import (
        FeaturePropagation,
        SetAbstractionMsg,
    )

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(2, 64, 3)), jnp.float32)
    msg = SetAbstractionMsg(16, (0.2, 0.4), (8, 16), ((8, 16), (8, 32)))
    variables = msg.init(jax.random.key(0), xyz, None, train=True)
    new_xyz, feats = msg.apply(variables, xyz, None, train=False)
    assert new_xyz.shape == (2, 16, 3)
    assert feats.shape == (2, 16, 48)  # 16 + 32 concat

    fp = FeaturePropagation((24,))
    fvars = fp.init(jax.random.key(1), xyz, new_xyz, None, feats, train=True)
    up = fp.apply(fvars, xyz, new_xyz, None, feats, train=False)
    assert up.shape == (2, 64, 24)


def test_onet_decoder_variants_and_latent_encoder():
    from if_defense_tpu.implicit.onet import (
        DECODER_REGISTRY,
        DecoderFC,
        LatentEncoder,
    )

    assert set(DECODER_REGISTRY) == {
        "simple", "cbatchnorm", "cbatchnorm2", "batchnorm",
        "cbatchnorm_noresnet"}
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(2, 512)), jnp.float32)
    dec = DecoderFC()
    v = dec.init(jax.random.key(0), p, c)
    out = dec.apply(v, p, c)
    assert out.shape == (2, 16)

    enc = LatentEncoder(z_dim=8)
    occ = jnp.asarray(rng.integers(0, 2, (2, 16)), jnp.float32)
    ev = enc.init(jax.random.key(1), p, occ)
    mean, logstd = enc.apply(ev, p, occ)
    assert mean.shape == (2, 8) and logstd.shape == (2, 8)


def test_checkpoint_registry(tmp_path):
    from if_defense_tpu.utils.registry import (
        lookup_checkpoint,
        register_checkpoint,
    )

    path = str(tmp_path / "registry.json")
    register_checkpoint("mn40", "pointnet", "/ckpt/pn", 1024, path=path)
    assert lookup_checkpoint("mn40", "pointnet", 1024, path=path) == "/ckpt/pn"
    try:
        lookup_checkpoint("mn40", "dgcnn", 1024, path=path)
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "dgcnn" in str(e)


def test_phase_timer():
    from if_defense_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    x = jnp.ones((4, 4))
    with t.phase("mul", sync_array=x):
        y = x * 2
    s = t.summary()
    assert s["mul"]["count"] == 1
    assert s["mul"]["total_s"] >= 0
