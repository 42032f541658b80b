"""Tests for the smaller inventory components: IoU, MSG/FP, registry,
decoder variants, latent encoder, profiling."""

import os

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


def test_committed_registry_paths_resolve():
    """Every checkpoint path in the COMMITTED weights/registry.json must
    exist: ephemeral local-state entries (/tmp verification runs) have
    leaked into the shipped registry twice (ADVICE r3+r4) and dangle
    after any VM restart. Verification/benchmark runs must pass
    --registry pointing at a non-committed path instead."""
    import json

    from if_defense_tpu.utils.registry import DEFAULT_PATH

    with open(DEFAULT_PATH) as f:
        reg = json.load(f)
    missing = [
        ckpt
        for by_np in reg.values()
        for by_model in by_np.values()
        for ckpt in by_model.values()
        if not os.path.exists(ckpt)
    ]
    assert not missing, (
        f"committed registry points at non-existent checkpoints "
        f"{missing}; keep local runs out of weights/registry.json "
        f"(use --registry <tmp path>)")


def test_phase_timer():
    from if_defense_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    x = jnp.ones((4, 4))
    with t.phase("mul", sync_array=x):
        y = x * 2
    s = t.summary()
    assert s["mul"]["count"] == 1
    assert s["mul"]["total_s"] >= 0


def test_ingest_matrix_merge():
    """Stage snapshots merge cell-wise: later files win on conflicts,
    earlier-only victims/attacks survive (tools/ingest_matrix.py glues
    the chip queue's staged accuracy-matrix runs back together)."""
    from tools.ingest_matrix import merge_results, ordered_union, \
        write_tables

    s1 = {"victims": {"pointnet": {"clean_accuracy": 1.0, "attacks": {
        "perturb": {"success_rate": 1.0,
                    "attacked": {"accuracy": 0.1},
                    "defended": {"sor": {"accuracy": 0.9}}},
        "knn": {"success_rate": 0.8,
                "attacked": {"accuracy": 0.2},
                "defended": {"sor": {"accuracy": 0.8}}},
    }}}}
    s2 = {"victims": {
        "pointnet": {"clean_accuracy": 1.0, "attacks": {
            # conflicting cell: stage-2 value must win
            "perturb": {"success_rate": 1.0,
                        "attacked": {"accuracy": 0.15},
                        "defended": {"sor": {"accuracy": 0.95},
                                     "dup": {"accuracy": 0.7}}},
        }},
        "dgcnn": {"clean_accuracy": 0.98, "attacks": {
            "perturb": {"success_rate": 0.9,
                        "attacked": {"accuracy": 0.05},
                        "defended": {"sor": {"accuracy": 0.85}}},
        }},
    }}
    m = merge_results([s1, s2])
    assert set(m["victims"]) == {"pointnet", "dgcnn"}
    pn = m["victims"]["pointnet"]["attacks"]
    assert set(pn) == {"perturb", "knn"}          # knn survives stage 2
    assert pn["perturb"]["attacked"]["accuracy"] == 0.15   # later wins
    assert pn["perturb"]["defended"]["dup"]["accuracy"] == 0.7

    assert ordered_union([["a", "b"], ["b", "c"]]) == ["a", "b", "c"]

    text = write_tables(m)
    assert "## pointnet (clean 100.0)" in text
    assert "## dgcnn (clean 98.0)" in text
    # knn has no dup column value -> em-dash placeholder
    knn_row = [l for l in text.splitlines() if l.startswith("| knn")][0]
    assert "—" in knn_row


def test_platform_guard_respects_in_process_override():
    """The package __init__'s dead-relay guard re-asserts JAX_PLATFORMS
    through the config API only for NON-axon selections: the ambient env
    in this environment always says "axon", and re-asserting that would
    clobber an in-process `jax.config.update("jax_platforms", "cpu")`
    made before the import (exactly what bench.py --smoke does — this
    hung the round-3 smoke until fixed)."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import if_defense_tpu\n"
        "assert jax.config.jax_platforms == '{want}', "
        "jax.config.jax_platforms\n"
        "print('ok')\n"
    )
    env_base = {"PYTHONPATH": "/root/repo"}
    import os as _os

    # env says axon (ambient default): the guard must NOT touch the
    # caller's cpu override
    env = dict(_os.environ, **env_base, JAX_PLATFORMS="axon")
    r = subprocess.run([sys.executable, "-c", code.format(want="cpu")],
                       env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    # env says cpu (the dead-relay escape hatch): the guard must
    # re-assert it even though the config was never updated in-process
    code2 = (
        "import if_defense_tpu\n"
        "import jax\n"
        "assert jax.config.jax_platforms == 'cpu', "
        "jax.config.jax_platforms\n"
        "print('ok')\n"
    )
    env = dict(_os.environ, **env_base, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code2], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]


def test_bounded_cache_fifo():
    from if_defense_tpu.utils.cache import BoundedCache

    c = BoundedCache(maxsize=2)
    builds = []

    def make(v):
        def build():
            builds.append(v)
            return v
        return build

    assert c.get_or_build("a", make(1)) == 1
    assert c.get_or_build("a", make(99)) == 1       # hit, no rebuild
    assert builds == [1]
    assert c.get_or_build("b", make(2)) == 2
    assert c.get_or_build("c", make(3)) == 3        # evicts "a" (oldest)
    assert "a" not in c and "b" in c and "c" in c
    assert len(c) == 2
    assert c.get_or_build("a", make(4)) == 4        # rebuilt after evict
    assert builds == [1, 2, 3, 4]
