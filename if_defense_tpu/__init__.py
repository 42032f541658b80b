"""IF-Defense-TPU: a TPU-native JAX framework for 3D adversarial point-cloud
attack, defense, and implicit-function based restoration.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the PyTorch/CUDA reference `Wuziyi616/IF-Defense`
(arXiv:2010.05272). All compute paths are pure jitted functions over
fixed-shape `[B, N, 3]` arrays; multi-device scaling goes through
`jax.sharding.Mesh` + batch-axis sharding instead of NCCL DDP.

Subpackages
-----------
- ``ops``       point-cloud kernel library (pairwise dist, kNN, FPS,
                ball query, Chamfer/Hausdorff, scatter, plane sampling)
- ``data``      npz schema + ModelNet40 dataset pipelines
- ``models``    victim classifiers (PointNet, PointNet++, DGCNN, PointConv)
- ``implicit``  Occupancy Networks (ONet) + Convolutional ONet
- ``defense``   SRS / SOR / DUP-Net / IF-Defense restoration drivers
- ``attack``    CW (Perturb/Add/Cluster/Object/kNN), FGM family, Drop
- ``parallel``  device-mesh / sharding helpers
- ``utils``     checkpointing, metrics, config, rng
"""

__version__ = "0.1.0"

import os as _os

_env_platforms = _os.environ.get("JAX_PLATFORMS", "")
if _env_platforms and "axon" not in _env_platforms.split(","):
    # Re-assert the env var through the config API. In this environment a
    # sitecustomize registers the axon TPU plugin before user code runs
    # and pins jax_platforms="axon,cpu" via the CONFIG (which outranks
    # the env var) — so when its tunnel relay is dead, launching a CLI
    # with JAX_PLATFORMS=cpu alone does not stop jax's backend discovery
    # from hanging forever on the first device op; the post-import
    # config.update does (tests/conftest.py and bench.py set it for the
    # same reason). Two guards so a library import never clobbers an
    # explicit in-process choice: only non-axon env selections (the
    # ambient env always says "axon"; re-asserting that would undo a
    # caller's `jax.config.update("jax_platforms", "cpu")` — it hung
    # bench.py --smoke), and only while the config still holds the
    # plugin's axon default (a caller who already updated it chose
    # deliberately).
    import jax as _jax

    _cur = _jax.config.jax_platforms or ""
    if "axon" in _cur.split(","):
        _jax.config.update("jax_platforms", _env_platforms)
