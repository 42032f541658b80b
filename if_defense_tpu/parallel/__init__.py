"""Device-mesh / sharding helpers (the framework's parallelism story).

The reference shards attack batches across GPUs with NCCL DDP + per-rank npz
shards merged offline (`baselines/attack_scripts/targeted_perturb_attack.py:
99-174`, `baselines/util/merge_attack_results.py`). Here the same scaling is
one batch-axis sharding over a `jax.sharding.Mesh`: XLA partitions every
jitted step, collectives ride ICI, and results come back as one global
array — no shard files, no merge step.
"""

from if_defense_tpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    replicate,
    data_parallel_mesh,
    best_data_mesh,
)

__all__ = [
    "get_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_mesh",
    "best_data_mesh",
]
