"""Real-chip check: Mosaic-compiled pallas_call composes with the SPMD
partitioner.

The CPU-mesh tests (tests/test_multidevice.py) run the fused repulsion
kernel in INTERPRET mode; this tool runs the Mosaic-compiled kernel on
the real TPU under a device mesh with NamedSharding-annotated inputs —
value + grad, plain jit — and checks against the XLA formulation. With a
single chip the mesh is 1-wide, which still exercises the partitioner
path (jit with sharded inputs), the point VERDICT r2 item 3 raised.

Usage: python tools/check_pallas_spmd.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from if_defense_tpu.defense.repulsion import repulsion_loss
    from if_defense_tpu.ops.pallas_repulsion import fused_repulsion_loss

    assert jax.default_backend() == "tpu", (
        f"needs the real chip, got {jax.default_backend()}")
    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("dp",))
    print(f"mesh: {mesh} ({devs.size} device(s))")

    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(8 * devs.size, 1024, 3)),
                     jnp.float32) * 0.3
    pc_sh = jax.device_put(pc, NamedSharding(mesh, P("dp", None, None)))

    loss = jax.jit(lambda p: fused_repulsion_loss(p))
    grad = jax.jit(jax.grad(lambda p: fused_repulsion_loss(p).sum()))

    l_plain = np.asarray(loss(pc))
    l_shard = np.asarray(loss(pc_sh))
    g_plain = np.asarray(grad(pc))
    g_shard = np.asarray(grad(pc_sh))
    print(f"loss sharded-vs-plain max diff: "
          f"{np.abs(l_plain - l_shard).max():.3e}")
    print(f"grad sharded-vs-plain max diff: "
          f"{np.abs(g_plain - g_shard).max():.3e}")

    ref = np.asarray(repulsion_loss(pc, exact=True))
    print(f"fused-vs-XLA-exact loss max diff: "
          f"{np.abs(l_shard - ref).max():.3e}")

    ok = (np.abs(l_plain - l_shard).max() < 1e-6
          and np.abs(g_plain - g_shard).max() < 1e-6
          and np.abs(l_shard - ref).max() < 1e-5)
    print("PALLAS-SPMD OK" if ok else "PALLAS-SPMD MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
