"""Per-stage profile of the CW attack hot loop on a victim classifier.

The matrix's PointNet++ CW legs cost ~47 ms/iteration at B=40 (45 min for
one 10x500 attack on 320 clouds, ROUND_NOTES.md) — this tool breaks that
iteration down so optimization effort lands on the real cost, mirroring
what tools/profile_defense.py does for the defense loop. Times, each
jitted in isolation:

  - victim forward (logits only, the inference cost)
  - victim forward+backward wrt the INPUT cloud (the attack-iteration
    trunk: margin-loss value_and_grad, reference hot loop
    `baselines/attack/CW/Perturb.py:76-150`)
  - one full CW Adam iteration (loss + grad + Adam update, as
    attack/cw.py runs it)
  - isolated point-ops at the victim's set-abstraction shapes
    (PointNet++/PointConv): FPS per level, ball-query distance matmul,
    the ball-query index sort, neighbourhood gathers fwd and fwd+bwd
  - DGCNN's EdgeConv graph build (knn_self) when --model dgcnn

Usage: python tools/profile_attack.py [--model pointnet2] [--batch 40]
           [--num_points 1024] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    """Device barrier through the axon tunnel (scalar fetch, cheap)."""
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def bench_fn(fn, *args, warmup=2, reps=5, inner=1):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
        times.append((time.perf_counter() - t0) / inner)
    return min(times)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pointnet2")
    p.add_argument("--batch", type=int, default=40)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--iters", type=int, default=20,
                   help="loop iterations per timing rep")
    p.add_argument("--fps_ab", action="store_true",
                   help="A/B the two Pallas FPS kernel variants")
    args = p.parse_args(argv)

    import jax

    # honour JAX_PLATFORMS via config too: when the axon relay is dead,
    # the env var alone does NOT stop backend init from hanging on the
    # tunnel — the post-import config.update does (same reason
    # tests/conftest.py sets both)
    env_plat = os.environ.get("JAX_PLATFORMS")
    if env_plat:
        jax.config.update("jax_platforms", env_plat)
    import jax.numpy as jnp
    import optax

    from if_defense_tpu.models import build_model
    from if_defense_tpu.ops import pointops

    B, N = args.batch, args.num_points
    print(f"backend={jax.default_backend()} model={args.model} "
          f"B={B} N={N} iters/rep={args.iters}")

    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.3)
    labels = jnp.asarray(rng.integers(0, 8, size=(B,)), jnp.int32)

    model = build_model(args.model, num_classes=8)
    variables = model.init(jax.random.PRNGKey(0), pc[:1], train=False)

    @jax.jit
    def fwd(x):
        logits, _ = model.apply(variables, x, train=False)
        return logits

    def margin_loss(x):
        logits, _ = model.apply(variables, x, train=False)
        tgt = jax.nn.one_hot(labels, logits.shape[-1])
        real = jnp.sum(tgt * logits, axis=1)
        other = jnp.max(logits - tgt * 1e10, axis=1)
        return jnp.sum(jnp.maximum(other - real, 0.0)), logits

    grad_fn = jax.value_and_grad(margin_loss, has_aux=True)

    @jax.jit
    def fwd_bwd(x):
        (loss, _), g = grad_fn(x)
        return loss, g

    opt = optax.adam(1e-2)

    @jax.jit
    def adam_loop(x0):
        state = opt.init(x0)

        def body(carry, _):
            x, st = carry
            (_, _), g = grad_fn(x)
            updates, st = opt.update(g, st, x)
            return (optax.apply_updates(x, updates), st), 0.0

        (x, _), _ = jax.lax.scan(body, (x0, state), length=args.iters)
        return x

    t_fwd = bench_fn(fwd, pc)
    t_fb = bench_fn(fwd_bwd, pc)
    t_loop = bench_fn(adam_loop, pc, inner=args.iters)
    print(f"victim forward            {t_fwd * 1e3:8.2f} ms")
    print(f"forward+input-grad        {t_fb * 1e3:8.2f} ms")
    print(f"full CW Adam iteration    {t_loop * 1e3:8.2f} ms/iter "
          f"(scan of {args.iters})")

    # mixed-precision trunk (bf16 trunk + f32 head, attack math f32):
    # rejected on PointNet (trunk too small to matter, ROUND_NOTES) but
    # unmeasured on the SA-heavy victims where the trunk dominates
    from if_defense_tpu.attack.mixed import make_mixed_logits_fn

    mixed_fn = make_mixed_logits_fn(model, variables, 8)

    def margin_loss_mixed(x):
        logits = mixed_fn(x)
        tgt = jax.nn.one_hot(labels, logits.shape[-1])
        real = jnp.sum(tgt * logits, axis=1)
        other = jnp.max(logits - tgt * 1e10, axis=1)
        return jnp.sum(jnp.maximum(other - real, 0.0)), logits

    mgrad_fn = jax.value_and_grad(margin_loss_mixed, has_aux=True)

    @jax.jit
    def fwd_bwd_mixed(x):
        (loss, _), g = mgrad_fn(x)
        return loss, g

    t_fbm = bench_fn(fwd_bwd_mixed, pc)
    print(f"forward+input-grad mixed  {t_fbm * 1e3:8.2f} ms "
          f"(bf16 trunk)")

    # --- isolated point-ops at the victim's SA shapes ------------------
    if args.model in ("pointnet2", "pointconv"):
        # (npoint, radius, nsample, feature channels entering the level)
        levels = [(512, 0.2, 32, 3), (128, 0.4, 64, 128 + 3)]
        xyz = pc
        for li, (npoint, radius, nsample, cin) in enumerate(levels, 1):
            n_in = xyz.shape[1]
            npoint = min(npoint, max(n_in // 2, 1))   # tiny smoke shapes
            nsample = min(nsample, n_in)
            feats = jnp.asarray(
                rng.normal(size=(B, n_in, cin)).astype(np.float32))

            fps = jax.jit(lambda x, np_=npoint:
                          pointops.farthest_point_sample(x, np_))
            t = bench_fn(fps, xyz)
            print(f"L{li} FPS {n_in}->{npoint}         {t * 1e3:8.2f} ms")

            idx0 = fps(xyz)
            new_xyz = pointops.index_points(xyz, idx0)

            sqd = jax.jit(lambda q, x: pointops.square_distance(q, x))
            t = bench_fn(sqd, new_xyz, xyz)
            print(f"L{li} ball-query dist matmul {t * 1e3:8.2f} ms")

            qbp = jax.jit(lambda x, q, r=radius, k=nsample:
                          pointops.query_ball_point(r, k, x, q,
                                                    method="sort"))
            t = bench_fn(qbp, xyz, new_xyz)
            print(f"L{li} query_ball (sort)        {t * 1e3:8.2f} ms")

            qbp_cnt = jax.jit(lambda x, q, r=radius, k=nsample:
                              pointops.query_ball_point(r, k, x, q,
                                                        method="count"))
            t = bench_fn(qbp_cnt, xyz, new_xyz)
            print(f"L{li} query_ball (count)       {t * 1e3:8.2f} ms")

            d0 = sqd(new_xyz, xyz)
            arange = jnp.arange(n_in, dtype=jnp.int32)

            @jax.jit
            def qbp_sort(d, r=radius, k=nsample, n=n_in, ar=arange):
                idx = jnp.where(d > r**2, n, ar[None, None, :])
                return jnp.sort(idx, axis=-1)[..., :k]

            t = bench_fn(qbp_sort, d0)
            print(f"L{li} index sort alone        {t * 1e3:8.2f} ms")

            gidx = qbp(xyz, new_xyz)

            gather = jax.jit(lambda f, i: pointops.index_points(f, i))
            t = bench_fn(gather, feats, gidx)
            print(f"L{li} gather [B,{npoint},{nsample},{cin}] "
                  f"fwd       {t * 1e3:8.2f} ms")

            @jax.jit
            def gather_bwd(f, i):
                def s(ff):
                    return jnp.sum(pointops.index_points(ff, i) ** 2)
                return jax.grad(s)(f)

            t = bench_fn(gather_bwd, feats, gidx)
            print(f"L{li} gather fwd+bwd           {t * 1e3:8.2f} ms")

            onehot = jax.jit(lambda f, i: pointops.gather_neighbors(f, i))
            try:
                t = bench_fn(onehot, feats, gidx)
                print(f"L{li} gather one-hot MXU fwd  {t * 1e3:8.2f} ms")
            except Exception as e:  # OOM at big shapes is informative too
                print(f"L{li} gather one-hot MXU fwd  FAILED: "
                      f"{type(e).__name__}")

            xyz = new_xyz

    if args.model == "dgcnn":
        knn = jax.jit(lambda x: pointops.knn_self(20, x))
        t = bench_fn(knn, pc)
        print(f"EdgeConv knn_self(20)      {t * 1e3:8.2f} ms")

    if args.fps_ab:
        from if_defense_tpu.ops.pallas_fps import fps_pallas

        interp = jax.default_backend() != "tpu"
        for n_in, npoint in [(N, min(512, N // 2)),
                             (min(512, N // 2), min(128, N // 4))]:
            x = jnp.asarray(
                rng.normal(size=(B, n_in, 3)).astype(np.float32))
            for v in (1, 2):
                f = jax.jit(lambda a, np_=npoint, vv=v: fps_pallas(
                    a, np_, interpret=interp, variant=vv))
                t = bench_fn(f, x)
                print(f"fps_pallas v{v} {n_in}->{npoint}      "
                      f"{t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
