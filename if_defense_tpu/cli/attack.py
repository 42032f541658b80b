"""Attack CLI: run any of the 7 attacks over an npz dataset.

Replaces the reference's per-attack DDP scripts
(`baselines/attack_scripts/*.py`) and the offline shard merger
(`baselines/util/merge_attack_results.py`): data parallelism is batch-axis
sharding over the device mesh, results come back as one global array, and
a single npz + metrics JSONL are written (no rank shards, no
success-rate-in-filename encoding).

Usage:
    python -m if_defense_tpu.cli.attack --attack perturb \
        --data mn40_attack.npz --checkpoint runs/pointnet/best
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import numpy as np

from if_defense_tpu.attack import (
    chamfer_dist,
    chamfer_knn_dist,
    cw_add,
    cw_add_cluster,
    cw_add_object,
    cw_knn,
    cw_perturb,
    fgm,
    hausdorff_dist,
    ifgm,
    mifgm,
    pgd,
    saliency_drop,
)
from if_defense_tpu.cli.inference import load_eval_model, resolve_checkpoint
from if_defense_tpu.data import (
    ModelNet40Attack,
    ModelNet40NormalAttack,
    batch_iterator,
)
from if_defense_tpu.parallel import best_data_mesh, replicate, shard_batch
from if_defense_tpu.utils import MetricsWriter
from if_defense_tpu.data.npz import save_npz

ATTACKS = ["perturb", "add", "add_cluster", "add_object", "knn",
           "fgm", "ifgm", "mifgm", "pgd", "drop"]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Run a point-cloud attack")
    p.add_argument("--attack", required=True, choices=ATTACKS)
    p.add_argument("--data", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default=None)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--output", default=None,
                   help="output npz (default <attack>-<model>-<file>.npz)")
    # CW params
    p.add_argument("--attack_lr", type=float, default=1e-2)
    p.add_argument("--binary_step", type=int, default=None)
    p.add_argument("--num_iter", type=int, default=None)
    p.add_argument("--adv_dist", default="chamfer",
                   choices=["chamfer", "hausdorff"],
                   help="distance for the Add attack")
    p.add_argument("--num_add", type=int, default=None)
    # FGM params
    p.add_argument("--budget", type=float, default=0.08)
    # kNN params
    p.add_argument("--knn_budget", type=float, default=0.1)
    p.add_argument("--kappa", type=float, default=15.0,
                   help="kNN-attack margin (targeted_knn_attack.py:81)")
    p.add_argument("--approx_knn", action="store_true",
                   help="approx_max_k selection inside the kNN-attack "
                        "distance (faster on TPU, advisory graph)")
    # Drop params
    p.add_argument("--num_drop", type=int, default=200)
    p.add_argument("--victim_dtype", default="float32",
                   choices=["float32", "mixed"],
                   help="mixed = bf16 victim trunk + f32 logits head "
                        "(attack math stays f32; see attack/mixed.py)")
    p.add_argument("--device_chunk_iters", type=int, default=-1,
                   help="CW-family Adam iterations per device call. "
                        "-1 = auto (chunks of 100 on TPU — a fused "
                        "10x500 program on a heavyweight victim exceeds "
                        "the runtime's single-execution limit and kills "
                        "the worker; results are bit-identical either "
                        "way); 0 = one fused device program")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--registry", default=None,
                   help="registry JSON for registry:<dataset> checkpoints")
    p.add_argument("--resume", action="store_true",
                   help="write per-batch shards to <output>.partial/ and "
                        "skip batches already done there — an interrupted "
                        "multi-minute attack run (infra death, preemption) "
                        "resumes at batch granularity with bit-identical "
                        "results (the PRNG stream is replayed over skipped "
                        "batches). The reference gets the same property "
                        "from its per-rank npz shards "
                        "(merge_attack_results.py)")
    p.add_argument("--stop_after_batches", type=int, default=0,
                   help="compute at most N new batches then exit (0 = all);"
                        " with --resume a later invocation completes the "
                        "file — for timeboxing long attack legs")
    return p.parse_args(argv)


# args that do not affect attack RESULTS: execution shape / bookkeeping
# only. device_chunk_iters is bit-identical by contract (the reason a
# resumed run may want a DIFFERENT chunking than the run that died).
# registry and the raw checkpoint name are excluded because their EFFECT
# — the resolved checkpoint path — is fingerprinted instead: two runs
# whose registries map `registry:<dataset>` to different victims must
# NOT merge shards; a retrain-in-place is caught by checkpoint_digest.
_NON_RESULT_ARGS = ("output", "resume", "stop_after_batches",
                    "device_chunk_iters", "registry", "checkpoint")


def _resume_fingerprint(args, resolved_checkpoint: str) -> dict:
    fp = {k: v for k, v in sorted(vars(args).items())
          if k not in _NON_RESULT_ARGS}
    fp["checkpoint"] = os.path.abspath(resolved_checkpoint)
    # identify inputs by content too, not just path: a dataset npz
    # regenerated in place or a checkpoint retrained in place between
    # runs must not silently merge shards computed from different
    # inputs (ADVICE r3). The data file is identified by a sha256 of its
    # bytes, NOT mtime — deterministic producers (the matrix driver's
    # synthetic generator) legitimately rewrite bit-identical npz files,
    # and an mtime key would throw away every valid in-flight shard on a
    # driver restart. Checkpoints are orbax directories; they get a
    # bounded content digest (relpath + size + head sample per file) —
    # unlike mtime it survives copies/VM restores but still catches a
    # retrain-in-place (ADVICE r3 + review r4).
    fp["checkpoint_digest"] = _ckpt_digest_or_none(fp["checkpoint"])
    if getattr(args, "data", None):
        fp["data_sha256"] = _sha256_or_none(args.data)
    return fp


def _sha256_or_none(path: str):
    import hashlib

    try:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()
    except OSError:
        return None


def _mtime_or_none(path: str):
    # only used to VERIFY legacy (pre-content-digest) fingerprints on
    # resume-schema upgrade; new fingerprints never record mtimes
    try:
        return os.path.getmtime(path)
    except OSError:
        return None


def _ckpt_digest_or_none(path: str, sample_bytes: int = 1 << 18):
    """Bounded content digest of a checkpoint file or orbax directory.

    v2: hashes each file's relative path, size, and head+tail
    `sample_bytes` samples (full content for files under 2*sample_bytes),
    with field delimiters so adjacent fields can't alias. Invariant under
    copies/restores that bump mtimes; catches a retrain-in-place whenever
    any file's size, head, or tail bytes change. NOT a full-content
    guarantee: a rewrite that preserves every file's size and both
    sampled regions (conceivable for chunked stores whose sampled bytes
    are headers/index data) escapes — accepted trade-off to keep the
    digest bounded on multi-GB checkpoints.
    """
    import hashlib

    h = hashlib.sha256()

    def hash_file(p, rel):
        size = os.path.getsize(p)
        h.update(rel.encode())
        h.update(b"\x00")
        h.update(str(size).encode())
        h.update(b"\x00")
        with open(p, "rb") as f:
            h.update(f.read(sample_bytes))
            if size > 2 * sample_bytes:
                f.seek(size - sample_bytes)
                h.update(f.read(sample_bytes))
            elif size > sample_bytes:
                h.update(f.read())
        h.update(b"\x01")

    try:
        if os.path.isdir(path):
            for root, dirs, files in sorted(os.walk(path)):
                dirs.sort()
                for name in sorted(files):
                    p = os.path.join(root, name)
                    hash_file(p, os.path.relpath(p, path))
        else:
            hash_file(path, os.path.basename(path))
        return "v2:" + h.hexdigest()
    except OSError:
        return None


def _ckpt_digest_v1(path: str, sample_bytes: int = 1 << 18):
    """The round-4 digest (no delimiters, head sample only) — kept ONLY
    to verify legacy fingerprints during resume-schema upgrade."""
    import hashlib

    h = hashlib.sha256()
    try:
        if os.path.isdir(path):
            for root, dirs, files in sorted(os.walk(path)):
                dirs.sort()
                for name in sorted(files):
                    p = os.path.join(root, name)
                    rel = os.path.relpath(p, path)
                    h.update(rel.encode())
                    h.update(str(os.path.getsize(p)).encode())
                    with open(p, "rb") as f:
                        h.update(f.read(sample_bytes))
        else:
            h.update(str(os.path.getsize(path)).encode())
            with open(path, "rb") as f:
                h.update(f.read(sample_bytes))
        return h.hexdigest()
    except OSError:
        return None


def build_attack(args, logits_fn, masked_logits_fn=None):
    """Return fn(batch) -> (adv_pc np, success np) for the chosen attack.

    `masked_logits_fn(pc, mask)` is the mask-aware victim forward used by
    the fixed-shape Drop attack (one compile per (model, K) instead of
    ~num_drop/k shrinking-shape compiles).
    """
    name = args.attack
    # auto: bound every CW device call on TPU (the fused scan-of-scans
    # on a heavyweight victim exceeds the runtime's single-execution
    # limit); None = fused single program (CPU/tests)
    chunk = args.device_chunk_iters
    if chunk < 0:
        chunk = 100 if jax.default_backend() == "tpu" else None
    chunk = chunk or None

    if name == "perturb":
        iters = args.num_iter or 500
        bsteps = args.binary_step or 10

        def run(pc, label, target, normal, key):
            _, adv, succ = cw_perturb(
                logits_fn, pc, target, key, attack_lr=args.attack_lr,
                binary_step=bsteps, num_iter=iters,
                device_chunk_iters=chunk)
            return adv, succ
        return run, "target"

    if name == "add":
        iters = args.num_iter or 500
        bsteps = args.binary_step or 10
        num_add = args.num_add or 512
        dist = (functools.partial(chamfer_dist, method="adv2ori")
                if args.adv_dist == "chamfer"
                else functools.partial(hausdorff_dist, method="adv2ori"))

        def run(pc, label, target, normal, key):
            _, adv, succ = cw_add(
                logits_fn, pc, target, key, dist, num_add=num_add,
                attack_lr=args.attack_lr, binary_step=bsteps,
                num_iter=iters, device_chunk_iters=chunk)
            return adv, succ
        return run, "target"

    if name == "add_cluster":
        iters = args.num_iter or 500
        bsteps = args.binary_step or 5

        def run(pc, label, target, normal, key):
            _, adv, succ = cw_add_cluster(
                logits_fn, pc, target, key, num_add=args.num_add or 3,
                attack_lr=args.attack_lr, binary_step=bsteps,
                num_iter=iters, seed=args.seed,
                device_chunk_iters=chunk)
            return adv, succ
        return run, "target"

    if name == "add_object":
        iters = args.num_iter or 500
        bsteps = args.binary_step or 5

        def run(pc, label, target, normal, key):
            _, adv, succ = cw_add_object(
                logits_fn, pc, target, key, num_add=args.num_add or 3,
                attack_lr=args.attack_lr, binary_step=bsteps,
                num_iter=iters, seed=args.seed,
                device_chunk_iters=chunk)
            return adv, succ
        return run, "target"

    if name == "knn":
        iters = args.num_iter or 2500
        dist = functools.partial(
            chamfer_knn_dist,
            knn_method="approx" if args.approx_knn else "sort")

        def run(pc, label, target, normal, key):
            adv, succ = cw_knn(
                logits_fn, pc, target, key, dist,
                normal=normal, attack_lr=1e-3, num_iter=iters,
                budget=args.knn_budget, kappa=args.kappa,
                device_chunk_iters=chunk)
            return adv, succ
        return run, "target_normal"

    if name in ("fgm", "ifgm", "mifgm", "pgd"):
        iters = args.num_iter or 50
        # global-L2 budget scaled by sqrt(K * 3) like the driver
        # (targeted_fgm_attack.py:136-140)
        budget = args.budget * np.sqrt(args.num_points * 3)
        step_size = budget / iters

        def run(pc, label, target, normal, key):
            if name == "fgm":
                return fgm(logits_fn, pc, target, budget)
            if name == "ifgm":
                return ifgm(logits_fn, pc, target, key, budget,
                            step_size, iters)
            if name == "mifgm":
                return mifgm(logits_fn, pc, target, key, budget,
                             step_size, iters)
            return pgd(logits_fn, pc, target, key, budget, step_size, iters)
        return run, "target"

    if name == "drop":
        def run(pc, label, target, normal, key):
            adv, still_correct = saliency_drop(
                masked_logits_fn, pc, label, args.num_drop)
            return adv, ~still_correct
        return run, "untarget"

    raise ValueError(name)


def main(argv=None):
    args = parse_args(argv)
    resolved_ckpt = resolve_checkpoint(
        args.checkpoint, args.model, args.num_points, args.registry)
    model, variables, meta = load_eval_model(
        resolved_ckpt, args.model, args.num_points)

    # batch-axis data parallelism: victim params replicated over the mesh,
    # every input batch sharded on dp — XLA SPMD partitions the whole
    # attack (the reference's per-GPU DDP + rank-shard npz story,
    # `targeted_perturb_attack.py:99-130`, collapses to this)
    mesh = best_data_mesh(args.batch_size)
    variables = replicate(variables, mesh)

    if args.victim_dtype == "mixed":
        from if_defense_tpu.attack.mixed import make_mixed_logits_fn

        n_cls = getattr(model, "num_classes", 40)
        logits_fn = make_mixed_logits_fn(model, variables, n_cls)
        masked_logits_fn = make_mixed_logits_fn(
            model, variables, n_cls, masked=True)
    else:
        def logits_fn(pc):
            logits, _ = model.apply(variables, pc, train=False)
            return logits

        def masked_logits_fn(pc, mask):
            logits, _ = model.apply(variables, pc, train=False, mask=mask)
            return logits

    run, mode = build_attack(args, logits_fn, masked_logits_fn)

    if mode == "target_normal":
        ds = ModelNet40NormalAttack(args.data, args.num_points)
    else:
        ds = ModelNet40Attack(args.data, args.num_points)

    model_name = meta.get("model", args.model or "model")
    out = args.output or "{}-{}-{}".format(
        args.attack, model_name, os.path.basename(args.data))

    part_dir = out + ".partial"
    if args.resume:
        import json as _json

        os.makedirs(part_dir, exist_ok=True)
        fp = _resume_fingerprint(args, resolved_ckpt)
        fp_path = os.path.join(part_dir, "config.json")
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                old = _json.load(f)
            if old != fp:
                # fingerprint-schema migration: earlier schemas keyed
                # inputs by mtime (data_mtime / checkpoint_mtime) or by
                # the v1 checkpoint digest. Accept the shards and
                # upgrade iff (a) every non-provenance field matches and
                # (b) EVERY provenance signal the old fingerprint
                # recorded verifies against the CURRENT inputs under its
                # own schema — old mtimes against the file's current
                # mtime, a v1 digest against a recomputed v1 digest —
                # so a content change between the legacy run and this
                # resume invalidates instead of slipping through the
                # schema gap (ADVICE r4: shared-key comparison was
                # vacuous across disjoint schemas).
                prov = ("data_mtime", "data_sha256",
                        "checkpoint_mtime", "checkpoint_digest")
                old_core = {k: v for k, v in old.items() if k not in prov}
                new_core = {k: v for k, v in fp.items() if k not in prov}

                def _prov_verified(k, v):
                    if k == "checkpoint_mtime":
                        return v == _mtime_or_none(fp["checkpoint"])
                    if k == "checkpoint_digest":
                        if isinstance(v, str) and v.startswith("v2:"):
                            return v == fp.get("checkpoint_digest")
                        return v == _ckpt_digest_v1(fp["checkpoint"])
                    if k == "data_mtime":
                        return (getattr(args, "data", None) is not None
                                and v == _mtime_or_none(args.data))
                    if k == "data_sha256":
                        return v == fp.get("data_sha256")
                    return False

                prov_ok = all(_prov_verified(k, old[k])
                              for k in prov if k in old)
                if prov_ok and old_core == new_core:
                    print(f"upgrading resume fingerprint schema in "
                          f"{part_dir} (provenance re-verified against "
                          f"current inputs)")
                    with open(fp_path, "w") as f:
                        _json.dump(fp, f)
                else:
                    raise ValueError(
                        f"{part_dir} holds shards from a different "
                        f"attack configuration; delete it or change "
                        f"--output (old={old}, new={fp})")
        else:
            with open(fp_path, "w") as f:
                _json.dump(fp, f)

    key = jax.random.key(args.seed)
    all_adv, all_label, all_target = [], [], []
    success = 0
    total = 0
    computed = 0
    stopped_early = False
    for bi, (batch, valid) in enumerate(
            batch_iterator(ds, args.batch_size, pad_last=True)):
        # one split per batch position, skipped or not, so a resumed run
        # sees the identical per-batch key stream
        key, sub = jax.random.split(key)
        shard_path = os.path.join(part_dir, f"batch_{bi:05d}.npz")
        if args.resume and os.path.exists(shard_path):
            try:
                d = np.load(shard_path)
                shard = {k: d[k] for k in
                         ("adv", "label", "target", "succ", "valid")}
            except Exception as e:
                # a shard truncated by a kill mid-write (runs predating
                # the atomic tmp+replace commit) is recomputed, not fatal
                print(f"  [resume] corrupt shard {shard_path} "
                      f"({type(e).__name__}) — recomputing", flush=True)
                os.remove(shard_path)
            else:
                all_adv.append(shard["adv"])
                all_label.append(shard["label"])
                all_target.append(shard["target"])
                success += int(shard["succ"].sum())
                total += int(shard["valid"])
                continue
        if args.stop_after_batches and computed >= args.stop_after_batches:
            stopped_early = True
            break
        pc_np = np.asarray(batch[0], np.float32)
        normal = None
        if pc_np.shape[-1] > 3:
            normal = shard_batch(pc_np[..., 3:6], mesh)
            pc_np = pc_np[..., :3]
        pc = shard_batch(pc_np, mesh)
        label = shard_batch(np.asarray(batch[1]), mesh)
        target = (shard_batch(np.asarray(batch[2]), mesh)
                  if len(batch) > 2 else label)
        adv, succ = run(pc, label, target, normal, sub)
        adv, succ = np.asarray(adv), np.asarray(succ)
        b_label = np.asarray(batch[1][:valid])
        b_target = np.asarray(batch[2][:valid] if len(batch) > 2
                              else batch[1][:valid])
        all_adv.append(adv[:valid])
        all_label.append(b_label)
        all_target.append(b_target)
        success += int(succ[:valid].sum())
        total += valid
        computed += 1
        if args.resume:
            # atomic commit: a kill mid-savez (the exact failure --resume
            # exists for) must not leave a truncated shard that poisons
            # every later resume with BadZipFile
            tmp = shard_path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, adv=adv[:valid], label=b_label,
                         target=b_target, succ=succ[:valid], valid=valid)
            os.replace(tmp, shard_path)
        # per-batch heartbeat: heavyweight victims take minutes/batch
        print(f"  [{args.attack}] {total} clouds done, "
              f"running success {success / max(total, 1):.3f}",
              flush=True)

    if stopped_early:
        rate = success / max(total, 1)
        print(f"stopped after {computed} new batches ({total} clouds in "
              f"shards); rerun with --resume to complete {out}")
        return None, rate

    adv_pc = np.concatenate(all_adv, 0)
    save_npz(out, {
        "test_pc": adv_pc,
        "test_label": np.concatenate(all_label, 0),
        "target_label": np.concatenate(all_target, 0),
    })
    rate = success / max(total, 1)
    MetricsWriter(out + ".metrics.jsonl").write(
        attack=args.attack, model=model_name, data=args.data,
        success_rate=rate, n=total, output=out)
    print(f"attack success rate {rate:.4f}; adversarial npz saved to {out}")
    if args.resume:
        import shutil

        shutil.rmtree(part_dir, ignore_errors=True)
    return out, rate


if __name__ == "__main__":
    main()
