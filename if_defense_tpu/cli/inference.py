"""Evaluation CLI: accuracy / targeted-attack success of an npz vs a victim.

Mirrors `baselines/inference.py`: normal mode reports accuracy; target mode
also reports targeted success (pred == target). Point-count auto-adjustment
for Add-family attack outputs (+512 Add, +3*32 Cluster, +3*64 Object —
`baselines/inference.py:127-149`) is applied from the filename, like the
reference.

Usage:
    python -m if_defense_tpu.cli.inference --data adv.npz \
        --checkpoint runs/pointnet/best [--mode target]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from if_defense_tpu.data import ModelNet40, ModelNet40Attack, batch_iterator
from if_defense_tpu.models import build_model
from if_defense_tpu.parallel import best_data_mesh, shard_batch
from if_defense_tpu.training import make_eval_step
from if_defense_tpu.utils import MetricsWriter
from if_defense_tpu.utils.cache import BoundedCache
from if_defense_tpu.utils.checkpoint import restore_checkpoint_raw


def class_margins(logits: np.ndarray, cls: np.ndarray) -> np.ndarray:
    """Margin of class `cls` vs the best OTHER class, per row.

    Positive = `cls` wins argmax by that much. Used by --boundary_tau
    scoring: robust-correct requires margin(label) > tau; targeted
    success requires margin(target) > -tau (CW stops at margin 0, so
    boundary examples count as successful on every backend)."""
    own = np.take_along_axis(logits, cls[:, None], axis=-1)[:, 0]
    masked = logits.copy()
    np.put_along_axis(masked, cls[:, None], -np.inf, axis=-1)
    return own - masked.max(-1)


def adjust_num_points(num_points: int, data_path: str) -> int:
    """Add-family attacks append points; grow the eval cloud accordingly."""
    name = os.path.basename(data_path).lower()
    if "add" in name:
        if "cluster" in name:
            return num_points + 3 * 32
        if "object" in name:
            return num_points + 3 * 64
        return num_points + 512
    return num_points


def resolve_checkpoint(checkpoint: str, model_name: str | None = None,
                       num_points: int = 1024,
                       registry: str | None = None) -> str:
    """Resolve a `registry:<dataset>` name to its checkpoint path.

    The registry is the BEST_WEIGHTS equivalent (`baselines/config.py:
    4-41`), keyed by (dataset, model, num_points) as `inference.py:152,
    184-187` did. Plain paths pass through unchanged.
    """
    if checkpoint.startswith("registry:"):
        from if_defense_tpu.utils.registry import lookup_checkpoint

        if model_name is None:
            raise ValueError("registry: checkpoints need --model")
        checkpoint = lookup_checkpoint(
            checkpoint[len("registry:"):], model_name, num_points, registry)
    return checkpoint


def load_eval_model(checkpoint: str, model_name: str | None = None,
                    num_points: int = 1024, registry: str | None = None):
    """Restore a checkpoint into eval variables; returns (model, vars,
    meta). `registry:` names resolve via `resolve_checkpoint`."""
    checkpoint = resolve_checkpoint(
        checkpoint, model_name, num_points, registry)
    raw = restore_checkpoint_raw(checkpoint)
    meta = raw.get("metadata", {})
    name = model_name or meta.get("model")
    if name is None:
        raise ValueError(
            "checkpoint has no model metadata; pass --model explicitly"
        )
    model = build_model(str(name))
    variables = {"params": raw["params"]}
    if raw.get("batch_stats") is not None:
        variables["batch_stats"] = raw["batch_stats"]
    return model, variables, meta


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate accuracy / attack success")
    p.add_argument("--data", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default=None,
                   help="override model name from checkpoint metadata")
    p.add_argument("--mode", default="normal", choices=["normal", "target"])
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--no_adjust_points", action="store_true")
    p.add_argument("--normalize", action="store_true",
                   help="re-normalize clouds (reference default is off "
                        "for defended data)")
    p.add_argument("--metrics_out", default=None)
    p.add_argument("--registry", default=None,
                   help="registry JSON for registry:<dataset> checkpoints")
    p.add_argument("--boundary_tau", type=float, default=0.0,
                   help="margin-tolerant scoring for adversarial npz: "
                        "count an example CORRECT only if the true "
                        "logit beats every other by > tau, and count "
                        "targeted SUCCESS if the target logit is within "
                        "tau of the top (CW stops exactly at the "
                        "decision boundary, so plain argmax flips with "
                        "backend float noise). Implies f32-HIGHEST "
                        "matmul precision for the eval forward, so TPU "
                        "and CPU logits agree to ~1e-3 and a small tau "
                        "absorbs the residue (tools/calibrate_tau.py "
                        "has the measurement). 0 = exact argmax at "
                        "backend-default precision (reference "
                        "semantics, `baselines/inference.py`)")
    return p.parse_args(argv)


_EVAL_CACHE = BoundedCache()


def _load_eval_cached(args):
    """(model, variables, meta, eval_step), cached across main() calls.

    Scoring many npz files against one victim in a single process (the
    reference's `inference.py` loop, our benchmark drivers) must not
    re-restore the checkpoint and re-jit the eval step per file —
    through the remote-compile tunnel that overhead dwarfs the actual
    320-cloud evaluation. registry: names are resolved BEFORE keying
    (the registry file is re-read each call), and the key includes the
    resolved path's mtime — so both a re-registered and a re-trained
    checkpoint are picked up. num_points is deliberately NOT in the key:
    it only matters for registry resolution (already done), and the
    matrix driver scores per-file point counts (1024, +512 add, +96
    cluster, ...) against ONE victim — keying on it would re-restore the
    same checkpoint per count. FIFO-bounded so a long sweep over many
    victims can't pin unbounded device-resident params."""
    ck = resolve_checkpoint(
        args.checkpoint, args.model, args.num_points, args.registry)
    mtime = os.path.getmtime(ck) if os.path.exists(ck) else None
    key = (os.path.abspath(ck), mtime, args.model)

    def build():
        model, variables, meta = load_eval_model(ck, args.model)
        return model, variables, meta, make_eval_step(model)

    return _EVAL_CACHE.get_or_build(key, build)


def main(argv=None):
    args = parse_args(argv)
    model, variables, meta, eval_step = _load_eval_cached(args)
    mesh = best_data_mesh(args.batch_size)

    num_points = args.num_points
    if not args.no_adjust_points:
        num_points = adjust_num_points(num_points, args.data)

    if args.mode == "target":
        ds = ModelNet40Attack(args.data, num_points, normalize=args.normalize)
    else:
        ds = ModelNet40(
            args.data, num_points, normalize=args.normalize,
            partition="test", augmentation=False,
        )

    import contextlib

    import jax

    tau = args.boundary_tau
    # tau-scoring pins matmuls to 3-pass f32 so the margins being
    # thresholded are backend-stable (TPU default runs bf16-input
    # matmuls: logit deltas vs CPU up to ~0.8 on DGCNN — far above any
    # sensible tau). The precision config participates in the jit cache
    # key, so the pinned trace coexists with the default one.
    prec_ctx = (jax.default_matmul_precision("highest") if tau > 0.0
                else contextlib.nullcontext())
    correct, success, total = 0, 0, 0
    with prec_ctx:
        for batch, valid in batch_iterator(
                ds, args.batch_size, pad_last=True):
            pc = shard_batch(batch[0].astype(np.float32), mesh)
            logits = np.asarray(eval_step(variables, pc))[:valid]
            label = batch[1][:valid]
            if tau > 0.0:
                correct += int(
                    (class_margins(logits, label) > tau).sum())
            else:
                pred = logits.argmax(-1)
                correct += int((pred == label).sum())
            total += valid
            if args.mode == "target":
                target = batch[2][:valid]
                if tau > 0.0:
                    success += int(
                        (class_margins(logits, target) > -tau).sum())
                else:
                    success += int((pred == target).sum())

    acc = correct / max(total, 1)
    out = {"data": args.data, "model": meta.get("model", args.model),
           "num_points": num_points, "accuracy": acc, "n": total}
    if tau > 0.0:
        out["boundary_tau"] = tau
    if args.mode == "target":
        out["target_success"] = success / max(total, 1)
    MetricsWriter(args.metrics_out).write(**out)
    return out


if __name__ == "__main__":
    main()
