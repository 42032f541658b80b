"""Victim-classifier training CLI.

Mirrors `baselines/train.py` (and, with --def_data, `hybrid_train.py`):
Adam(1e-3, wd 1e-4) + cosine anneal, periodic eval, best-checkpoint
snapshot. Batches are sharded over the device mesh's batch axis.

Usage:
    python -m if_defense_tpu.cli.train --data mn40.npz --model pointnet \
        --epochs 200 --batch_size 32 --output runs/pointnet
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from if_defense_tpu.data import ModelNet40, ModelNet40Hybrid, batch_iterator
from if_defense_tpu.models import build_model
from if_defense_tpu.parallel import best_data_mesh, shard_batch
from if_defense_tpu.training import (
    AverageMeter,
    create_train_state,
    eval_variables,
    make_eval_step,
    make_train_step,
)
from if_defense_tpu.utils import MetricsWriter, save_checkpoint


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a victim classifier")
    p.add_argument("--data", required=True, help="dataset npz path")
    p.add_argument("--def_data", default=None,
                   help="defended npz for hybrid training")
    p.add_argument("--model", default="pointnet",
                   choices=["pointnet", "pointnet2", "dgcnn", "pointconv", "rscnn"])
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--smoothing", action="store_true",
                   help="eps-0.2 label smoothing (off in the reference recipe)")
    p.add_argument("--feature_transform", action="store_true")
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--output", default="runs/train")
    p.add_argument("--registry", default=None,
                   help="registry JSON to record the best checkpoint in "
                        "(default weights/registry.json)")
    p.add_argument("--resume", default=None,
                   help="checkpoint path to resume from (params, optimizer "
                        "state, batch stats, epoch — the reference's "
                        "train.py:228 can only hard-start)")
    p.add_argument("--seed", type=int, default=1)
    return p.parse_args(argv)


def evaluate(eval_step, state, dataset, batch_size, mesh):
    correct, total = 0, 0
    variables = eval_variables(state)
    for (pc, label), valid in batch_iterator(dataset, batch_size, pad_last=True):
        pc = shard_batch(pc.astype(np.float32), mesh)
        logits = np.asarray(eval_step(variables, pc))
        pred = logits.argmax(-1)[:valid]
        correct += int((pred == label[:valid]).sum())
        total += valid
    return correct / max(total, 1)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output, exist_ok=True)
    metrics = MetricsWriter(os.path.join(args.output, "metrics.jsonl"))
    mesh = best_data_mesh(args.batch_size)

    if args.def_data:
        train_ds = ModelNet40Hybrid(
            args.data, args.def_data, args.num_points, partition="train",
            seed=args.seed)
        test_ds = ModelNet40Hybrid(
            args.data, args.def_data, args.num_points, partition="test",
            subset="ori", seed=args.seed)
        def_test_ds = ModelNet40Hybrid(
            args.data, args.def_data, args.num_points, partition="test",
            subset="def", seed=args.seed)
    else:
        train_ds = ModelNet40(args.data, args.num_points, partition="train",
                              seed=args.seed)
        test_ds = ModelNet40(args.data, args.num_points, partition="test",
                             seed=args.seed)
        def_test_ds = None

    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    model = build_model(args.model, feature_transform=args.feature_transform) \
        if args.model == "pointnet" else build_model(args.model)

    rng = jax.random.key(args.seed)
    sample = np.zeros((args.batch_size, args.num_points, 3), np.float32)
    state = create_train_state(
        model, rng, sample,
        learning_rate=args.lr, weight_decay=args.weight_decay,
        total_epochs=args.epochs, steps_per_epoch=steps_per_epoch,
    )
    start_epoch = 1
    if args.resume:
        from if_defense_tpu.utils import restore_checkpoint

        state, meta = restore_checkpoint(args.resume, state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        print(f"resumed from {args.resume} at epoch {start_epoch}")

    train_step = make_train_step(
        model, smoothing=args.smoothing,
        fea_reg_weight=0.001 if args.feature_transform else 0.0,
    )
    eval_step = make_eval_step(model)

    best_acc, best_epoch = 0.0, 0
    best_def_acc, best_def_epoch = 0.0, 0
    dropout_rng = jax.random.key(args.seed + 1)
    for epoch in range(start_epoch, args.epochs + 1):
        loss_meter, acc_meter = AverageMeter(), AverageMeter()
        t0 = time.time()
        for (pc, label), valid in batch_iterator(
            train_ds, args.batch_size, shuffle=True, drop_last=True,
            seed=args.seed + epoch,
        ):
            dropout_rng, step_rng = jax.random.split(dropout_rng)
            pc, label = shard_batch((pc.astype(np.float32), label), mesh)
            state, m = train_step(state, pc, label, step_rng)
            loss_meter.update(float(m["loss"]), len(label))
            acc_meter.update(float(m["acc"]), len(label))
        if epoch % args.eval_every == 0 or epoch > args.epochs - 20:
            acc = evaluate(eval_step, state, test_ds, args.batch_size, mesh)
            record = {
                "epoch": epoch, "train_loss": loss_meter.avg,
                "train_acc": acc_meter.avg, "test_acc": acc,
                "epoch_time": time.time() - t0,
            }
            def_acc = None
            if def_test_ds is not None:
                def_acc = evaluate(
                    eval_step, state, def_test_ds, args.batch_size, mesh)
                record["def_test_acc"] = def_acc
            metrics.write(**record)
            # ">= at first eval": an all-wrong eval (acc exactly 0.0)
            # must still produce a "best" checkpoint, or downstream
            # consumers (attack/inference on <output>/best) hit a
            # missing path; the reference's torch.save-on-improvement
            # has the same latent gap but its 200-epoch runs never
            # stay at 0.0 (`baselines/train.py:121-124`)
            if acc > best_acc or best_epoch == 0:
                best_acc, best_epoch = acc, epoch
            if def_acc is not None and (def_acc > best_def_acc
                                        or best_def_epoch == 0):
                best_def_acc, best_def_epoch = def_acc, epoch
            # hybrid training snapshots the BEST checkpoint by DEFENDED
            # accuracy (`baselines/hybrid_train.py:130-135`); clean
            # training by ori accuracy (`train.py:121-124`)
            is_best = (def_acc is not None and best_def_epoch == epoch
                       if def_test_ds is not None
                       else best_epoch == epoch)
            if is_best:
                save_checkpoint(
                    os.path.join(args.output, "best"),
                    state,
                    {"model": args.model, "epoch": epoch, "acc": acc,
                     **({"def_acc": def_acc} if def_acc is not None
                        else {}),
                     "num_points": args.num_points},
                )
        else:
            metrics.write(epoch=epoch, train_loss=loss_meter.avg,
                          train_acc=acc_meter.avg,
                          epoch_time=time.time() - t0)
    save_checkpoint(
        os.path.join(args.output, "final"), state,
        {"model": args.model, "epoch": args.epochs,
         "num_points": args.num_points},
    )
    if best_epoch > 0 or best_def_epoch > 0:
        from if_defense_tpu.utils.registry import register_checkpoint

        register_checkpoint(
            os.path.basename(args.data).replace(".npz", ""), args.model,
            os.path.join(args.output, "best"), args.num_points,
            path=args.registry)
    final = {"best_acc": best_acc, "best_epoch": best_epoch}
    if def_test_ds is not None:
        final.update(best_def_acc=best_def_acc,
                     best_def_epoch=best_def_epoch)
    metrics.write(**final)
    return best_acc


if __name__ == "__main__":
    main()
