"""Orbax checkpointing with true resume.

Upgrades the reference's save-only `.pth` snapshots (`baselines/train.py:
108-124` — no optimizer state, no resume) to full train-state checkpoints:
params + batch_stats + optimizer state + step/epoch metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp


def save_checkpoint(path: str, state, metadata: dict | None = None) -> str:
    """Save a flax TrainState (or any pytree) plus a metadata dict.

    Arrays go through orbax; metadata (strings/numbers) goes to a JSON
    sidecar `<path>.meta.json` since StandardCheckpointer is arrays-only.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if metadata:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f, default=float)
    return path


def restore_checkpoint(path: str, state) -> tuple[Any, dict]:
    """Restore into the structure of `state`; returns (state, metadata)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = ckptr.restore(path, template)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, load_metadata(path)


def load_metadata(path: str) -> dict:
    meta_path = os.path.abspath(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def restore_checkpoint_raw(path: str) -> dict:
    """Restore a checkpoint without a template (raw numpy pytree).

    Template-less restore is deliberate here — the model architecture is
    chosen FROM the checkpoint's metadata sidecar, so no target tree can
    exist yet. Orbax logs an UNSAFE warning for every such restore; it's
    suppressed for this one known-safe call (the tree feeds build_model,
    which validates shapes on first apply) rather than globally. The
    suppression is a message-targeted logging.Filter, not a level change,
    so concurrent restores / unrelated absl warnings during the window
    are unaffected (ADVICE r3).
    """
    import logging

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()

    class _DropTemplateLessWarning(logging.Filter):
        def filter(self, record):
            try:
                msg = record.getMessage()
            except Exception:
                return True
            return "expects a target tree to be provided" not in msg

    logger = logging.getLogger("absl")
    flt = _DropTemplateLessWarning()
    logger.addFilter(flt)
    try:
        out = dict(ckptr.restore(path))
    finally:
        logger.removeFilter(flt)
    out["metadata"] = load_metadata(path)
    return out


def save_params(path: str, params) -> str:
    """Save bare params (for frozen pretrained nets, e.g. PU-Net/ONet)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def restore_params(path: str, template) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def save_eval_checkpoint(path: str, variables: dict,
                         metadata: dict | None = None) -> str:
    """Save eval-only model variables as a CLI-loadable checkpoint.

    Writes the same layout `save_checkpoint` produces for a TrainState
    (params / batch_stats / step, no optimizer state) so
    `restore_checkpoint_raw` → `load_eval_model` accept it. This is the
    landing format for weights converted from reference `.pth` files
    (`convert/victim_weights.py`) — the equivalent of dropping a
    BEST_WEIGHTS entry into `baselines/config.py:4-41`.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats"),
        "step": 0,
    }
    if payload["batch_stats"] is None:
        del payload["batch_stats"]
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if metadata:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f, default=float)
    return path
