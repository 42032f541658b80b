"""Utilities: checkpointing, metrics sink, seeding."""

from if_defense_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint
from if_defense_tpu.utils.metrics import MetricsWriter

__all__ = ["save_checkpoint", "restore_checkpoint", "MetricsWriter"]
