"""White-box attacks: CW family, FGM family, saliency Drop.

All attacks operate on channel-last [B, K, 3] clouds through a generic
`logits_fn(pc) -> [B, num_classes]` closure over the frozen victim model,
so any registry model (or an ensemble) can be attacked.
"""

from if_defense_tpu.attack.losses import (
    logits_adv_loss,
    cross_entropy_adv_loss,
    l2_dist,
    chamfer_dist,
    hausdorff_dist,
    knn_dist,
    chamfer_knn_dist,
    farthest_dist,
)
from if_defense_tpu.attack.clip import (
    clip_points_l2,
    clip_points_linf,
    project_inner_points,
    project_inner_clip_linf,
)
from if_defense_tpu.attack.cw import cw_perturb, cw_add, cw_knn
from if_defense_tpu.attack.cw_cluster import cw_add_cluster, cw_add_object
from if_defense_tpu.attack.fgm import fgm, ifgm, mifgm, pgd
from if_defense_tpu.attack.drop import saliency_drop

__all__ = [
    "logits_adv_loss",
    "cross_entropy_adv_loss",
    "l2_dist",
    "chamfer_dist",
    "hausdorff_dist",
    "knn_dist",
    "chamfer_knn_dist",
    "farthest_dist",
    "clip_points_l2",
    "clip_points_linf",
    "project_inner_points",
    "project_inner_clip_linf",
    "cw_perturb",
    "cw_add",
    "cw_knn",
    "cw_add_cluster",
    "cw_add_object",
    "fgm",
    "ifgm",
    "mifgm",
    "pgd",
    "saliency_drop",
]
