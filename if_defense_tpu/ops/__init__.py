"""Point-cloud kernel library (TPU-first).

Every op is a pure function over fixed-shape arrays, jit/vmap/grad friendly.
The pairwise-distance family is expressed as batched matmuls so XLA tiles it
onto the MXU; sequential ops (FPS) use `lax.fori_loop` with an optional
Pallas fast path.
"""

from if_defense_tpu.ops.pointops import (
    square_distance,
    index_points,
    gather_neighbors,
    knn_points,
    knn_self,
    farthest_point_sample,
    query_ball_point,
    pairwise_self_distance,
)
from if_defense_tpu.ops.distances import (
    chamfer_distance,
    hausdorff_distance,
)
from if_defense_tpu.ops.scatter import (
    scatter_mean_2d,
    scatter_max_2d,
)
from if_defense_tpu.ops.interp import (
    bilinear_plane_sample,
    plane_sample,
)
from if_defense_tpu.ops.normalize import (
    normalize_unit_sphere,
    normalize_unit_cube,
)
from if_defense_tpu.ops.metrics3d import compute_iou

__all__ = [
    "square_distance",
    "index_points",
    "gather_neighbors",
    "knn_points",
    "knn_self",
    "farthest_point_sample",
    "query_ball_point",
    "pairwise_self_distance",
    "chamfer_distance",
    "hausdorff_distance",
    "scatter_mean_2d",
    "scatter_max_2d",
    "bilinear_plane_sample",
    "plane_sample",
    "normalize_unit_sphere",
    "normalize_unit_cube",
    "compute_iou",
]
