from open3dsot_tpu.ops.sampling import furthest_point_sample
from open3dsot_tpu.ops.neighbors import ball_query, knn
from open3dsot_tpu.ops.grouping import gather_points, group_points

__all__ = [
    "furthest_point_sample",
    "ball_query",
    "knn",
    "gather_points",
    "group_points",
]
