from captra_tpu.ops.pointops import (  # noqa: F401
    ball_group,
    ball_query,
    farthest_point_sample,
    gather_points,
    gather_xyz,
    group_points,
    knn,
    square_distance,
    three_interp_rows,
    three_interpolate,
    three_nn,
)
