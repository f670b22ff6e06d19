from captra_tpu.tracking.tracker import (  # noqa: F401
    TrackAux,
    init_pose_from_gt,
    make_track_step,
    track_trajectory,
)
