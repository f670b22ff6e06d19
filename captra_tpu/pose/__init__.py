from captra_tpu.pose.part_dof import Pose  # noqa: F401
