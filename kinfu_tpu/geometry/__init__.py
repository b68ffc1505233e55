from kinfu_tpu.geometry.se3 import (  # noqa: F401
    Pose,
    identity_pose,
    pose_from_matrix,
    pose_matrix,
    compose,
    inverse,
    transform_points,
    rotate_vectors,
    rodrigues,
    rotvec_from_matrix,
    se3_increment,
)
from kinfu_tpu.geometry.intrinsics import Intrinsics  # noqa: F401
