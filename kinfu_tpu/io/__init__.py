from kinfu_tpu.io.ply import write_ply, read_ply  # noqa: F401
from kinfu_tpu.io.poses import (  # noqa: F401
    write_poses_reference_format,
    read_poses_reference_format,
    write_poses_tum,
    read_poses_tum,
)
