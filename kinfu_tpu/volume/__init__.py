from kinfu_tpu.volume.tsdf import (  # noqa: F401
    TSDFVolume,
    create_volume,
    reset_volume,
    pack_rgb,
    unpack_rgb,
    tsdf_to_float,
    tsdf_to_fixed,
)
from kinfu_tpu.volume.integrate import integrate  # noqa: F401
from kinfu_tpu.volume.raycast import raycast  # noqa: F401
from kinfu_tpu.volume.extract import extract_points  # noqa: F401
