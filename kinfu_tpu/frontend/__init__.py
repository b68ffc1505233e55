from kinfu_tpu.frontend.depth import (  # noqa: F401
    bilateral_filter,
    pyr_down,
    scale_and_truncate,
)
from kinfu_tpu.frontend.maps import (  # noqa: F401
    vertex_map,
    normal_map,
    resize_points_normals,
    build_measurement_pyramid,
)
