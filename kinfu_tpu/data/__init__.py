from kinfu_tpu.data.synthetic import (  # noqa: F401
    SyntheticScene,
    sphere,
    plane,
    box,
    make_orbit_trajectory,
    make_translation_trajectory,
)
from kinfu_tpu.data.bundled import BundledDataset  # noqa: F401
from kinfu_tpu.data.tum import TUMDataset  # noqa: F401
