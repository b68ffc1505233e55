"""KinFuParams validation and derived-value tests."""

import numpy as np
import pytest

from kinfu_tpu.config import KinFuParams


def test_mode_validation_rejects_typos():
    for field in ("icp_mode", "integrate_mode", "raycast_mode", "fused_mode"):
        with pytest.raises(ValueError, match=field):
            KinFuParams(**{field: "On"})
        with pytest.raises(ValueError, match=field):
            KinFuParams(**{field: "true"})


def test_mode_validation_accepts_choices():
    KinFuParams(
        icp_mode="warped",
        integrate_mode="gather",
        raycast_mode="hier",
        fused_mode="off",
    )


def test_derived_defaults_match_reference():
    """kinectfusion.cpp:181-186: trunc = 2.1 * voxel size, origin at
    (-range/2, -range/2, +0.5)."""
    p = KinFuParams()
    assert np.isclose(p.trunc_dist, 2.1 * 3.0 / 512)
    assert p.volume_origin == (-1.5, -1.5, 0.5)
    assert np.allclose(p.voxel_size, 3.0 / 512)
    T = p.volume_pose
    assert np.allclose(T[:3, :3], np.eye(3))
    assert np.allclose(T[:3, 3], (-1.5, -1.5, 0.5))
