"""End-to-end pipeline tests on synthetic sequences with exact ground truth.

This replaces the reference's only system-level check — eyeballing the viz
window plus the doc/poses.txt golden trajectory (SURVEY.md section 4) — with
a quantitative ATE bound on an analytically rendered sequence.
"""

import numpy as np
import jax.numpy as jnp

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.data.synthetic import (
    default_test_scene,
    make_orbit_trajectory,
    make_translation_trajectory,
)
from kinfu_tpu.eval.ate import ate_rmse
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.pipeline.session import KinFuSession

INTR = Intrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=79.5, cy=59.5)

PARAMS = KinFuParams(
    pyramid_height=2,
    icp_iters=(4, 8),
    volume_dims=(128, 128, 128),
    volume_range=(3.0, 3.0, 3.0),
    max_extracted_points=300_000,
)


def _run_sequence(traj, params=PARAMS):
    scene = default_test_scene()
    sess = KinFuSession(INTR, params)
    for T in traj:
        depth_raw, color = scene.render_frame(T, INTR, depth_scale=params.depth_scale)
        ok = sess.pipeline(color, depth_raw)
        assert ok, "tracking failed on synthetic sequence"
    return sess


def test_pipeline_translation_sequence():
    traj = make_translation_trajectory(8, step=(0.004, 0.0, 0.006))
    sess = _run_sequence(traj)
    assert sess.frame_count == 9
    assert len(sess.pose_record) == 8
    err = ate_rmse(sess.pose_record, traj, align=False)
    assert err < 0.01, f"ATE {err:.4f} m too high"


def test_pipeline_orbit_sequence():
    traj = make_orbit_trajectory(8, angle_step_deg=0.4)
    sess = _run_sequence(traj)
    err = ate_rmse(sess.pose_record, traj, align=False)
    assert err < 0.015, f"ATE {err:.4f} m too high"


def test_pipeline_render_and_extract():
    traj = make_translation_trajectory(3, step=(0.002, 0.0, 0.004))
    sess = _run_sequence(traj)
    img = sess.get_render_map(KinFuSession.PHONG)
    assert img.shape == (INTR.height, INTR.width, 3) and img.dtype == np.uint8
    assert img.max() > 0
    nimg = sess.get_render_map(KinFuSession.NORMAL)
    assert nimg.max() > 0

    pts = sess.extract_pointcloud()
    assert pts.shape[1] == 3 and pts.shape[0] > 1000
    # extracted surface should be near the scene geometry
    d = np.abs(default_test_scene().sdf(pts))
    assert np.percentile(d, 80) < 0.05


def test_pipeline_reset_on_tracking_failure():
    """Frame with no valid geometry -> ICP singular -> in-graph reset
    (kinectfusion.cpp:97-102)."""
    scene = default_test_scene()
    sess = KinFuSession(INTR, PARAMS)
    depth_raw, color = scene.render_frame(np.eye(4), INTR)
    assert sess.pipeline(color, depth_raw)
    # garbage frame: all-zero depth
    ok = sess.pipeline(color, np.zeros_like(depth_raw))
    assert not ok
    assert sess.frame_count == 1
    # engine recovers: next good frame bootstraps again
    assert sess.pipeline(color, depth_raw)
    assert sess.frame_count == 2


def test_pipeline_save_outputs(tmp_path):
    traj = make_translation_trajectory(3, step=(0.002, 0.0, 0.004))
    sess = _run_sequence(traj)
    ply = tmp_path / "cloud.ply"
    sess.save_pointcloud(str(ply))
    assert ply.exists() and ply.stat().st_size > 100

    poses = tmp_path / "poses.txt"
    sess.save_poses(str(poses))
    from kinfu_tpu.io.poses import read_poses_reference_format

    back = read_poses_reference_format(str(poses))
    assert len(back) == len(sess.pose_record)
    np.testing.assert_allclose(back[-1], sess.pose_record[-1], atol=1e-5)
