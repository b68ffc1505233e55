"""Session / checkpoint / sensor / metrics tests (host-side API layer).

The reference's equivalent surface is `kf::kinectfusion` + the main loop
(kinectfusion.h:31-73, main.cpp:64-101); checkpointing and metrics have no
reference equivalent (SURVEY.md section 5)."""

import numpy as np
import pytest

from kinfu_tpu.config import tiny_params
from kinfu_tpu.data.synthetic import default_test_scene, make_orbit_trajectory
from kinfu_tpu.geometry.intrinsics import Intrinsics

INTR = Intrinsics(width=80, height=64, fx=70.0, fy=70.0, cx=39.5, cy=31.5)
PARAMS = tiny_params(dim=64, levels=2).replace(
    icp_iters=(3, 6), max_extracted_points=50_000
)


def _frames(n=4):
    scene = default_test_scene()
    traj = make_orbit_trajectory(n, angle_step_deg=0.3)
    return [scene.render_frame(T, INTR) for T in traj]


@pytest.fixture(scope="module")
def session_after_frames():
    from kinfu_tpu.pipeline.session import KinFuSession

    sess = KinFuSession(INTR, PARAMS)
    for depth, color in _frames(4):
        ok = sess.pipeline(color, depth)
        assert ok
    return sess


def test_session_pose_record(session_after_frames):
    sess = session_after_frames
    assert sess.frame_count == 5  # 4 frames processed, counter starts at 1
    assert len(sess.pose_record) == 4
    np.testing.assert_allclose(sess.pose_record[0], np.eye(4))


def test_session_render_and_extract(session_after_frames):
    sess = session_after_frames
    phong = sess.get_render_map(sess.PHONG)
    assert phong.shape == (INTR.height, INTR.width, 3) and phong.dtype == np.uint8
    assert (phong > 0).mean() > 0.3
    pts = sess.extract_pointcloud()
    assert pts.shape[1] == 3 and len(pts) > 100


def test_checkpoint_roundtrip(tmp_path, session_after_frames):
    from kinfu_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    sess = session_after_frames
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, sess)
    restored = load_checkpoint(path)

    assert restored.frame_count == sess.frame_count
    assert len(restored.pose_record) == len(sess.pose_record)
    np.testing.assert_array_equal(
        np.asarray(restored.state.vol.tsdf), np.asarray(sess.state.vol.tsdf)
    )
    np.testing.assert_allclose(
        np.asarray(restored.state.pose.t), np.asarray(sess.state.pose.t)
    )
    # the restored session keeps tracking
    depth, color = _frames(5)[-1]
    assert restored.pipeline(color, depth)


def test_streaming_session_tracks_and_checkpoints(tmp_path):
    """Streaming (camera-following) mode through the public session API,
    including checkpoint round-trip with the grid offset."""
    from kinfu_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from kinfu_tpu.pipeline.session import KinFuSession

    sess = KinFuSession(INTR, PARAMS, streaming=True)
    for depth, color in _frames(3):
        assert sess.pipeline(color, depth)
    assert sess.frame_count == 4
    phong = sess.get_render_map(sess.PHONG)
    assert phong.shape == (INTR.height, INTR.width, 3)
    pts = sess.extract_pointcloud()
    assert len(pts) > 100

    path = str(tmp_path / "stream.npz")
    save_checkpoint(path, sess)
    restored = load_checkpoint(path)
    assert restored.streaming
    np.testing.assert_array_equal(
        np.asarray(restored.state.origin_vox), np.asarray(sess.state.origin_vox)
    )
    depth, color = _frames(4)[-1]
    assert restored.pipeline(color, depth)


def test_synthetic_sensor_iterates():
    from kinfu_tpu.data.sensor import SyntheticSensor

    scene = default_test_scene()
    sensor = SyntheticSensor(scene, make_orbit_trajectory(3), INTR)
    frames = list(sensor)
    assert len(frames) == 3
    color, depth = frames[0]
    assert color.shape == (INTR.height, INTR.width, 3)
    assert depth.shape == (INTR.height, INTR.width)
    assert sensor.get_frame() is None


def test_live_sensor_raises_clear_error():
    from kinfu_tpu.data.sensor import open_sensor

    with pytest.raises(RuntimeError, match="vendor SDK"):
        open_sensor("kinect2")


def test_metrics_recorder(tmp_path):
    from kinfu_tpu.utils.metrics import FrameMetrics, MetricsRecorder

    path = str(tmp_path / "m.jsonl")
    rec = MetricsRecorder(jsonl_path=path)
    for i in range(3):
        rec.record(FrameMetrics(frame=i, tracking_ok=i != 1, total_ms=10.0 + i))
    rec.close()
    s = rec.summary()
    assert s["frames"] == 3 and s["tracking_failures"] == 1
    import json

    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 3 and lines[2]["frame"] == 2


def test_streaming_corridor_scale():
    """Corridor-scale sequence (BASELINE.json config 4): the camera walks
    1.4 m forward — the moving volume must shift its grid (origin_vox
    changes) and tracking must survive with small ATE, all through the
    public session API."""
    from kinfu_tpu.data.synthetic import make_translation_trajectory
    from kinfu_tpu.eval.ate import ate_rmse
    from kinfu_tpu.pipeline.session import KinFuSession

    traj = make_translation_trajectory(100, step=(0.0, 0.0, 0.014))
    scene = default_test_scene()
    frames = [scene.render_frame(T, INTR) for T in traj]
    gt = [np.linalg.inv(traj[0]) @ T for T in traj]

    sess = KinFuSession(INTR, PARAMS, streaming=True)
    for d, c in frames:
        assert sess.pipeline(c, d)
    assert np.any(np.asarray(sess.state.origin_vox) != 0), "grid never shifted"
    ate = ate_rmse(sess.pose_record, gt[: len(sess.pose_record)])
    assert ate < 0.05, ate
