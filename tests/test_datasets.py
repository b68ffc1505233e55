"""TUM / ICL-NUIM loader + CLI auto-detection tests.

The reference only reads its bundled folder layout (depth_sensor.cpp:13-46);
the TUM/ICL loaders exist for the ATE benchmarks in BASELINE.md. These tests
build tiny synthetic sequences in the real on-disk formats (association
lists with realistic jittered timestamps, 16-bit depth PNGs at 1/5000 m,
TUM-format groundtruth) so the format-parsing paths — exactly the code that
rots silently without data — stay covered without network access.
"""

import os

import numpy as np
import pytest

from kinfu_tpu.config import tiny_params
from kinfu_tpu.data.synthetic import default_test_scene, make_orbit_trajectory
from kinfu_tpu.data.tum import FR1_INTRINSICS, FR2_INTRINSICS, TUMDataset, associate
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.io.images import write_color_png, write_depth_png
from kinfu_tpu.io.poses import write_poses_tum

INTR = Intrinsics(
    width=80, height=64, fx=70.0, fy=70.0, cx=39.5, cy=31.5, depth_scale=1 / 5000
)
PARAMS = tiny_params(dim=64, levels=2).replace(
    icp_iters=(3, 6), depth_scale=1 / 5000
)

#: TUM units per mm: raw synthetic depth is mm-scale, TUM PNGs are 1/5000 m
_MM_TO_TUM = 5.0


def _make_tum_folder(tmp_path, name, n=3, rgb_extra=True):
    """Write a TUM-format sequence of the synthetic test scene.

    Depth timestamps are offset +5 ms from the rgb ones (inside the 20 ms
    association window); with `rgb_extra`, one rgb frame has no depth
    within the window and must be dropped by the association.
    Returns (path, trajectory poses)."""
    root = tmp_path / name
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    scene = default_test_scene()
    traj = make_orbit_trajectory(n, angle_step_deg=0.3)
    rgb_lines = ["# color images", "# timestamp filename"]
    depth_lines = ["# depth images"]
    t0 = 1305031102.175304  # realistic fr1-style epoch timestamp
    ts_list = []
    for i, T in enumerate(traj):
        depth_mm, color = scene.render_frame(T, INTR)
        ts = t0 + i / 30.0
        ts_list.append(ts)
        rgb_f = f"rgb/{ts:.6f}.png"
        depth_f = f"depth/{ts + 0.005:.6f}.png"
        write_color_png(str(root / rgb_f), color)
        write_depth_png(
            str(root / depth_f),
            np.clip(depth_mm * _MM_TO_TUM, 0, 65535).astype(np.uint16),
        )
        rgb_lines.append(f"{ts:.6f} {rgb_f}")
        depth_lines.append(f"{ts + 0.005:.6f} {depth_f}")
    if rgb_extra:
        # an rgb frame with no depth partner within 20 ms -> dropped
        rgb_lines.append(f"{t0 + n / 30.0 + 1.0:.6f} rgb/orphan.png")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    write_poses_tum(str(root / "groundtruth.txt"), traj, ts_list)
    return str(root), traj


def test_associate_nearest_and_maxdt():
    a = [(0.00, "a0"), (0.10, "a1"), (0.20, "a2")]
    b = [(0.004, "b0"), (0.115, "b1"), (0.50, "b2")]
    pairs = associate(a, b, max_dt=0.02)
    assert pairs == [(0, 0), (1, 1)]  # a2's nearest (b2) is 0.3 s away
    # each b is used at most once (greedy, TUM associate.py behaviour)
    a2 = [(0.00, "x"), (0.001, "y")]
    b2 = [(0.0005, "z")]
    assert associate(a2, b2, max_dt=0.02) == [(0, 0)]


def test_tum_loader_association_scaling_and_gt(tmp_path):
    path, traj = _make_tum_folder(tmp_path, "rgbd_dataset_freiburg1_test", n=3)
    ds = TUMDataset(path, intrinsics=INTR)
    assert len(ds) == 3  # orphan rgb dropped
    color, depth = ds[0]
    assert color.dtype == np.uint8 and color.shape == (64, 80, 3)
    assert depth.dtype == np.float32 and depth.shape == (64, 80)
    # depth PNGs store 1/5000 m units; loader returns them raw
    scene = default_test_scene()
    d_mm, c_ref = scene.render_frame(traj[0], INTR)
    np.testing.assert_allclose(
        depth, np.clip(d_mm * _MM_TO_TUM, 0, 65535).astype(np.uint16), atol=0
    )
    np.testing.assert_array_equal(color, c_ref)
    # metric depth via the intrinsics' depth_scale lands within quantization
    np.testing.assert_allclose(
        depth * ds.intrinsics.depth_scale,
        d_mm * 1e-3,
        atol=1e-3,
    )
    # groundtruth parse: timestamps + quaternion->matrix round trip
    assert len(ds.gt_poses) == 3
    np.testing.assert_allclose(ds.gt_timestamps[0], ds.timestamp(0), atol=1e-5)
    np.testing.assert_allclose(ds.gt_poses[2], traj[2], atol=1e-5)


def test_tum_default_intrinsics_by_sequence_name(tmp_path):
    p1, _ = _make_tum_folder(tmp_path, "rgbd_dataset_freiburg1_xyz", n=1)
    p2, _ = _make_tum_folder(tmp_path, "rgbd_dataset_freiburg2_desk", n=1)
    assert TUMDataset(p1).intrinsics == FR1_INTRINSICS
    assert TUMDataset(p2).intrinsics == FR2_INTRINSICS


def test_icl_loader_default_intrinsics(tmp_path):
    from kinfu_tpu.data.icl_nuim import ICL_TUM_FORMAT_INTRINSICS, ICLNuimDataset

    path, _ = _make_tum_folder(tmp_path, "living_room_traj2_frei_png", n=2)
    ds = ICLNuimDataset(path)
    assert ds.intrinsics == ICL_TUM_FORMAT_INTRINSICS
    assert len(ds) == 2
    color, depth = ds[1]
    assert depth.dtype == np.float32 and color.dtype == np.uint8


def _make_bundled_folder(tmp_path, n=2):
    root = tmp_path / "bundled_seq"
    (root / "color").mkdir(parents=True)
    (root / "depth").mkdir()
    scene = default_test_scene()
    traj = make_orbit_trajectory(n, angle_step_deg=0.3)
    for i, T in enumerate(traj):
        depth_mm, color = scene.render_frame(T, INTR)
        write_color_png(str(root / "color" / f"{i:04d}.png"), color)
        write_depth_png(
            str(root / "depth" / f"{i:04d}.png"),
            np.clip(depth_mm, 0, 65535).astype(np.uint16),
        )
    (root / "intr.txt").write_text("70.0 39.5 70.0 31.5 1000\n")
    return str(root)


def test_cli_open_dataset_autodetect(tmp_path):
    from kinfu_tpu.cli import _open_dataset

    tum_path, _ = _make_tum_folder(tmp_path, "rgbd_dataset_freiburg1_auto", n=1)
    ds, kind = _open_dataset(tum_path, "auto")
    assert kind == "tum" and isinstance(ds, TUMDataset)

    bundled_path = _make_bundled_folder(tmp_path)
    ds2, kind2 = _open_dataset(bundled_path, "auto")
    assert kind2 == "bundled" and len(ds2) == 2

    from kinfu_tpu.data.icl_nuim import ICLNuimDataset

    ds3, kind3 = _open_dataset(tum_path, "icl")
    assert kind3 == "icl" and isinstance(ds3, ICLNuimDataset)


@pytest.mark.parametrize("kind", ["tum", "icl"])
def test_session_runs_on_tum_format_folder(tmp_path, kind):
    """End-to-end: folder on disk -> loader -> KinFuSession tracking."""
    from kinfu_tpu.pipeline.session import KinFuSession

    name = (
        "rgbd_dataset_freiburg1_run" if kind == "tum"
        else "living_room_traj0_frei_png"
    )
    path, _ = _make_tum_folder(tmp_path, name, n=3)
    if kind == "tum":
        ds = TUMDataset(path, intrinsics=INTR)
    else:
        from kinfu_tpu.data.icl_nuim import ICLNuimDataset

        ds = ICLNuimDataset(path, intrinsics=INTR)
    sess = KinFuSession(INTR, PARAMS)
    for color, depth in ds.frames():
        assert sess.pipeline(color, depth)
    assert len(sess.pose_record) == 3
    # tiny 0.3 deg/frame orbit: recovered motion must stay small but real
    T = sess.pose_record[-1]
    assert np.abs(T[:3, 3]).max() < 0.1
