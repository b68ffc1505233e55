"""Offline 3D visualization tests (pipeline/viz3d.py) + coloured extraction.

Reference analogue: the cv::viz 3D window of cloud + cube + frustum
(main.cpp:82-86) and its golden doc/3D.png. Here the render is an offline
numpy projection so it is exactly testable.
"""

import numpy as np

from kinfu_tpu.config import tiny_params
from kinfu_tpu.data.synthetic import default_test_scene, make_orbit_trajectory
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.pipeline.viz3d import _CUBE_RGB, _FRUSTUM_RGB, _TRAJ_RGB, render_3d_view

INTR = Intrinsics(width=80, height=64, fx=70.0, fy=70.0, cx=39.5, cy=31.5)
PARAMS = tiny_params(dim=64, levels=2).replace(
    icp_iters=(3, 6), max_extracted_points=50_000
)


def _count_color(img, rgb):
    return int(np.all(img == np.array(rgb, np.uint8), axis=-1).sum())


def test_render_3d_view_contents():
    rng = np.random.default_rng(0)
    # a flat patch of points centred in the default volume
    pts = np.stack(
        [
            rng.uniform(-1.0, 1.0, 4000),
            rng.uniform(-1.0, 1.0, 4000),
            np.full(4000, 2.0),
        ],
        axis=-1,
    )
    traj = [np.eye(4, dtype=np.float32) for _ in range(5)]
    for i, T in enumerate(traj):
        T[0, 3] = 0.1 * i
    vol_pose = np.eye(4, dtype=np.float32)
    vol_pose[:3, 3] = [-1.5, -1.5, 0.5]
    img = render_3d_view(
        pts,
        trajectory=traj,
        cur_pose=traj[-1],
        volume_pose=vol_pose,
        volume_extent=(3.0, 3.0, 3.0),
        width=320,
        height=240,
    )
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # all three overlays must actually be drawn
    assert _count_color(img, _CUBE_RGB) > 100
    assert _count_color(img, _TRAJ_RGB) > 20
    assert _count_color(img, _FRUSTUM_RGB) > 20
    # points rendered: some pixels are neither background gradient nor
    # any overlay colour
    overlay = sum(_count_color(img, c) for c in (_CUBE_RGB, _TRAJ_RGB, _FRUSTUM_RGB))
    non_bg = int(
        (np.abs(img.astype(int) - img[:, :1, :].astype(int)).max(axis=-1) > 25).sum()
    )
    assert non_bg - overlay > 500


def test_render_3d_view_explicit_colors_and_viewpoint():
    pts = np.array([[0.0, 0.0, 2.0]] * 50, np.float64) + np.random.default_rng(
        1
    ).normal(0, 0.05, (50, 3))
    cols = np.full((50, 3), [255, 0, 0], np.uint8)
    img = render_3d_view(
        pts,
        colors=cols,
        eye=np.array([0.0, 0.0, 0.0]),
        target=np.array([0.0, 0.0, 2.0]),
        width=160,
        height=120,
    )
    assert _count_color(img, (255, 0, 0)) >= 4  # splats visible, dead centre-ish


def test_session_render_3d_and_colored_extract(tmp_path):
    from kinfu_tpu.pipeline.session import KinFuSession

    scene = default_test_scene()
    sess = KinFuSession(INTR, PARAMS)
    for T in make_orbit_trajectory(3, angle_step_deg=0.3):
        d, c = scene.render_frame(T, INTR)
        assert sess.pipeline(c, d)

    pts, cols = sess.extract_pointcloud_colored()
    assert len(pts) > 100 and cols.shape == (len(pts), 3)
    assert cols.dtype == np.uint8 and cols.max() > 0
    # colored and plain extraction agree on geometry
    plain = sess.extract_pointcloud()
    assert len(plain) == len(pts)
    np.testing.assert_allclose(pts, plain, atol=1e-6)

    img = sess.render_3d(width=320, height=240)
    assert img.shape == (240, 320, 3)
    assert _count_color(img, _CUBE_RGB) > 50
    assert _count_color(img, _FRUSTUM_RGB) > 10

    out = tmp_path / "3d.png"
    sess.save_3d(str(out), width=320, height=240)
    from kinfu_tpu.io.images import read_color_png

    assert read_color_png(str(out)).shape == (240, 320, 3)
