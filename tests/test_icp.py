import numpy as np
import jax.numpy as jnp

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.data.synthetic import default_test_scene
from kinfu_tpu.frontend.maps import normal_map, vertex_map
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import pose_matrix, rodrigues
from kinfu_tpu.tracking.icp import rigid_icp

INTR = Intrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=79.5, cy=59.5)


def _maps_for_pose(scene, T_w_from_c):
    depth = scene.render_depth(T_w_from_c, INTR)
    vm = vertex_map(jnp.asarray(depth), INTR)
    nm = normal_map(vm)
    return vm, nm


def _run_icp(T_prev, T_cur, params):
    scene = default_test_scene()
    pv, pn = _maps_for_pose(scene, T_prev)
    cv, cn = _maps_for_pose(scene, T_cur)
    return rigid_icp([cv], [cn], [pv], [pn], INTR, params)


PARAMS = KinFuParams(pyramid_height=1, icp_iters=(10,))


def test_icp_identity():
    T = np.eye(4, dtype=np.float32)
    res = _run_icp(T, T, PARAMS)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.pose.R), np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.pose.t), 0.0, atol=1e-4)
    assert int(res.num_inliers) > 5000


def test_icp_recovers_small_translation():
    """Ground truth: increment = prev_cam <- cur_cam transform."""
    T_prev = np.eye(4, dtype=np.float32)
    T_cur = np.eye(4, dtype=np.float32)
    T_cur[:3, 3] = [0.01, -0.005, 0.008]
    res = _run_icp(T_prev, T_cur, PARAMS)
    assert bool(res.ok)
    est = np.asarray(pose_matrix(res.pose))
    expected = np.linalg.inv(T_prev) @ T_cur
    np.testing.assert_allclose(est, expected, atol=1.5e-3)


def test_icp_recovers_small_rotation():
    T_prev = np.eye(4, dtype=np.float32)
    T_cur = np.eye(4, dtype=np.float32)
    R = np.asarray(rodrigues(jnp.array([0.0, 0.01, 0.005])))
    T_cur[:3, :3] = R
    res = _run_icp(T_prev, T_cur, PARAMS)
    assert bool(res.ok)
    est = np.asarray(pose_matrix(res.pose))
    expected = np.linalg.inv(T_prev) @ T_cur
    np.testing.assert_allclose(est, expected, atol=2e-3)


def test_icp_coarse_to_fine():
    """3-level pyramid with the reference's {4,5,10} schedule.

    Runs at 320x240: the dist/angle gates are calibrated for real sensor
    resolutions — at a 40x30 coarsest level the half-pixel association error
    (z * 0.5 / f ~ 26 mm) alone exceeds the 15 mm gate and ICP cannot
    converge there, at any implementation fidelity.
    """
    from kinfu_tpu.frontend.maps import resize_points_normals

    intr = Intrinsics(width=320, height=240, fx=280.0, fy=280.0, cx=159.5, cy=119.5)
    scene = default_test_scene()
    params = KinFuParams(pyramid_height=3, icp_iters=(4, 5, 10))
    T_prev = np.eye(4, dtype=np.float32)
    T_cur = np.eye(4, dtype=np.float32)
    T_cur[:3, 3] = [0.02, 0.01, -0.015]

    def pyramid(T):
        depth = scene.render_depth(T, intr)
        vm = vertex_map(jnp.asarray(depth), intr)
        nm = normal_map(vm)
        vs, ns = [vm], [nm]
        for _ in range(2):
            v, n = resize_points_normals(vs[-1], ns[-1])
            vs.append(v)
            ns.append(n)
        return vs, ns

    pv, pn = pyramid(T_prev)
    cv, cn = pyramid(T_cur)
    res = rigid_icp(cv, cn, pv, pn, intr, params)
    assert bool(res.ok)
    est = np.asarray(pose_matrix(res.pose))
    expected = np.linalg.inv(T_prev) @ T_cur
    np.testing.assert_allclose(est, expected, atol=2e-3)


def test_icp_fails_without_geometry():
    """Empty maps -> singular system -> tracking failure flag
    (icp_registration.cpp:35-37 semantics)."""
    zeros = jnp.zeros((INTR.height, INTR.width, 3), jnp.float32)
    res = rigid_icp([zeros], [zeros], [zeros], [zeros], INTR, PARAMS)
    assert not bool(res.ok)
