"""Combined production-path test (VERDICT r2 weak #9): the composition
that actually runs on TPU — warped Pallas integrate + warped raycast +
warped ICP, fused into one lax.switch per frame (ops/fused_step.py) — is
exercised here as one tracked interpret-mode sequence, not just as per-
kernel parity fixtures.

Two properties:
  1. the fused switch is numerically identical to the same warped kernels
     called through the separate dispatchers (fused_mode on vs off);
  2. the all-warped tracked trajectory stays accurate against exact
     synthetic ground truth.
"""

import numpy as np
import jax.numpy as jnp

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.data.synthetic import default_test_scene, make_orbit_trajectory
from kinfu_tpu.eval.ate import ate_rmse
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.pipeline.kinfu import init_state, make_step_fn
from kinfu_tpu.volume.tsdf import tsdf_to_float

INTR = Intrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=79.5, cy=59.5)

ALL_WARPED = dict(
    pyramid_height=2,
    icp_iters=(3, 4),
    volume_dims=(128,) * 3,
    volume_range=(3.0,) * 3,
    integrate_mode="warped",
    raycast_mode="warped",
    icp_mode="warped",
    # quarter-area face grid: interpret-mode sweep cost scales with
    # face_rows x face_cols x planes, and the on-vs-off parity compares
    # like against like, so the production 640 face adds nothing here
    raycast_face=(256, 104.0),
)


_STEP_FNS = {}


def _track(params, frames):
    # share the jitted step across tests with identical params (the fused
    # on/off traces dominate wall time; needs --dist loadfile)
    if params not in _STEP_FNS:
        _STEP_FNS[params] = make_step_fn(params, INTR, donate=False)
    step = _STEP_FNS[params]
    st = init_state(params, INTR)
    poses = []
    for d, c in frames:
        st, out = step(st, jnp.asarray(d), jnp.asarray(c))
        assert bool(out.tracking_ok)
        poses.append(np.asarray(out.pose_matrix))
    return st, poses


def _frames(n):
    scene = default_test_scene()
    traj = make_orbit_trajectory(n, angle_step_deg=0.3)
    gt = [np.linalg.inv(traj[0]) @ T for T in traj]
    return [scene.render_frame(T, INTR) for T in traj], gt


def test_fused_switch_matches_separate_dispatch():
    """fused_mode='on' (the TPU production structure, interpret-mode Pallas
    here) must reproduce fused_mode='off' with the same warped kernels."""
    frames, _ = _frames(3)
    st_f, poses_f = _track(KinFuParams(**ALL_WARPED, fused_mode="on"), frames)
    st_s, poses_s = _track(KinFuParams(**ALL_WARPED, fused_mode="off"), frames)
    for pf, ps in zip(poses_f, poses_s):
        np.testing.assert_allclose(pf, ps, atol=1e-5)
    np.testing.assert_allclose(
        tsdf_to_float(st_f.vol.tsdf), tsdf_to_float(st_s.vol.tsdf), atol=1e-6
    )


def test_all_warped_tracked_sequence_accuracy():
    """The full warped composition tracks an exact-GT synthetic orbit."""
    frames, gt = _frames(4)
    _, poses = _track(KinFuParams(**ALL_WARPED, fused_mode="on"), frames)
    ate = ate_rmse(poses, gt)
    assert ate < 2e-3, f"all-warped ATE vs GT {ate:.5f} m"
