"""Streaming fused one-switch parity (split from test_fused_step.py for
xdist file-level balance — see that file's docstring for the property)."""

import numpy as np
import jax.numpy as jnp

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.data.synthetic import default_test_scene, make_orbit_trajectory
from kinfu_tpu.geometry.intrinsics import Intrinsics
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
    raycast_face=(256, 104.0),
)


def _frames(n):
    scene = default_test_scene()
    traj = make_orbit_trajectory(n, angle_step_deg=0.3)
    gt = [np.linalg.inv(traj[0]) @ T for T in traj]
    return [scene.render_frame(T, INTR) for T in traj], gt


def test_streaming_fused_matches_separate_dispatch():
    """The streaming step's fused path (grid shift riding fused_update's
    `pre` hook inside the ONE lax.switch) must reproduce the separate
    shift+integrate+raycast conditional with the same warped kernels."""
    from kinfu_tpu.pipeline.streaming import (
        init_streaming_state,
        make_streaming_step_fn,
    )

    frames, _ = _frames(3)
    results = {}
    for mode in ("on", "off"):
        params = KinFuParams(**ALL_WARPED, fused_mode=mode)
        # tight central box so the anchor-follow shift actually fires and
        # the `pre` grid-shift path is exercised, not just traced
        step = make_streaming_step_fn(
            params, INTR, donate=False, margin_frac=0.49
        )
        st = init_streaming_state(params, INTR)
        poses = []
        for d, c in frames:
            st, out = step(st, jnp.asarray(d), jnp.asarray(c))
            assert bool(out.tracking_ok)
            poses.append(np.asarray(out.pose_matrix))
        results[mode] = (st, poses)

    st_f, poses_f = results["on"]
    st_s, poses_s = results["off"]
    assert np.array_equal(
        np.asarray(st_f.origin_vox), np.asarray(st_s.origin_vox)
    )
    assert np.any(np.asarray(st_f.origin_vox) != 0)  # a shift happened
    for pf, ps in zip(poses_f, poses_s):
        np.testing.assert_allclose(pf, ps, atol=1e-5)
    np.testing.assert_allclose(
        tsdf_to_float(st_f.kinfu.vol.tsdf),
        tsdf_to_float(st_s.kinfu.vol.tsdf),
        atol=1e-6,
    )
