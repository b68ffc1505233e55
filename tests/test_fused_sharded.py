"""Sharded fused one-switch parity (split from test_distributed.py so the
two heavy shard_map traces get their own xdist worker — --dist loadfile
schedules whole files)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.data.synthetic import default_test_scene, make_translation_trajectory
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.parallel.mesh import make_mesh
from kinfu_tpu.parallel.sharded import make_sharded_step_fn, shard_state
from kinfu_tpu.pipeline.kinfu import init_state
from kinfu_tpu.volume.tsdf import tsdf_to_float

INTR = Intrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=79.5, cy=59.5)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _run(step_fn, state, frames):
    outs = []
    for depth_raw, color in frames:
        state, out = step_fn(state, jnp.asarray(depth_raw), jnp.asarray(color))
        outs.append(out)
    return state, outs


def test_sharded_fused_switch_matches_separate_dispatch():
    """The sharded one-switch fused update (fused_update_local: integrate
    sweep + halo exchange + warped raycast + reset in ONE lax.switch) must
    reproduce the separate-conditional sharded path with the same warped
    kernels (fused_mode on vs off), like test_fused_step does single-chip."""
    base = dict(
        pyramid_height=1,
        icp_iters=(3,),
        volume_dims=(128, 128, 128),
        volume_range=(3.0, 3.0, 3.0),
        integrate_mode="warped",
        icp_mode="warped",
        raycast_mode="warped",
        # small face grid for interpret-mode runtime (like-for-like on both
        # sides of the parity; see test_fused_step.ALL_WARPED)
        raycast_face=(256, 104.0),
    )
    scene = default_test_scene()
    traj = make_translation_trajectory(3, step=(0.004, -0.003, 0.006))
    frames = [scene.render_frame(T, INTR) for T in traj]

    mesh = make_mesh(8)
    results = {}
    for mode in ("on", "off"):
        params = KinFuParams(**base, fused_mode=mode)
        step = make_sharded_step_fn(params, INTR, mesh)
        st = shard_state(init_state(params, INTR), mesh)
        st, outs = _run(step, st, frames)
        results[mode] = (st, outs)

    st_f, outs_f = results["on"]
    st_s, outs_s = results["off"]
    for of, os_ in zip(outs_f, outs_s):
        assert bool(of.tracking_ok) == bool(os_.tracking_ok)
        np.testing.assert_allclose(
            np.asarray(of.pose_matrix), np.asarray(os_.pose_matrix), atol=1e-5
        )
    np.testing.assert_allclose(
        tsdf_to_float(jnp.asarray(st_f.vol.tsdf)),
        tsdf_to_float(jnp.asarray(st_s.vol.tsdf)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(st_f.model_nmaps[0]), np.asarray(st_s.model_nmaps[0]),
        atol=1e-5,
    )
    assert np.any(np.asarray(st_f.model_nmaps[0]) != 0)
