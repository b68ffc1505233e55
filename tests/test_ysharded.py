"""Y-sharded volume parity on the 8-device CPU-emulated mesh.

Z-sharding concentrates the reconstruction's surface band in few Z-slabs,
capping scaling efficiency at high shard counts (tools/PERF_NOTES.md
"1024^3 north-star": eff(32) ~ 0.27). Sharding along volume Y keeps every
shard a full-height stripe of the frustum for any camera not looking along
Y, balancing the band. These tests pin the Y-sharded path (shard_dim=1:
offset folding along Y, row/plane-sharded raycast sweeps, the alternate
+-x face frames whose rows carry Y) against the single-device pipeline.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.data.synthetic import default_test_scene, make_translation_trajectory
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.parallel.mesh import make_mesh
from kinfu_tpu.parallel.sharded import make_sharded_step_fn, shard_state
from kinfu_tpu.pipeline.kinfu import init_state, make_step_fn
from kinfu_tpu.volume.tsdf import tsdf_to_float

INTR = Intrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=79.5, cy=59.5)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

PARAMS = KinFuParams(
    pyramid_height=1,
    icp_iters=(3,),
    volume_dims=(128, 128, 128),
    volume_range=(3.0, 3.0, 3.0),
    integrate_mode="warped",
    icp_mode="warped",
    raycast_mode="warped",
    fused_mode="on",  # interpret-mode Pallas on CPU
    raycast_face=(256, 104.0),
)


def _run(step_fn, state, frames):
    outs = []
    for depth_raw, color in frames:
        state, out = step_fn(state, jnp.asarray(depth_raw), jnp.asarray(color))
        outs.append(out)
    return state, outs


def test_ysharded_fused_matches_single_device():
    """Full fused steps, Y-sharded vs single-device: pose bit-parity and
    volume parity. The +z-looking trajectory exercises the ROW-sharded
    raycast sweep (primed rows carry Y under shard_dim=1) and the
    Y-offset pose folding in the integrate sweep."""
    scene = default_test_scene()
    traj = make_translation_trajectory(3, step=(0.004, -0.003, 0.006))
    frames = [scene.render_frame(T, INTR) for T in traj]

    single = make_step_fn(PARAMS, INTR, donate=False)
    st_s = init_state(PARAMS, INTR)
    st_s, outs_s = _run(single, st_s, frames)

    mesh = make_mesh(8)
    sharded = make_sharded_step_fn(PARAMS, INTR, mesh, shard_dim=1)
    st_d = shard_state(init_state(PARAMS, INTR), mesh, shard_dim=1)
    st_d, outs_d = _run(sharded, st_d, frames)

    for os_, od in zip(outs_s, outs_d):
        assert bool(od.tracking_ok) == bool(os_.tracking_ok)
        np.testing.assert_allclose(
            np.asarray(od.pose_matrix), np.asarray(os_.pose_matrix), atol=1e-4
        )
    # volume parity: the shard-offset fold changes the FP association of
    # the voxel-position arithmetic ((y+off)*vs - c vs y*vs - (c-off)), so
    # a voxel sitting exactly on the truncation-band edge can flip its
    # update decision — tolerate a handful of such isolated voxels (one
    # observed) while requiring everything else to match tightly
    diff = np.abs(
        np.asarray(tsdf_to_float(jnp.asarray(st_d.vol.tsdf)))
        - np.asarray(tsdf_to_float(st_s.vol.tsdf))
    )
    assert (diff > 2e-3).sum() <= 8, (diff > 2e-3).sum()
    assert np.any(np.asarray(st_d.model_nmaps[0]) != 0)


def test_ysharded_raycast_plane_and_altx_faces():
    """Pinned-face Y-sharded raycast vs single-device warped raycast:
    the +y face (PLANE-sharded under shard_dim=1) and the alternate +x
    frame (rows carry Y; lanes carry Z). Bit-identical sample grid =>
    tight parity."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from kinfu_tpu.geometry.se3 import Pose, rodrigues
    from kinfu_tpu.ops.pallas_raycast import raycast_warped
    from kinfu_tpu.parallel.sharded import sharded_raycast_warped
    from kinfu_tpu.volume.integrate import integrate
    from kinfu_tpu.volume.tsdf import TSDFVolume, create_volume

    params = PARAMS.replace(fused_mode="off")
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(np.eye(4, dtype=np.float32), INTR)
    depth_m = jnp.asarray(depth_raw) * params.depth_scale
    color = jnp.asarray(color)

    from kinfu_tpu.geometry.se3 import compose, identity_pose, inverse, pose_from_matrix

    vol_pose = pose_from_matrix(jnp.asarray(params.volume_pose))
    vol2cam = compose(inverse(identity_pose()), vol_pose)
    vol = create_volume(params.volume_dims)
    vol = jax.jit(
        lambda v: integrate(v, depth_m, color, vol2cam, INTR, params)
    )(vol)

    mesh = make_mesh(8)

    def sharded_fn(tsdf, R, t):
        return sharded_raycast_warped(
            tsdf, Pose(R, t), INTR, params, interpret=True, shard_dim=1
        )

    sharded = jax.jit(
        shard_map(
            sharded_fn,
            mesh=mesh,
            in_specs=(P(None, "z", None), P(), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
    )

    @jax.jit
    def single_fn(tsdf, R, t):
        v = TSDFVolume(tsdf=tsdf, weight=None, color=None)
        return raycast_warped(
            v, Pose(R, t), INTR, params, interpret=True
        )

    for name, rvec, t in (
        # +y face: camera looking along volume +y (plane-sharded)
        ("plane+y", [-np.pi / 2, 0.0, 0.0], [1.5, 0.2, 1.5]),
        # +x face: camera looking along volume +x (alt frame, row-sharded)
        ("row+x", [0.0, np.pi / 2, 0.0], [0.2, 1.5, 1.5]),
    ):
        R = rodrigues(jnp.asarray(rvec, jnp.float32))
        tt = jnp.asarray(t, jnp.float32)
        vm_s, nm_s = single_fn(vol.tsdf, R, tt)
        vm_d, nm_d = sharded(vol.tsdf, R, tt)
        hit_s = np.any(np.asarray(nm_s) != 0, -1)
        hit_d = np.any(np.asarray(nm_d) != 0, -1)
        agree = (hit_s == hit_d).mean()
        assert agree > 0.99, (name, agree)
        both = hit_s & hit_d
        if both.sum():
            dv = np.linalg.norm(np.asarray(vm_s) - np.asarray(vm_d), axis=-1)[
                both
            ]
            assert np.median(dv) < 5e-3, (name, np.median(dv))
