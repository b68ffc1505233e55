"""Mesh-sharded pipeline tests on the 8-device CPU-emulated mesh.

Validates that the Z-sharded volume + halo-exchange raycast + psum-ICP step
produces the same results as the single-device pipeline (the reference has
no distributed mode at all; SURVEY.md section 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.data.synthetic import default_test_scene, make_translation_trajectory
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import compose, identity_pose, inverse, pose_from_matrix
from kinfu_tpu.parallel.mesh import make_mesh
from kinfu_tpu.parallel.sharded import make_sharded_step_fn, shard_state
from kinfu_tpu.pipeline.kinfu import init_state, make_step_fn
from kinfu_tpu.volume.tsdf import tsdf_to_float

INTR = Intrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=79.5, cy=59.5)
# raycast_mode is pinned to "step" so both pipelines march the identical
# global sample grid: the sharded marcher is grid-snapped plain `march`
# (parallel/sharded.py), while single-device "auto" would pick `march_hier`,
# whose sample phase legitimately differs by O(step) — a like-for-like
# comparison needs the same marcher on both sides.
PARAMS = KinFuParams(
    pyramid_height=2,
    icp_iters=(4, 8),
    volume_dims=(64, 64, 64),
    volume_range=(3.0, 3.0, 3.0),
    raycast_mode="step",
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _run(step_fn, state, frames):
    outs = []
    for depth_raw, color in frames:
        state, out = step_fn(state, jnp.asarray(depth_raw), jnp.asarray(color))
        outs.append(out)
    return state, outs


def test_sharded_matches_single_device():
    scene = default_test_scene()
    traj = make_translation_trajectory(4, step=(0.004, 0.0, 0.006))
    frames = [scene.render_frame(T, INTR) for T in traj]

    # single-device reference
    s_state, s_outs = _run(
        make_step_fn(PARAMS, INTR, donate=False), init_state(PARAMS, INTR), frames
    )

    # 8-way sharded
    mesh = make_mesh(8)
    d_state0 = shard_state(init_state(PARAMS, INTR), mesh)
    step = make_sharded_step_fn(PARAMS, INTR, mesh)
    d_state, d_outs = _run(step, d_state0, frames)

    for s, d in zip(s_outs, d_outs):
        assert bool(s.tracking_ok) and bool(d.tracking_ok)
        np.testing.assert_allclose(
            np.asarray(s.pose_matrix), np.asarray(d.pose_matrix), atol=1e-4
        )

    # fused volumes agree (integration is deterministic given the pose)
    sf = np.asarray(tsdf_to_float(s_state.vol.tsdf))
    df = np.asarray(tsdf_to_float(d_state.vol.tsdf))
    mismatch = np.abs(sf - df) > 2e-2
    assert mismatch.mean() < 2e-3

    sw = np.asarray(s_state.vol.weight)
    dw = np.asarray(d_state.vol.weight)
    assert (sw != dw).mean() < 2e-3

    # model maps (raycast output) agree. The psum'd ICP reduction sums in a
    # different order than the single-device matmul, so the tracked poses
    # differ at fp32 rounding level (~1e-4); grazing/silhouette rays amplify
    # that into occasional larger vertex differences — compare with an
    # outlier-tolerant criterion rather than elementwise atol.
    sv = np.asarray(s_state.model_vmaps[0])
    dv = np.asarray(d_state.model_vmaps[0])
    both = (np.abs(sv[..., 2]) > 0) & (np.abs(dv[..., 2]) > 0)
    diff = np.abs(sv - dv).max(axis=-1)[both]
    assert np.percentile(diff, 99) < 2e-3
    assert (diff > 2e-3).mean() < 5e-3
    # hit masks agree except a tiny boundary fraction
    assert ((np.abs(sv[..., 2]) > 0) != (np.abs(dv[..., 2]) > 0)).mean() < 5e-3


def test_sharded_tracking_failure_resets():
    scene = default_test_scene()
    mesh = make_mesh(8)
    state = shard_state(init_state(PARAMS, INTR), mesh)
    step = make_sharded_step_fn(PARAMS, INTR, mesh)
    depth_raw, color = scene.render_frame(np.eye(4), INTR)
    state, out = step(state, jnp.asarray(depth_raw), jnp.asarray(color))
    assert bool(out.tracking_ok)
    state, out = step(state, jnp.zeros_like(jnp.asarray(depth_raw)), jnp.asarray(color))
    assert not bool(out.tracking_ok)
    assert int(state.frame_count) == 1
    assert int(np.asarray(jnp.sum(state.vol.weight.astype(jnp.int32)))) == 0


def test_replica_sweep_matches_serial():
    """parallel/sweep.py: N sequences fanned across the replica mesh must
    produce the same trajectories as running each serially."""
    from kinfu_tpu.data.synthetic import make_orbit_trajectory
    from kinfu_tpu.parallel.sweep import replica_mesh, sweep_sequences
    from kinfu_tpu.pipeline.kinfu import make_step_fn

    scene = default_test_scene()
    params = PARAMS.replace(raycast_mode="auto")
    seqs, steps = [], (0.2, 0.5, 0.8)
    for s in steps:
        traj = make_orbit_trajectory(3, angle_step_deg=s)
        frames = [scene.render_frame(T, INTR) for T in traj]
        seqs.append(
            (
                np.stack([d for d, _ in frames]),
                np.stack([c for _, c in frames]),
            )
        )

    mesh = replica_mesh(4)
    results = sweep_sequences(seqs, params, INTR, mesh)
    assert len(results) == 3

    step_fn = make_step_fn(params, INTR, donate=False)
    for (depths, colors), (poses, oks) in zip(seqs, results):
        assert oks.astype(bool).all()
        st = init_state(params, INTR)
        for f in range(depths.shape[0]):
            st, out = step_fn(st, jnp.asarray(depths[f]), jnp.asarray(colors[f]))
        np.testing.assert_allclose(
            poses[-1], np.asarray(out.pose_matrix), atol=1e-5
        )


def test_sharded_warped_kernels_match_single_device():
    """The sharded path must run the SAME Pallas kernels as single-chip:
    warped integrate (z-offset folded into the camera pose) and warped ICP
    (row-shard + psum Gram finish). Raycast stays the grid-snapped march on
    both sides (its warped unification is separate)."""
    params = KinFuParams(
        pyramid_height=1,
        icp_iters=(3,),
        volume_dims=(128, 128, 128),
        volume_range=(3.0, 3.0, 3.0),
        integrate_mode="warped",
        icp_mode="warped",
        raycast_mode="step",
    )
    scene = default_test_scene()
    traj = make_translation_trajectory(3, step=(0.004, -0.003, 0.006))
    frames = [scene.render_frame(T, INTR) for T in traj]

    single = make_step_fn(params, INTR, donate=False)
    st_s = init_state(params, INTR)
    st_s, outs_s = _run(single, st_s, frames)

    mesh = make_mesh(8)
    sharded = make_sharded_step_fn(params, INTR, mesh)
    st_d = shard_state(init_state(params, INTR), mesh)
    st_d, outs_d = _run(sharded, st_d, frames)

    for os_, od in zip(outs_s, outs_d):
        assert bool(od.tracking_ok) == bool(os_.tracking_ok)
        np.testing.assert_allclose(
            np.asarray(od.pose_matrix), np.asarray(os_.pose_matrix), atol=1e-4
        )
    np.testing.assert_allclose(
        tsdf_to_float(jnp.asarray(st_d.vol.tsdf)),
        tsdf_to_float(st_s.vol.tsdf),
        atol=2e-3,
    )


_WARP_RAY_FNS = {}


def _warp_ray_fns():
    """One (single-device, sharded) jitted pair shared by the yaw cases —
    the camera pose is a traced argument, so both orientations reuse one
    trace each (interpret-mode lowering dominates; needs --dist loadfile)."""
    if _WARP_RAY_FNS:
        return _WARP_RAY_FNS["params"], _WARP_RAY_FNS["s"], _WARP_RAY_FNS["d"]
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from kinfu_tpu.geometry.se3 import Pose
    from kinfu_tpu.ops.pallas_raycast import raycast_warped
    from kinfu_tpu.parallel.sharded import sharded_raycast_warped
    from kinfu_tpu.volume.tsdf import TSDFVolume

    params = KinFuParams(
        pyramid_height=1, icp_iters=(3,), volume_dims=(128,) * 3,
        volume_range=(3.0, 3.0, 3.0),
    )

    @jax.jit
    def single(tsdf, R, t):
        vol = TSDFVolume(tsdf=tsdf, weight=None, color=None)
        return raycast_warped(vol, Pose(R, t), INTR, params, interpret=True)

    mesh = make_mesh(8)
    sharded = jax.jit(
        shard_map(
            partial(sharded_raycast_warped, intr=INTR, params=params,
                    interpret=True),
            mesh=mesh,
            in_specs=(P("z"), Pose(P(), P())),
            out_specs=(P(), P()),
            check_rep=False,
        )
    )
    _WARP_RAY_FNS.update(params=params, s=single, d=sharded)
    return params, single, sharded


def _sharded_warp_raycast_case(yaw_deg):
    """sharded_raycast_warped vs single-device raycast_warped on the same
    128^3 volume. yaw=0 exercises plane-sharded (+z) sweeps, yaw=90 the
    row-sharded (+x/-x family) path."""
    from kinfu_tpu.geometry.se3 import Pose, rodrigues
    from kinfu_tpu.volume.tsdf import tsdf_to_fixed

    params, single, sharded = _warp_ray_fns()
    dim = 128
    vs = params.voxel_size[0]
    g = (np.arange(dim) * vs).astype(np.float32)
    Z, Y, X = np.meshgrid(g, g, g, indexing="ij")
    d = np.sqrt((X - 1.5) ** 2 + (Y - 1.5) ** 2 + (Z - 1.5) ** 2) - 0.6
    tsdf = tsdf_to_fixed(jnp.asarray(np.clip(d / params.trunc_dist, -1, 1)))

    R = rodrigues(jnp.array([0.0, np.deg2rad(yaw_deg), 0.0], jnp.float32))
    t = jnp.asarray(
        np.array([1.5, 1.5, 1.5], np.float32)
        - 1.3 * np.asarray(R)[:, 2]  # 1.3 m back along the view direction
    )

    vm_s, nm_s = single(tsdf, R, t)
    vm_d, nm_d = sharded(tsdf, Pose(R=R, t=t))

    np.testing.assert_allclose(np.asarray(vm_d), np.asarray(vm_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(nm_d), np.asarray(nm_s), atol=1e-4)
    assert np.any(np.asarray(nm_s) != 0)


def test_sharded_warped_raycast_plane_sharded():
    _sharded_warp_raycast_case(0.0)


def test_sharded_warped_raycast_row_sharded():
    _sharded_warp_raycast_case(90.0)
