"""Interpret-mode tests for the fused Pallas ICP iteration
(ops/pallas_icp.icp_normal_eqs_warped) against the jnp reference
(tracking.icp._normal_equations, parity with rigid_icp.cu:46-112)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose, rodrigues
from kinfu_tpu.ops.pallas_icp import icp_normal_eqs_warped
from kinfu_tpu.tracking.icp import _normal_equations, rigid_icp

INTR = Intrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=79.5, cy=59.5)
DIST = 0.015
SIN = math.sin(math.radians(30.0))


def _synthetic_maps(seed=0, h=120, w=160, shift=(0.004, -0.003, 0.006)):
    """A smooth bumpy surface observed from two nearby poses."""
    rng = np.random.default_rng(seed)
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    depth = 1.5 + 0.2 * np.sin(uu / 25.0) * np.cos(vv / 19.0)
    lx = (uu - INTR.cx) / INTR.fx
    ly = (vv - INTR.cy) / INTR.fy
    v_pre = np.stack([lx * depth, ly * depth, depth], -1).astype(np.float32)
    # normals via cross products of image-space differences
    du = np.gradient(v_pre, axis=1)
    dv = np.gradient(v_pre, axis=0)
    n = np.cross(du, dv)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n = np.where(n[..., 2:3] > 0, -n, n).astype(np.float32)
    # current = model shifted slightly + holes
    v_cur = v_pre + np.asarray(shift, np.float32)
    n_cur = n.copy()
    holes = rng.random((h, w)) < 0.05
    n_cur[holes] = 0.0
    v_cur[holes] = 0.0
    return (
        jnp.asarray(v_cur),
        jnp.asarray(n_cur),
        jnp.asarray(v_pre),
        jnp.asarray(n),
    )


@pytest.mark.parametrize("rot_deg", [0.0, 1.5])
def test_normal_equations_parity(rot_deg):
    cv, cn, pv, pn = _synthetic_maps()
    R = rodrigues(jnp.array([0.0, np.deg2rad(rot_deg), 0.0], jnp.float32))
    inc = Pose(R=R, t=jnp.array([0.002, 0.0, -0.001], jnp.float32))

    A0, b0, n0 = _normal_equations(inc, cv, cn, pv, pn, INTR, DIST, SIN)
    A1, b1, n1 = icp_normal_eqs_warped(
        inc, cv, cn, pv, pn, INTR, DIST, SIN, interpret=True
    )
    assert int(n0) > 500
    assert int(n1) == int(n0)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), rtol=2e-4, atol=2e-5)


def test_full_icp_warped_matches_gather():
    """rigid_icp with icp_mode='warped' converges to the same increment."""
    cv, cn, pv, pn = _synthetic_maps(shift=(0.006, -0.004, 0.008))
    params_g = KinFuParams(
        pyramid_height=1, icp_iters=(6,), volume_dims=(128,) * 3,
        icp_mode="gather",
    )
    params_w = params_g.replace(icp_mode="warped")
    res_g = rigid_icp([cv], [cn], [pv], [pn], INTR, params_g)
    res_w = rigid_icp([cv], [cn], [pv], [pn], INTR, params_w)
    assert bool(res_g.ok) and bool(res_w.ok)
    np.testing.assert_allclose(
        np.asarray(res_w.pose.t), np.asarray(res_g.pose.t), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_w.pose.R), np.asarray(res_g.pose.R), atol=1e-5
    )
    # and the increment actually recovers (most of) the shift
    assert np.linalg.norm(np.asarray(res_w.pose.t) + np.asarray([0.006, -0.004, 0.008])) < 0.004
