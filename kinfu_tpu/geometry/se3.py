"""SE(3) utilities as pure jnp functions.

The pose convention matches the reference's cv::Affine3f usage: a pose is a
rigid transform ``p' = R @ p + t`` stored as a (R, t) pair. The ICP increment
is built exactly like ``cv::Affine3f(rvec, tvec)`` (icp_registration.cpp:41):
R = Rodrigues(rvec) and the translation is tvec **directly** (this is *not*
the SE(3) exponential map — no V-matrix coupling — and trajectories diverge
if that distinction is dropped).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Pose(NamedTuple):
    """Rigid transform p' = R @ p + t."""

    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]


def identity_pose(dtype=jnp.float32) -> Pose:
    return Pose(jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype=dtype))


def pose_from_matrix(T: jnp.ndarray) -> Pose:
    T = jnp.asarray(T)
    return Pose(T[..., :3, :3], T[..., :3, 3])


def pose_matrix(p: Pose) -> jnp.ndarray:
    """4x4 homogeneous matrix."""
    R, t = p
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def compose(a: Pose, b: Pose) -> Pose:
    """a * b: apply b first, then a (matrix product convention)."""
    return Pose(a.R @ b.R, jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t)


def inverse(p: Pose) -> Pose:
    Rt = jnp.swapaxes(p.R, -1, -2)
    return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, p.t))


def transform_points(p: Pose, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points of shape [..., 3]."""
    return jnp.einsum("ij,...j->...i", p.R, pts) + p.t


def rotate_vectors(R: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,...j->...i", R, vecs)


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix from an axis-angle 3-vector (cv::Rodrigues).

    Uses the Taylor-safe formulation so it is differentiable at 0.
    """
    rvec = jnp.asarray(rvec)
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(theta2)
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near 0
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2)
    )
    wx, wy, wz = rvec[..., 0], rvec[..., 1], rvec[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=rvec.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def rotvec_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle 3-vector from a rotation matrix (log map, rotation only).

    Differentiation-safe at the identity: the naive arccos((tr-1)/2) has an
    infinite derivative at trace=3, which poisons jacfwd/jacrev with NaNs
    even inside the untaken branch of a `where` (the pose-graph optimizer
    jacfwd's through this). Both branches here are NaN-free: theta comes
    from arctan2 on guarded inputs and the small-angle branch is polynomial.
    Angles near pi are outside the accurate range (the antisymmetric part
    vanishes there); pose-graph edges are far smaller in practice.
    """
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # antisymmetric part: w = 2 sin(theta) * axis
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    n2 = jnp.sum(w * w, axis=-1)  # = 4 sin^2(theta)
    small = n2 < 1e-12
    n2_safe = jnp.where(small, 1.0, n2)
    sin_t = jnp.sqrt(n2_safe) * 0.5
    theta = jnp.arctan2(sin_t, cos_t)
    # theta / (2 sin theta) ~= 0.5 + theta^2/12, theta^2 ~= n2/4 when small
    scale = jnp.where(small, 0.5 + n2 / 48.0, theta / (2.0 * sin_t))
    return w * scale[..., None]


def se3_increment(x: jnp.ndarray) -> Pose:
    """Build the ICP pose increment from the 6-vector solve result.

    Parity: icp_registration.cpp:41 — ``cv::Affine3f(rvec, tvec)`` with
    rvec = x[0:3] (Rodrigues) and tvec = x[3:6] used directly.
    """
    return Pose(rodrigues(x[..., 0:3]).astype(jnp.float32), x[..., 3:6].astype(jnp.float32))
