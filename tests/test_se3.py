import numpy as np
import jax.numpy as jnp

from kinfu_tpu.geometry.se3 import (
    Pose,
    compose,
    identity_pose,
    inverse,
    pose_from_matrix,
    pose_matrix,
    rodrigues,
    rotvec_from_matrix,
    se3_increment,
    transform_points,
)


def random_pose(rng):
    rvec = rng.normal(size=3)
    R = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float64)))
    t = rng.normal(size=3)
    return Pose(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))


def test_rodrigues_matches_closed_form():
    # 90 degrees about z
    rvec = jnp.array([0.0, 0.0, np.pi / 2])
    R = np.asarray(rodrigues(rvec))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_rodrigues_small_angle_stable():
    R = np.asarray(rodrigues(jnp.array([1e-9, 0.0, 0.0])))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_rodrigues_roundtrip(rng):
    for _ in range(10):
        rvec = rng.normal(size=3) * 0.8
        R = rodrigues(jnp.asarray(rvec))
        back = np.asarray(rotvec_from_matrix(R))
        np.testing.assert_allclose(back, rvec, atol=1e-5)


def test_compose_inverse(rng):
    a, b = random_pose(rng), random_pose(rng)
    ab = compose(a, b)
    pts = jnp.asarray(rng.normal(size=(17, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(transform_points(ab, pts)),
        np.asarray(transform_points(a, transform_points(b, pts))),
        atol=1e-5,
    )
    ident = compose(a, inverse(a))
    np.testing.assert_allclose(np.asarray(ident.R), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ident.t), 0, atol=1e-6)


def test_pose_matrix_roundtrip(rng):
    p = random_pose(rng)
    T = pose_matrix(p)
    p2 = pose_from_matrix(T)
    np.testing.assert_allclose(np.asarray(p.R), np.asarray(p2.R))
    np.testing.assert_allclose(np.asarray(p.t), np.asarray(p2.t))
    assert np.allclose(np.asarray(T)[3], [0, 0, 0, 1])


def test_se3_increment_convention():
    """cv::Affine3f(rvec, tvec): translation is used directly (NOT the SE(3)
    exponential's V @ rho) — parity with icp_registration.cpp:41."""
    x = jnp.array([0.0, 0.0, np.pi / 2, 1.0, 2.0, 3.0])
    inc = se3_increment(x)
    np.testing.assert_allclose(np.asarray(inc.t), [1.0, 2.0, 3.0], atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(inc.R), [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
    )


def test_identity():
    p = identity_pose()
    pts = jnp.ones((4, 3))
    np.testing.assert_allclose(np.asarray(transform_points(p, pts)), 1.0)
