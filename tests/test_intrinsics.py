import numpy as np
import jax.numpy as jnp

from kinfu_tpu.geometry.intrinsics import Intrinsics


def test_level_scaling_matches_reference_formula():
    """Parity with types.hpp:18-28: f halves, c uses the +0.5 convention."""
    intr = Intrinsics(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    l1 = intr.level(1)
    assert l1.width == 320 and l1.height == 240
    assert np.isclose(l1.fx, 262.5)
    assert np.isclose(l1.cx, (319.5 + 0.5) * 0.5 - 0.5)
    l2 = intr.level(2)
    assert l2.width == 160
    assert np.isclose(l2.cx, (319.5 + 0.5) * 0.25 - 0.5)
    assert intr.level(0) is intr


def test_project_backproject_roundtrip(small_intr):
    z = jnp.asarray(np.full((10,), 2.0, np.float32))
    u = jnp.arange(10, dtype=jnp.int32) * 7 % small_intr.width
    v = jnp.arange(10, dtype=jnp.int32) * 5 % small_intr.height
    pts = small_intr.backproject(u.astype(jnp.float32), v.astype(jnp.float32), z)
    u2, v2 = small_intr.project(pts)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v))


def test_project_rounds_to_nearest(small_intr):
    """Parity with Intrs::proj __float2int_rn (device_utils.cuh:15-21)."""
    p = jnp.array([[0.74 / small_intr.fx, 0.0, 1.0]]) * 1.0
    u, _ = small_intr.project(p)
    assert int(u[0]) == round(0.74 + small_intr.cx)


def test_pixel_rays(small_intr):
    rays = np.asarray(small_intr.pixel_rays())
    assert rays.shape == (small_intr.height, small_intr.width, 3)
    np.testing.assert_allclose(rays[..., 2], 1.0)
    # centre pixel ray is near the optical axis
    cy, cx = int(small_intr.cy), int(small_intr.cx)
    assert abs(rays[cy, cx, 0]) < 0.02 and abs(rays[cy, cx, 1]) < 0.02
