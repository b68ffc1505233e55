import numpy as np
import jax.numpy as jnp

from kinfu_tpu.frontend.depth import bilateral_filter, pyr_down, scale_and_truncate
from kinfu_tpu.frontend.maps import (
    build_measurement_pyramid,
    normal_map,
    resize_points_normals,
    vertex_map,
)
from kinfu_tpu.geometry.intrinsics import Intrinsics


def test_scale_and_truncate():
    d = jnp.array([[1000.0, 6000.0, 0.0, 4999.0]])
    out = np.asarray(scale_and_truncate(d, 0.001, 5.0))
    np.testing.assert_allclose(out, [[1.0, 0.0, 0.0, 4.999]], atol=1e-6)


def test_pyr_down_constant_preserved():
    d = jnp.full((64, 80), 1234.5)
    out = np.asarray(pyr_down(d))
    assert out.shape == (32, 40)
    np.testing.assert_allclose(out, 1234.5, rtol=1e-6)


def test_pyr_down_lowpass(rng):
    d = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32))
    out = np.asarray(pyr_down(d))
    assert out.std() < np.asarray(d).std()  # genuinely low-passed


def test_bilateral_flat_region_unchanged():
    d = jnp.full((32, 32), 2000.0)
    out = np.asarray(bilateral_filter(d))
    np.testing.assert_allclose(out, 2000.0, rtol=1e-5)


def test_bilateral_preserves_step_edge():
    """A 1000mm step is >> sigma_color=10, so it must survive filtering,
    while small noise is smoothed."""
    base = np.full((32, 32), 1000.0, np.float32)
    base[:, 16:] = 2000.0
    noisy = base + np.random.default_rng(1).normal(0, 3, base.shape).astype(np.float32)
    out = np.asarray(bilateral_filter(jnp.asarray(noisy)))
    # edge magnitude preserved
    assert abs((out[:, 17:].mean() - out[:, :15].mean()) - 1000.0) < 10.0
    # noise reduced
    assert out[:, :15].std() < noisy[:, :15].std()


def test_vertex_map_geometry(small_intr):
    depth = jnp.full((small_intr.height, small_intr.width), 2.0)
    vm = np.asarray(vertex_map(depth, small_intr))
    u, v = 10, 20
    np.testing.assert_allclose(
        vm[v, u],
        [
            2.0 * (u - small_intr.cx) / small_intr.fx,
            2.0 * (v - small_intr.cy) / small_intr.fy,
            2.0,
        ],
        rtol=1e-5,
    )


def test_vertex_map_zero_depth_invalid(small_intr):
    depth = jnp.zeros((small_intr.height, small_intr.width))
    vm = np.asarray(vertex_map(depth, small_intr))
    np.testing.assert_allclose(vm, 0.0)


def test_normal_map_of_plane_points_at_camera(small_intr):
    """A fronto-parallel plane at z=2 must give normals (0,0,-1) after the
    reference's n.z<0 flip (image_process.cu:78-81)."""
    depth = jnp.full((small_intr.height, small_intr.width), 2.0)
    vm = vertex_map(depth, small_intr)
    nm = np.asarray(normal_map(vm))
    inner = nm[1:-1, 1:-1]
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-4)
    # borders invalid
    np.testing.assert_allclose(nm[0], 0.0)
    np.testing.assert_allclose(nm[:, -1], 0.0)


def test_normal_map_slanted_plane(small_intr):
    """Plane z = 1 + 0.2x: analytic normal prop to (-0.2, 0, 1), flipped."""
    h, w = small_intr.height, small_intr.width
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float32)
    # z = 1 / (1/fx-term): build depth so that x = 0.2-slope plane holds:
    # point (x, y, z) with z = 1 + 0.2 x and x = z (u-cx)/fx
    # => z = 1 / (1 - 0.2 (u-cx)/fx)
    z = 1.0 / (1.0 - 0.2 * (uu - small_intr.cx) / small_intr.fx)
    vm = vertex_map(jnp.asarray(z), small_intr)
    nm = np.asarray(normal_map(vm))
    expected = np.array([0.2, 0.0, -1.0])
    expected /= np.linalg.norm(expected)
    mid = nm[h // 2, w // 2]
    np.testing.assert_allclose(mid, expected, atol=1e-3)


def test_normal_map_invalid_neighbors(small_intr):
    depth = np.full((small_intr.height, small_intr.width), 2.0, np.float32)
    depth[10, 10] = 0.0
    vm = vertex_map(jnp.asarray(depth), small_intr)
    nm = np.asarray(normal_map(vm))
    # the 4 neighbours of the hole are invalid
    assert np.all(nm[10, 9] == 0) and np.all(nm[10, 11] == 0)
    assert np.all(nm[9, 10] == 0) and np.all(nm[11, 10] == 0)


def test_resize_points_normals():
    vm = jnp.asarray(1.0 + np.arange(8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3))
    nm = vm * 0.5
    v2, n2 = resize_points_normals(vm, nm)
    assert v2.shape == (4, 4, 3)
    block = np.asarray(vm)[0:2, 0:2].mean(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(v2)[0, 0], block, rtol=1e-6)
    # normals are averaged then renormalised (DIVERGENCES.md)
    nblock = np.asarray(nm)[0:2, 0:2].mean(axis=(0, 1))
    np.testing.assert_allclose(
        np.asarray(n2)[0, 0], nblock / np.linalg.norm(nblock), rtol=1e-6
    )


def test_resize_points_normals_skips_invalid():
    """Invalid (zero) entries must not pollute the 2x2 mean
    (DIVERGENCES.md — the reference averages them in)."""
    vm = np.zeros((4, 4, 3), np.float32)
    nm = np.zeros((4, 4, 3), np.float32)
    vm[0, 0] = [1.0, 2.0, 3.0]  # only one valid vertex in the top-left block
    nm[0, 0] = [0.0, 0.0, -1.0]
    v2, n2 = resize_points_normals(jnp.asarray(vm), jnp.asarray(nm))
    np.testing.assert_allclose(np.asarray(v2)[0, 0], [1.0, 2.0, 3.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n2)[0, 0], [0.0, 0.0, -1.0], rtol=1e-6)
    # fully-invalid block stays invalid
    np.testing.assert_allclose(np.asarray(v2)[1, 1], 0.0)
    np.testing.assert_allclose(np.asarray(n2)[1, 1], 0.0)


def test_build_measurement_pyramid_shapes(small_intr):
    depth_mm = jnp.full((small_intr.height, small_intr.width), 2000.0)
    d, v, n = build_measurement_pyramid(
        depth_mm,
        small_intr,
        pyramid_height=3,
        bfilter_kernel_size=5,
        bfilter_color_sigma=10.0,
        bfilter_spatial_sigma=10.0,
        depth_scale=0.001,
        max_dist=5.0,
    )
    assert len(d) == 3
    assert d[1].shape == (small_intr.height // 2, small_intr.width // 2)
    assert v[2].shape == (small_intr.height // 4, small_intr.width // 4, 3)
    np.testing.assert_allclose(np.asarray(d[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d[2]), 2.0, rtol=1e-5)
