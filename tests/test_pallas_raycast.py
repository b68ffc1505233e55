"""Interpret-mode tests for the Pallas cube-face plane-sweep raycast.

Validates ops/pallas_raycast.raycast_warped — the production TPU raycast
path — against the jnp lockstep march (reference semantics,
tsdf_volume.cu:217-258) and against analytic scene geometry, on CPU via
interpret=True.

Parity semantics (DIVERGENCES.md item 20): the sweep samples at volume
plane crossings instead of unit ray steps and computes normals from face
vertex-map differences instead of the trilinear TSDF gradient, so hit masks
agree to a few percent (silhouette pixels), vertices to ~a voxel, and
normals to a voxel-scale angular noise floor that shrinks with resolution
(measured ~10 deg median at 128^3, ~3 deg at 256^3, tests pin the 128^3
bound)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose, rodrigues
from kinfu_tpu.ops.pallas_raycast import RaySpec, raycast_warped
from kinfu_tpu.volume.raycast import raycast
from kinfu_tpu.volume.tsdf import TSDFVolume, tsdf_to_fixed

# interpret-mode fixtures are sized for suite runtime (VERDICT r2 weak #8):
# the volume must stay 128^3 (the sweep kernel needs every primed dim
# lane-tileable — warp_dims_ok; 64^3 would silently sample nothing) and the
# face at 256 px (hit-mask parity degrades visibly at 128), so the cut
# comes from a 64x48 camera and one shared jitted reference raycast.
DIM = 128
INTR = Intrinsics(width=64, height=48, fx=53.0, fy=53.0, cx=31.5, cy=23.5)
PARAMS = KinFuParams(
    pyramid_height=1,
    icp_iters=(4,),
    volume_dims=(DIM, DIM, DIM),
    volume_range=(3.0, 3.0, 3.0),
    raycast_mode="step",
)
SPEC = RaySpec(size=256, focal=104.0)

SPHERE_C = np.array([1.5, 1.5, 1.8], np.float32)
SPHERE_R = 0.6


def _sphere_volume(with_floor=False) -> TSDFVolume:
    vs = PARAMS.voxel_size[0]
    g = (np.arange(DIM) * vs).astype(np.float32)
    Z, Y, X = np.meshgrid(g, g, g, indexing="ij")
    d = (
        np.sqrt(
            (X - SPHERE_C[0]) ** 2 + (Y - SPHERE_C[1]) ** 2 + (Z - SPHERE_C[2]) ** 2
        )
        - SPHERE_R
    )
    if with_floor:
        d = np.minimum(d, 2.6 - Y)
    tsdf = np.clip(d / PARAMS.trunc_dist, -1.0, 1.0).astype(np.float32)
    return TSDFVolume(
        tsdf=tsdf_to_fixed(jnp.asarray(tsdf)),
        weight=jnp.ones((DIM, DIM, DIM), jnp.int16),
        color=jnp.zeros((DIM, DIM, DIM), jnp.int32),
    )


_WARP_CACHE = {}


# One jitted callable per `faces` value, shared by every test case in this
# file (pose and volume are traced arguments): interpret-mode Pallas
# lowering dominates these tests' wall time, and an unjitted call retraces
# it per invocation. Requires xdist --dist loadfile (pyproject) so cases
# land in the same worker process.
@functools.partial(jax.jit, static_argnames=("faces",))
def _warped_jit(tsdf, R, t, faces):
    vol = TSDFVolume(tsdf=tsdf, weight=None, color=None)
    return raycast_warped(
        vol, Pose(R, t), INTR, PARAMS, spec=SPEC, interpret=True, faces=faces
    )


def _warped(vol, cam2vol, faces="auto", cache_key=None):
    key = (cache_key, faces) if cache_key else None
    if key is not None and key in _WARP_CACHE:
        return _WARP_CACHE[key]
    vm, nm = _warped_jit(vol.tsdf, cam2vol.R, cam2vol.t, faces)
    out = (np.asarray(vm), np.asarray(nm))
    if key is not None:
        _WARP_CACHE[key] = out
    return out


@jax.jit
def _ref_jit(tsdf, R, t):
    from kinfu_tpu.volume.tsdf import TSDFVolume

    vol = TSDFVolume(tsdf=tsdf, weight=None, color=None)
    return raycast(vol, Pose(R, t), INTR, PARAMS)


def _reference(vol, cam2vol):
    vm, nm = _ref_jit(vol.tsdf, cam2vol.R, cam2vol.t)
    return np.asarray(vm), np.asarray(nm)


def _compare(vol, cam2vol, min_agree=0.97, dv_med_mm=12.0, nang_med_deg=8.0,
             cache_key=None):
    vm_r, nm_r = _reference(vol, cam2vol)
    vm_w, nm_w = _warped(vol, cam2vol, cache_key=cache_key)
    hit_r = np.any(nm_r != 0, -1)
    hit_w = np.any(nm_w != 0, -1)
    agree = (hit_r == hit_w).mean()
    assert agree >= min_agree, f"hit agreement {agree:.3f}"
    both = hit_r & hit_w
    assert both.sum() > 200
    dv = np.linalg.norm(vm_r - vm_w, axis=-1)[both]
    nang = np.degrees(
        np.arccos(np.clip(np.sum(nm_r * nm_w, -1)[both], -1.0, 1.0))
    )
    assert np.median(dv) * 1000 <= dv_med_mm, f"dv med {np.median(dv)*1000:.1f}mm"
    assert np.median(nang) <= nang_med_deg, f"nang med {np.median(nang):.1f}"
    return vm_w, nm_w, hit_w


def test_axis_aligned_parity():
    vol = _sphere_volume()
    c2v = Pose(R=jnp.eye(3), t=jnp.array([1.5, 1.5, 0.2], jnp.float32))
    _compare(vol, c2v, cache_key="axis")


def test_tilted_parity():
    vol = _sphere_volume()
    R = rodrigues(jnp.array([0.0, np.deg2rad(30.0), 0.0], jnp.float32))
    c2v = Pose(R=R, t=jnp.array([0.7, 1.5, 0.4], jnp.float32))
    _compare(vol, c2v)


def test_backward_camera_parity():
    vol = _sphere_volume()
    R = rodrigues(jnp.array([0.0, np.pi, 0.0], jnp.float32))
    c2v = Pose(R=R, t=jnp.array([1.5, 1.5, 2.9], jnp.float32))
    _compare(vol, c2v)


def test_analytic_sphere_accuracy():
    """Hits land on the analytic sphere and normals match the radial field."""
    vol = _sphere_volume()
    c2v = Pose(R=jnp.eye(3), t=jnp.array([1.5, 1.5, 0.2], jnp.float32))
    vm, nm = _warped(vol, c2v, cache_key="axis")
    hit = np.any(nm != 0, -1)
    assert hit.sum() > 500
    R = np.asarray(c2v.R)
    t = np.asarray(c2v.t)
    p_vol = vm[hit] @ R.T + t  # camera -> volume frame
    r_err = np.abs(np.linalg.norm(p_vol - SPHERE_C, axis=-1) - SPHERE_R)
    vs = PARAMS.voxel_size[0]
    assert np.median(r_err) <= 0.5 * vs, f"median {np.median(r_err)*1000:.1f}mm"
    assert np.percentile(r_err, 95) <= 1.5 * vs
    n_true = (p_vol - SPHERE_C) / np.linalg.norm(
        p_vol - SPHERE_C, axis=-1, keepdims=True
    )
    n_vol = nm[hit] @ R.T
    ang = np.degrees(
        np.arccos(np.clip(np.sum(n_true * n_vol, -1), -1.0, 1.0))
    )
    assert np.median(ang) <= 10.0, f"normal err med {np.median(ang):.1f} deg"


def test_oblique_multi_face_auto_matches_all():
    """An oblique view needs >1 face; auto face gating must equal running
    every face explicitly (nothing owned is dropped)."""
    vol = _sphere_volume(with_floor=True)
    R = rodrigues(jnp.array([np.deg2rad(25.0), np.deg2rad(55.0), 0.0], jnp.float32))
    c2v = Pose(R=R, t=jnp.array([0.4, 1.0, 0.5], jnp.float32))
    vm_a, nm_a = _warped(vol, c2v, faces="auto")
    vm_f, nm_f = _warped(
        vol, c2v, faces=("+z", "-z", "+y", "-y", "+x", "-x")
    )
    np.testing.assert_allclose(vm_a, vm_f, atol=1e-5)
    np.testing.assert_allclose(nm_a, nm_f, atol=1e-5)
    assert np.any(nm_a != 0)


def test_empty_volume_no_hits():
    vol = TSDFVolume(
        tsdf=jnp.zeros((DIM, DIM, DIM), jnp.int16),
        weight=jnp.zeros((DIM, DIM, DIM), jnp.int16),
        color=jnp.zeros((DIM, DIM, DIM), jnp.int32),
    )
    c2v = Pose(R=jnp.eye(3), t=jnp.array([1.5, 1.5, 0.2], jnp.float32))
    vm, nm = _warped(vol, c2v)
    assert not np.any(nm != 0)
    assert not np.any(vm != 0)


def test_behind_camera_surface_not_hit():
    """Surfaces behind the camera must not produce hits (t > 0 only)."""
    vol = _sphere_volume()
    # camera past the sphere looking further +z: sphere is behind
    c2v = Pose(R=jnp.eye(3), t=jnp.array([1.5, 1.5, 2.6], jnp.float32))
    vm, nm = _warped(vol, c2v)
    hit = np.any(nm != 0, -1)
    # nothing in front except possibly the far volume border: no sphere hits
    if hit.any():
        R = np.asarray(c2v.R)
        t = np.asarray(c2v.t)
        p_vol = vm[hit] @ R.T + t
        assert np.all(p_vol[:, 2] > 2.6)
