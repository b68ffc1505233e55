"""Axis-aligned virtual-camera range images ("faces") for separable fusion.

TSDF integration is a per-voxel image lookup (tsdf_volume.cu:59-68). On TPU
a random 2D gather costs ~7-13 ns/element in XLA, so 512^3 fusion would be
~1 s/frame (tools/PERF_NOTES.md). The fix is geometric: resample the depth
frame ONCE into a virtual pinhole camera at the same optical centre but with
an **axis-aligned orientation in volume coordinates** (identity rotation).
For that camera the voxel->pixel map is exactly separable per volume z-slab:

    d = p_voxel - c          (c = camera centre in volume coords)
    u = f * d_x / d_z + cu   -> affine in the voxel x index only
    v = f * d_y / d_z + cv   -> affine in the voxel y index only

with zero cross-terms — the rotation lives entirely in the one-off warp.
The face stores **range** r = ||p_obs - c|| (distance from the optical
centre, in int16 millimetres — the native precision of the sensor), which
is rotation-invariant, so the TSDF update becomes sdf = r_obs - r_voxel.
This equals the reference's z-depth form (tsdf_volume.cu:65-68) scaled by
lambda = sec(angle off axis) in [1, 1.25]; the truncation band varies by the
same factor across the field of view (recorded in DIVERGENCES.md).

A face covers directions within +-45 deg of its axis (|d_x|,|d_y| <= d_z),
i.e. exactly the +z face of a cube map around the camera. Voxels outside
that cone belong to other faces (handled by axis-permuted sweeps). Mip
levels (nearest 2x subsampling, stacked below the base image in one 2D
array) bound the per-slab resampling slope so the Pallas kernel's gather
windows stay statically tiny.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose
from kinfu_tpu.volume.tsdf import pack_rgb


class FaceSpec(NamedTuple):
    """Static geometry of a virtual face image."""

    size: int  # square face, pixels (multiple of 128)
    focal: float  # virtual focal length, pixels
    levels: int  # mip levels (level 0 = base)

    @property
    def centre(self) -> float:
        return (self.size - 1) / 2.0

    @property
    def stack_rows(self) -> int:
        return sum(self.size >> l for l in range(self.levels))

    @property
    def row_offsets(self) -> tuple:
        offs, r = [], 0
        for l in range(self.levels):
            offs.append(r)
            r += self.size >> l
        return tuple(offs)


def default_face_spec() -> FaceSpec:
    """640 px face at f=261: +-45 deg of coverage at roughly half the
    640x480 sensor's angular resolution — at or above the voxel-projection
    Nyquist rate for >=256^3 volumes (the fusion resample is slope-limited
    by the voxel grid, not the face, for |d_z| >~ 0.5 m)."""
    return FaceSpec(size=640, focal=261.0, levels=4)


class Face(NamedTuple):
    """Per-frame warped observation, mip-stacked: arrays [stack_rows, size]."""

    range_mm: jnp.ndarray  # int16 millimetres, 0 = no observation
    color: jnp.ndarray  # int32 packed 0x00RRGGBB
    centre: jnp.ndarray  # [3] f32, camera centre in volume coords


def build_face(
    depth_m: jnp.ndarray,
    color_rgb: jnp.ndarray,
    vol2cam: Pose,
    intr: Intrinsics,
    spec: FaceSpec,
) -> Face:
    """Warp one (depth [H,W] metres, color [H,W,3] u8) frame into the +z
    face of the camera's axis-aligned virtual cube map.

    One bounded gather of size^2 samples — the only non-separable lookup
    left in the fusion path.
    """
    R, t = vol2cam
    c = -R.T @ t  # camera centre in volume coords
    h, w = depth_m.shape
    n = spec.size

    # virtual pixel grid -> volume-frame direction (+z face, unit z)
    jj = (jnp.arange(n, dtype=jnp.float32) - spec.centre) / spec.focal
    ii = (jnp.arange(n, dtype=jnp.float32) - spec.centre) / spec.focal
    dvx = jnp.broadcast_to(jj[None, :], (n, n))
    dvy = jnp.broadcast_to(ii[:, None], (n, n))
    # rotate into the real camera frame: d_cam = R @ d_vol
    dcx = R[0, 0] * dvx + R[0, 1] * dvy + R[0, 2]
    dcy = R[1, 0] * dvx + R[1, 1] * dvy + R[1, 2]
    dcz = R[2, 0] * dvx + R[2, 1] * dvy + R[2, 2]

    in_front = dcz > 1e-6
    zs = jnp.where(in_front, dcz, 1.0)
    u = jnp.rint(dcx / zs * intr.fx + intr.cx).astype(jnp.int32)
    v = jnp.rint(dcy / zs * intr.fy + intr.cy).astype(jnp.int32)
    inb = in_front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    lin = jnp.clip(v * w + u, 0, h * w - 1)

    depth = jnp.take(depth_m.reshape(-1), lin)
    col = jnp.take(pack_rgb(color_rgb).astype(jnp.int32).reshape(-1), lin)

    # ray distance of the sampled point: r = depth * ||K^-1 [u,v,1]|| of the
    # ROUNDED pixel (the observation lies on that pixel's ray)
    lx = (u.astype(jnp.float32) - intr.cx) / intr.fx
    ly = (v.astype(jnp.float32) - intr.cy) / intr.fy
    lam = jnp.sqrt(lx * lx + ly * ly + 1.0)
    r_mm = depth * lam * 1000.0
    valid = inb & (depth > 0)
    r_mm = jnp.where(valid, jnp.clip(r_mm, 1.0, 32767.0), 0.0)
    base_r = r_mm.astype(jnp.int16)
    base_c = jnp.where(valid, col, 0)

    return Face(
        range_mm=_stack_mips(base_r, spec),
        color=_stack_mips(base_c, spec),
        centre=c.astype(jnp.float32),
    )


def _stack_mips(base: jnp.ndarray, spec: FaceSpec) -> jnp.ndarray:
    """Nearest-subsampled mip pyramid stacked along rows: level l occupies
    rows [row_offsets[l], row_offsets[l] + size>>l), columns [0, size>>l)."""
    n = spec.size
    rows = []
    for l in range(spec.levels):
        m = base[:: 1 << l, :: 1 << l]
        pad = n - (n >> l)
        rows.append(jnp.pad(m, ((0, 0), (0, pad))))
    return jnp.concatenate(rows, axis=0)
