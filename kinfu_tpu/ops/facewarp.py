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
same factor across the field of view (DIVERGENCES.md item 17).

One face covers directions within its **ownership cone** (the radial
projection of one cube face onto the direction sphere). Full-frustum
coverage at ANY camera orientation uses all six faces of the cube map
around the camera centre (kinfu_tpu/ops/pallas_integrate.py runs one
separable sweep per face the frustum touches, permuting the volume axes so
every face is a "+z" sweep). Ownership is exclusive: a voxel's face is the
dominant |component| of d with a fixed z>y>x tie-break, so sweeps compose
without double-updating.

Mip levels (nearest 2x subsampling, stacked below the base image in one 2D
array, each level's rows padded to a multiple of 8) bound the per-slab
resampling slope so the Pallas kernel's gather windows stay statically tiny.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose
from kinfu_tpu.volume.tsdf import pack_rgb


def _align8(n: int) -> int:
    return (n + 7) & ~7


class FaceSpec(NamedTuple):
    """Static geometry of a virtual face image."""

    size: int  # square face, pixels (multiple of 128)
    focal: float  # virtual focal length, pixels
    levels: int  # mip levels (level 0 = base)

    @property
    def centre(self) -> float:
        return (self.size - 1) / 2.0

    @property
    def level_rows(self) -> tuple:
        """Rows allocated per level in the stack (padded to multiples of 8
        so window starts stay 8-aligned and in-bounds)."""
        return tuple(_align8(self.size >> l) for l in range(self.levels))

    @property
    def stack_rows(self) -> int:
        return sum(self.level_rows)

    @property
    def row_offsets(self) -> tuple:
        offs, r = [], 0
        for rows in self.level_rows:
            offs.append(r)
            r += rows
        return tuple(offs)


def default_face_spec() -> FaceSpec:
    """640 px face at f=261: the full ownership cone (+-45 deg) plus margin,
    at roughly half the 640x480 sensor's angular resolution — at or above
    the voxel-projection Nyquist rate for >=256^3 volumes. 7 levels keep the
    fusion slope <= 2 face px/voxel down to ~1.2 cm in front of the camera
    (slope = f*voxel/dz/2^l; see pallas_integrate._mip_scalars)."""
    return FaceSpec(size=640, focal=261.0, levels=7)


class FaceFrame(NamedTuple):
    """One of the six axis-aligned sweep frames: a signed permutation of the
    volume axes that maps this face's direction to primed +z.

    primed coords p' = D @ p + offset, with `offset` nonzero only on the
    flipped sweep axis (offset_z = (N-1) * voxel_size so primed coords stay
    index * voxel_size in the flipped array).
    """

    name: str
    #: 3x3 signed permutation, primed-from-original (rows: x', y', z')
    D: np.ndarray
    #: np.transpose axes taking the [Z, Y, X] volume to [Z', Y', X']
    axes: Tuple[int, int, int]
    #: flip the primed z (sweep) axis of the array (negative faces)
    flip: bool
    #: ownership comparisons (see pallas_integrate._kernel): use strict >
    #: when comparing |d_z'| against |d_x'| / |d_y'| (z>y>x tie-break)
    gt_x: bool
    gt_y: bool


def face_frames() -> Tuple[FaceFrame, ...]:
    """The six cube-map sweep frames.

    Exclusive voxel ownership (z>y>x priority on ties):
      z owns iff |dz| >= |dy| and |dz| >= |dx|
      y owns iff |dy| >  |dz| and |dy| >= |dx|
      x owns iff |dx| >  |dz| and |dx| >  |dy|
    expressed in each face's primed axes via (gt_x, gt_y).
    """
    ex, ey, ez = np.eye(3, dtype=np.float32)
    out = []
    for sign in (1.0, -1.0):
        s = "+" if sign > 0 else "-"
        # primed rows (x', y', z'); z' = sign * owned axis
        out.append(
            FaceFrame(f"{s}z", np.stack([ex, ey, sign * ez]), (0, 1, 2),
                      sign < 0, gt_x=False, gt_y=False)
        )
        out.append(
            FaceFrame(f"{s}y", np.stack([ex, ez, sign * ey]), (1, 0, 2),
                      sign < 0, gt_x=False, gt_y=True)
        )
        out.append(
            FaceFrame(f"{s}x", np.stack([ey, ez, sign * ex]), (2, 0, 1),
                      sign < 0, gt_x=True, gt_y=True)
        )
    return tuple(out)


def warp_dims_ok(shape_zyx: Tuple[int, int, int]) -> bool:
    """True when every cube-face sweep's PRIMED dims satisfy the Pallas
    tiling constraints, so the warped integrate/raycast kernels can run
    with faces="auto" (which traces all six sweeps — one bad face trips a
    trace-time assert even if the frustum never touches it).

    Per face, after `axes` permutation the primed [Zp, Yp, Xp] volume needs
      - Zp % 8 == 0  (raycast streams 8-plane slabs; integrate grid is fine
        with any Zp but the shared check keeps one rule for both kernels)
      - Yp % 8 == 0  (8-row gather windows, integrate + raycast)
      - Xp % 128 == 0 (lane chunks)
    The dispatchers (volume/integrate.py, volume/raycast.py) fall back to
    the jnp paths when this returns False."""
    for fr in face_frames():
        Zp, Yp, Xp = (shape_zyx[a] for a in fr.axes)
        if Zp % 8 or Yp % 8 or Xp % 128:
            return False
    return True


class Face(NamedTuple):
    """Per-frame warped observation, mip-stacked: arrays [stack_rows, size]."""

    range_mm: jnp.ndarray  # int16 millimetres, 0 = no observation
    color: jnp.ndarray  # int32 packed 0x00RRGGBB
    centre: jnp.ndarray  # [3] f32, camera centre in PRIMED volume coords


def build_face(
    depth_m: jnp.ndarray,
    color_rgb: jnp.ndarray,
    vol2cam: Pose,
    intr: Intrinsics,
    spec: FaceSpec,
    frame: FaceFrame | None = None,
    dims: Tuple[int, int, int] | None = None,
    voxel_size: Tuple[float, float, float] | None = None,
) -> Face:
    """Warp one (depth [H,W] metres, color [H,W,3] u8) frame into the +z'
    face of the camera's axis-aligned virtual cube map, in the primed
    coordinates of `frame` (default: the +z face, identity).

    One bounded gather of size^2 samples — the only non-separable lookup
    left in the fusion path.

    `dims`/`voxel_size` (X, Y, Z order, matching KinFuParams) are required
    for flipped (negative) faces to compute the primed offset.
    """
    R, t = vol2cam
    c = -R.T @ t  # camera centre in volume coords
    h, w = depth_m.shape
    n = spec.size

    if frame is None:
        D = jnp.eye(3, dtype=jnp.float32)
        offset = jnp.zeros((3,), jnp.float32)
    else:
        D = jnp.asarray(frame.D, jnp.float32)
        offset = jnp.zeros((3,), jnp.float32)
        if frame.flip:
            assert dims is not None and voxel_size is not None
            # primed z = sign * orig axis a; offset keeps coords index * vs
            a = int(np.argmax(np.abs(frame.D[2])))  # orig axis of primed z
            offset = offset.at[2].set((dims[a] - 1) * voxel_size[a])

    c_primed = D @ c + offset

    # virtual pixel grid -> primed direction (+z' face, unit z')
    jj = (jnp.arange(n, dtype=jnp.float32) - spec.centre) / spec.focal
    ii = (jnp.arange(n, dtype=jnp.float32) - spec.centre) / spec.focal
    dpx = jnp.broadcast_to(jj[None, :], (n, n))
    dpy = jnp.broadcast_to(ii[:, None], (n, n))
    # primed -> original volume frame: d = D^T d', then to camera: R @ d
    A = R @ D.T  # camera-from-primed direction map
    dcx = A[0, 0] * dpx + A[0, 1] * dpy + A[0, 2]
    dcy = A[1, 0] * dpx + A[1, 1] * dpy + A[1, 2]
    dcz = A[2, 0] * dpx + A[2, 1] * dpy + A[2, 2]

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
        centre=c_primed.astype(jnp.float32),
    )


def _stack_mips(base: jnp.ndarray, spec: FaceSpec) -> jnp.ndarray:
    """Nearest-subsampled mip pyramid stacked along rows: level l occupies
    rows [row_offsets[l], row_offsets[l] + size>>l), columns [0, size>>l);
    each level's row block is padded to a multiple of 8."""
    n = spec.size
    rows = []
    for l, block in zip(range(spec.levels), spec.level_rows):
        m = base[:: 1 << l, :: 1 << l]
        rows.append(jnp.pad(m, ((0, block - m.shape[0]), (0, n - m.shape[1]))))
    return jnp.concatenate(rows, axis=0)
