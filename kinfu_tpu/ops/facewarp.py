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

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def face_frames(shard_dim: int | None = None) -> Tuple[FaceFrame, ...]:
    """The six cube-map sweep frames.

    Exclusive voxel ownership (z>y>x priority on ties):
      z owns iff |dz| >= |dy| and |dz| >= |dx|
      y owns iff |dy| >  |dz| and |dy| >= |dx|
      x owns iff |dx| >  |dz| and |dx| >  |dy|
    expressed in each face's primed axes via (gt_x, gt_y).

    `shard_dim` selects the primed-axis assignment for mesh-sharded
    volumes (parallel/sharded.py): the sharded NATURAL array dim must land
    on a primed PLANE or ROW axis of every face — never the lane axis,
    whose 128-tiling the kernels cannot shard. dim 0 (volume Z, default)
    is satisfied by the standard frames; dim 1 (volume Y) swaps the +-x
    faces' primed x'/y' axes so rows carry Y instead of lanes
    ((2,1,0): x'=z, y'=y — the ownership inequalities are unchanged, both
    comparisons strict, so the exclusive partition is identical).
    """
    ex, ey, ez = np.eye(3, dtype=np.float32)
    y_sharded = shard_dim == 1
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
        if y_sharded:
            out.append(
                FaceFrame(f"{s}x", np.stack([ez, ey, sign * ex]), (2, 1, 0),
                          sign < 0, gt_x=True, gt_y=True)
            )
        else:
            out.append(
                FaceFrame(f"{s}x", np.stack([ey, ez, sign * ex]), (2, 0, 1),
                          sign < 0, gt_x=True, gt_y=True)
            )
    return tuple(out)


def warp_dims_ok(
    shape_zyx: Tuple[int, int, int], shard_dim: int | None = None
) -> bool:
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
    the jnp paths when this returns False. `shard_dim` selects the sharded
    frame set (face_frames)."""
    for fr in face_frames(shard_dim):
        Zp, Yp, Xp = (shape_zyx[a] for a in fr.axes)
        if Zp % 8 or Yp % 8 or Xp % 128:
            return False
    return True


class Face(NamedTuple):
    """Per-frame warped observation, mip-stacked: arrays [stack_rows, size]."""

    range_mm: jnp.ndarray  # int16 millimetres, 0 = no observation
    color: jnp.ndarray  # int32 packed 0x00RRGGBB
    centre: jnp.ndarray  # [3] f32, camera centre in PRIMED volume coords


def _face_geometry(vol2cam: Pose, frame, dims, voxel_size):
    """(A camera-from-primed direction map, c_primed) for a face frame."""
    R, t = vol2cam
    c = -R.T @ t  # camera centre in volume coords
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
    A = R @ D.T  # primed -> original volume frame, then to camera
    return A, c_primed


def _sample_frame(depth_m, col_packed, A, intr: Intrinsics, dpx, dpy):
    """Shared per-pixel warp math: primed direction (dpx, dpy, 1) ->
    (range_mm f32, packed colour i32) sampled from the camera frame.
    Works on any broadcastable dpx/dpy shapes (jnp path: full [n,n];
    kernel path: one [8,128] tile)."""
    h, w = depth_m.shape
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
    col = jnp.take(col_packed.reshape(-1), lin)
    return _shade_sample(
        depth, col, u, v, inb, intr.fx, intr.fy, intr.cx, intr.cy
    )


def _shade_sample(depth, col, u, v, inb, fx, fy, cx, cy):
    """(range_mm f32 zeroed-invalid, colour i32 zeroed-invalid) from a
    gathered (depth, packed colour) sample at rounded pixel (u, v).

    Range r = depth * ||K^-1 [u,v,1]|| of the ROUNDED pixel (the
    observation lies on that pixel's ray)."""
    lx = (u.astype(jnp.float32) - cx) / fx
    ly = (v.astype(jnp.float32) - cy) / fy
    lam = jnp.sqrt(lx * lx + ly * ly + 1.0)
    r_mm = depth * lam * 1000.0
    valid = inb & (depth > 0)
    r_mm = jnp.where(valid, jnp.clip(r_mm, 1.0, 32767.0), 0.0)
    return r_mm, jnp.where(valid, col, 0)


def _build_face_jnp(depth_m, col_packed, A, intr, spec: FaceSpec):
    """Reference jnp path: base-level gather + stacked mips. The XLA:TPU
    lowering of these gathers costs ~5.8 ms/frame at 640^2 + ~2.6 ms for
    the mip subsampling (r5 trace) — production uses the Pallas kernel
    below; this stays as the interpret-free fallback + parity oracle."""
    n = spec.size
    jj = (jnp.arange(n, dtype=jnp.float32) - spec.centre) / spec.focal
    ii = (jnp.arange(n, dtype=jnp.float32) - spec.centre) / spec.focal
    dpx = jnp.broadcast_to(jj[None, :], (n, n))
    dpy = jnp.broadcast_to(ii[:, None], (n, n))
    r_mm, col = _sample_frame(depth_m, col_packed, A, intr, dpx, dpy)
    return _stack_mips(r_mm.astype(jnp.int16), spec), _stack_mips(col, spec)


# ---------------------------------------------------------------------------
# Pallas stack builder: every mip pixel of the stacked face image gathers
# the camera frame directly at its own strided face coordinate (mip level l
# pixel (i, j) samples the ray of face pixel (i<<l, j<<l)), so the whole
# [stack_rows, size] range/colour stack is produced by ONE kernel with no
# inter-level dependency — replacing the serial XLA gather + per-level
# subsample chain.
# ---------------------------------------------------------------------------


def _block_tables(spec: FaceSpec):
    """Per-8-row-block (level, level row offset) tables. Level row blocks
    are 8-aligned (FaceSpec.level_rows), so no block straddles levels."""
    lvl, off = [], []
    for l, (rows, roff) in enumerate(zip(spec.level_rows, spec.row_offsets)):
        for _ in range(rows // 8):
            lvl.append(l)
            off.append(roff)
    return np.asarray(lvl, np.int32), np.asarray(off, np.int32)


def _build_face_kernel(
    lvl_ref,  # SMEM i32[n_blocks]
    off_ref,  # SMEM i32[n_blocks]
    prm_ref,  # SMEM f32[16]: A row-major(9), fx, fy, cx, cy
    depth_ref,  # VMEM [Hp, Wp] f32 (metres, zero-padded)
    color_ref,  # VMEM [Hp, Wp] i32 packed 0x00RRGGBB
    range_out,  # VMEM [8, size] i16
    color_out,  # VMEM [8, size] i32
    *,
    spec: FaceSpec,
    height: int,  # true camera rows
    width: int,  # true camera cols
    n_windows: int,
):
    from kinfu_tpu.ops.tilegather import TileIndices, gather2d_multi

    s = pl.program_id(0)
    F = spec.size
    lvl = lvl_ref[s]
    i0 = s * 8 - off_ref[s]  # row within the level
    scale = jax.lax.shift_left(1, lvl).astype(jnp.float32)
    wl = jax.lax.shift_right_logical(jnp.int32(F), lvl).astype(jnp.float32)
    a = [prm_ref[k] for k in range(9)]
    fx, fy, cx, cy = prm_ref[9], prm_ref[10], prm_ref[11], prm_ref[12]
    f = jnp.float32(spec.focal)
    c = jnp.float32(spec.centre)
    hp, wp = depth_ref.shape

    def _fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
            jnp.float32
        )

    for ch in range(F // 128):
        j0 = ch * 128
        jj = j0 + _fiota((8, 128), 1)  # mip col
        ii = i0.astype(jnp.float32) + _fiota((8, 128), 0)  # mip row
        dpx = (jj * scale - c) / f
        dpy = (ii * scale - c) / f
        dcx = a[0] * dpx + a[1] * dpy + a[2]
        dcy = a[3] * dpx + a[4] * dpy + a[5]
        dcz = a[6] * dpx + a[7] * dpy + a[8]
        in_front = dcz > 1e-6
        zs = jnp.where(in_front, dcz, 1.0)
        u = jnp.rint(dcx / zs * fx + cx).astype(jnp.int32)
        v = jnp.rint(dcy / zs * fy + cy).astype(jnp.int32)
        inb = in_front & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        uc = jnp.clip(u, 0, wp - 1)
        vc = jnp.clip(v, 0, hp - 1)
        idx = TileIndices(vc, uc, n_chunks=wp // 128)
        # both channels gathered as f32: packed 0x00RRGGBB <= 2^24 - 1 is
        # exactly representable in a float32 mantissa
        dval, cval = gather2d_multi(
            (depth_ref, color_ref), idx, jnp.float32,
            n_windows=n_windows, n_d=3,
        )
        r_mm, col = _shade_sample(
            dval, cval.astype(jnp.int32), uc, vc, inb, fx, fy, cx, cy
        )
        # zero the level's padding area (rows/cols beyond size >> lvl),
        # matching _stack_mips' jnp.pad
        pad_ok = (ii < wl) & (jj < wl)
        r16 = jnp.where(pad_ok, r_mm, 0.0).astype(jnp.int16)
        sl = slice(j0, j0 + 128)
        range_out[:, sl] = r16
        color_out[:, sl] = jnp.where(pad_ok, col, 0)


def _build_face_pallas(depth_m, col_packed, A, intr, spec: FaceSpec,
                       interpret: bool):
    h, w = depth_m.shape
    hp = (h + 7) & ~7
    wp = (w + 127) & ~127
    if (hp, wp) != (h, w):
        depth_m = jnp.pad(depth_m, ((0, hp - h), (0, wp - w)))
        col_packed = jnp.pad(col_packed, ((0, hp - h), (0, wp - w)))
    lvl_tab, off_tab = _block_tables(spec)
    prm = jnp.concatenate(
        [
            A.reshape(-1).astype(jnp.float32),
            jnp.array(
                [intr.fx, intr.fy, intr.cx, intr.cy, 0, 0, 0], jnp.float32
            ),
        ]
    )
    # base-level camera row span of an 8-row face tile is ~8 * fy/focal
    # rows; 4 windows cover slope <= (8*4 - 9) / 7 ~ 3.3 (fy/f ~ 2.0 at the
    # default geometry + tilt margin). Coarser mips exceed it and take
    # gather2d_multi's exact general fallback — they are few pixels.
    kern = functools.partial(
        _build_face_kernel,
        spec=spec,
        height=h,
        width=w,
        n_windows=4,
    )
    row = pl.BlockSpec((8, spec.size), lambda s: (s, 0),
                       memory_space=pltpu.VMEM)
    whole = pl.BlockSpec((hp, wp), lambda s: (0, 0), memory_space=pltpu.VMEM)
    range_mm, color = pl.pallas_call(
        kern,
        grid=(spec.stack_rows // 8,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            whole,
            whole,
        ],
        out_specs=[row, row],
        out_shape=[
            jax.ShapeDtypeStruct((spec.stack_rows, spec.size), jnp.int16),
            jax.ShapeDtypeStruct((spec.stack_rows, spec.size), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(lvl_tab), jnp.asarray(off_tab), prm, depth_m, col_packed)
    return range_mm, color


def build_face(
    depth_m: jnp.ndarray,
    color_rgb: jnp.ndarray,
    vol2cam: Pose,
    intr: Intrinsics,
    spec: FaceSpec,
    frame: FaceFrame | None = None,
    dims: Tuple[int, int, int] | None = None,
    voxel_size: Tuple[float, float, float] | None = None,
    mode: str | None = None,
) -> Face:
    """Warp one (depth [H,W] metres, color [H,W,3] u8) frame into the +z'
    face of the camera's axis-aligned virtual cube map, in the primed
    coordinates of `frame` (default: the +z face, identity).

    One bounded gather of size^2 samples — the only non-separable lookup
    left in the fusion path. `mode`: None = Pallas kernel on TPU / jnp
    elsewhere; "jnp" / "pallas" / "interpret" force a path (tests).

    `dims`/`voxel_size` (X, Y, Z order, matching KinFuParams) are required
    for flipped (negative) faces to compute the primed offset.
    """
    A, c_primed = _face_geometry(vol2cam, frame, dims, voxel_size)
    col_packed = pack_rgb(color_rgb).astype(jnp.int32)
    if mode is None:
        mode = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if mode == "jnp":
        range_mm, color = _build_face_jnp(depth_m, col_packed, A, intr, spec)
    else:
        range_mm, color = _build_face_pallas(
            depth_m, col_packed, A, intr, spec, interpret=(mode == "interpret")
        )
    return Face(
        range_mm=range_mm,
        color=color,
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
