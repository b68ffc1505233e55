"""Pallas TPU raycast: cube-face plane-sweep surface prediction.

The jnp raycast (kinfu_tpu/volume/raycast.py, parity with
tsdf_volume.cu:217-258) is a lockstep gather march: ~130M random TSDF
samples/frame at 512^3, and XLA:TPU gathers cost ~7-13 ns each
(tools/PERF_NOTES.md) -> ~0.9 s/frame. This module replaces it with the
same geometric trick as the fusion kernel (kinfu_tpu/ops/facewarp.py):
**march on an axis-aligned virtual camera grid, where volume lookups are
exactly separable**, then resample the result onto the real camera grid.

Per cube face (signed volume axis, facewarp.face_frames):

  1. The volume is permuted so the face direction is +z'. Rays through the
     virtual face pixel (i, j) have direction d' = ((j-c)/f, (i-c)/f, 1) —
     d'_y depends only on the ROW and d'_x only on the COLUMN. Marching in
     the parameter t = z' - o'_z (one step per voxel plane), the sample
     position at plane z'_m is

         y = o'_y + d'_y(i) * t_m   (affine in i, lane-constant)
         x = o'_x + d'_x(j) * t_m   (affine in j, row-constant)

     so an [8,128] pixel tile reads the plane through THREE 8-row windows
     + THREE 128-lane chunks whose starts are computed from *scalar*
     geometry — no per-tile index reductions at all (slope <= f_max
     voxels/pixel, see _sweep_kernel).
  2. The sweep streams the volume one 8-plane slab per grid step
     (double-buffered VMEM) and carries per-ray march state (previous
     sample, first +,- / -,+ event) in VMEM scratch across steps — the
     per-ray early-`break` of the CUDA march (tsdf_volume.cu:242-246)
     becomes per-tile work-list skipping: host-side (jnp) code builds, from
     an 8^3-pooled occupancy summed-area table, the list of (slab, tile)
     cells whose footprint can contain a crossing, and the kernel loops
     only over that list, also skipping tiles whose rays have all resolved
     (SMEM alive flags).
  3. Face-grid hit fields are shaded in plain jnp (vertex = o' + d'*t is
     vector math; normals by cross products of vertex-map central
     differences) and resampled to the camera grid by a small Pallas
     gather kernel (kinfu_tpu/ops/tilegather.py), one face per owned pixel
     set (exclusive dominant-axis ownership, same partition as fusion).

Divergences vs device::raycast (recorded in DIVERGENCES.md item 20):
sampling at z'-plane crossings instead of unit ray steps (along-ray
spacing vsz * ||d'|| in [1, ~2] voxels), normals from face vertex-map
differences instead of the trilinear TSDF gradient, and camera maps
resampled from the face grid (nearest face pixel, <= half a face pixel of
angular error). Event classification (+,- hit, -,+ backface, linear
refinement) matches march()/tsdf_volume.cu:242-246.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose
from kinfu_tpu.ops.facewarp import FaceFrame, face_frames
from kinfu_tpu.ops.tilegather import TileIndices, gather2d_multi
from kinfu_tpu.volume.tsdf import SHORTMAX, TSDFVolume

_INF = 1e30
_NAN = float("nan")


def _fiota(shape, dim):
    """float32 iota via int32 (Mosaic rejects float tpu.iota)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

#: sweep-face margin: same rule as pallas_integrate.faces_needed
_FACE_MARGIN = 0.75
#: extra face pixels beyond the exact +-45 deg ownership cone that the
#: sweep still marches (resample rounding can land half a pixel outside)
_OWN_PAD_PX = 2.0


class RaySpec(NamedTuple):
    """Static geometry of the virtual raycast face grid."""

    size: int  # square face, pixels (multiple of 128)
    focal: float  # virtual focal length, pixels

    @property
    def centre(self) -> float:
        return (self.size - 1) / 2.0


def default_ray_spec() -> RaySpec:
    """640 px face at f=261 covers the +-45 deg ownership cone with ~22%
    margin at ~0.22 deg/px — half the 640x480 sensor's angular resolution.
    Raise `size` for finer prediction maps (state VMEM grows as size^2)."""
    return RaySpec(size=640, focal=261.0)


# --------------------------------------------------------------------------
# sweep kernel
# --------------------------------------------------------------------------


#: row windows per (tile, plane): the 8-row pixel strip spans
#: <= 7*slope + 2 volume rows (slope = t/(focal*voxel)); with the 8-align
#: loss, 4 windows cover slope <= (8*4 - 9) / 7 ~ 3.28. Planes farther than
#: that from the camera are masked invalid (coverage bound; at the default
#: geometry slope 3.28 is ~5 m of z-distance — beyond the volume diagonal).
_N_WIN = 4


def _sweep_kernel(
    slabwl_ref,  # prefetch i32[n_slabs]: ascending ACTIVE slab indices
    prm_ref,  # SMEM f32[8]: oxyz', vs'xyz, focal, centre
    geom_ref,  # SMEM i32[6]: Zp_g, Yp_g, plane0, row0, row_lo, row_hi
    tiles_ref,  # SMEM i32[n_slabs, n_tiles] active tile ids per slab
    count_ref,  # SMEM i32[n_slabs]
    own_ref,  # SMEM i32[n_tiles] static ownership (any owned px in tile)
    slab_ref,  # VMEM [8, Yl, Xp] int16 (local rows; Yl = Yp_g single-chip)
    hit_ref,  # VMEM [F, F] f32 out (revisited)
    back_ref,  # VMEM [F, F] f32 out (revisited)
    fprev_ref,  # VMEM [F, F] f32 scratch
    alive_ref,  # SMEM [n_tiles] i32 scratch
    *,
    dims_local: Tuple[int, int, int],  # (Zl, Yl, Xp) of the LOCAL buffer
    spec: RaySpec,
    n_tile_cols: int,
    n_tiles: int,
):
    """One plane-sweep grid step.

    Sharded operation (parallel/sharded.py): the buffer may hold only a
    Z-shard of the primed volume. geom_ref carries the GLOBAL geometry as
    traced scalars — `plane0` when the shard axis is the sweep (plane)
    axis, `row0`/`row_lo`/`row_hi` when it is the row axis (the buffer then
    includes halo rows; samples outside [row_lo, row_hi] are invalid and
    the neighbour shard resolves them — min-composited by the caller).
    Single-chip: plane0=row0=0, row_lo/hi = full range, identical maths.
    """
    si = pl.program_id(0)
    s = slabwl_ref[si]  # the slab this grid step serves (work-listed)
    Zl, Yl, Xp = dims_local
    Zp = geom_ref[0]  # global plane count
    Yp = geom_ref[1]  # global row count
    plane0 = geom_ref[2]
    row0 = geom_ref[3]
    row_lo = geom_ref[4]
    row_hi = geom_ref[5]
    F = spec.size
    f = jnp.float32(spec.focal)
    c = jnp.float32(spec.centre)
    x_chunks = Xp // 128

    ox, oy, oz = prm_ref[0], prm_ref[1], prm_ref[2]
    vsx, vsy, vsz = prm_ref[3], prm_ref[4], prm_ref[5]
    inv_vsx = 1.0 / vsx
    inv_vsy = 1.0 / vsy
    # farthest plane (z' metres from camera) the 4 row windows still cover
    t_cover = (8.0 * _N_WIN - 9.0) / 7.0 * f * vsy * 0.99

    # ---- one-time state init --------------------------------------------
    @pl.when(si == 0)
    def _init():
        hit_ref[:] = jnp.full((F, F), _INF, jnp.float32)
        back_ref[:] = jnp.full((F, F), _INF, jnp.float32)
        fprev_ref[:] = jnp.full((F, F), _NAN, jnp.float32)

        def cp(tt, _):
            alive_ref[tt] = own_ref[tt]
            return 0

        jax.lax.fori_loop(0, n_tiles, cp, 0)

    def tile_body(it, _):
        tid = tiles_ref[s, it]
        trow = tid // n_tile_cols
        tcol = tid - trow * n_tile_cols
        i0 = pl.multiple_of(trow * 8, 8)
        j0 = pl.multiple_of(tcol * 128, 128)

        @pl.when(alive_ref[tid] != 0)
        def _process():
            i0f = i0.astype(jnp.float32)
            j0f = j0.astype(jnp.float32)
            # per-pixel direction components (dz' == 1)
            dy = (
                i0f + _fiota((8, 1), 0) - c
            ) / f  # [8,1]
            dx = (
                j0f + _fiota((1, 128), 1) - c
            ) / f  # [1,128]
            dxb = jnp.broadcast_to(dx, (8, 128))
            dyb = jnp.broadcast_to(dy, (8, 128))

            row_sl = pl.ds(i0, 8)
            lane_sl = pl.ds(j0, 128)
            fp = fprev_ref[row_sl, lane_sl]
            ht = hit_ref[row_sl, lane_sl]
            bt = back_ref[row_sl, lane_sl]

            for m in range(8):
                zg = plane0 + s * 8 + m  # GLOBAL plane index (traced)
                zgf = zg.astype(jnp.float32)
                t_m = zgf * vsz - oz  # plane parameter (z' metres)
                t_ok = (t_m > 1e-6) & (t_m <= t_cover)
                ts = jnp.maximum(t_m, 1e-6)

                # sample coords (GLOBAL voxel units)
                yv = (oy + dy * ts) * inv_vsy  # [8,1]
                xv = (ox + dx * ts) * inv_vsx  # [1,128]
                yi = jnp.rint(yv).astype(jnp.int32)
                xi = jnp.rint(xv).astype(jnp.int32)
                yil = yi - row0  # row index local to the buffer

                # analytic window start from scalar corner geometry: y is
                # affine in the pixel row with positive slope ts/(f*vsy),
                # so the tile minimum is at row i0 (no vector reductions).
                ymin = (oy + (i0f - c) / f * ts) * inv_vsy
                ws_raw = (jnp.floor(ymin).astype(jnp.int32) // 8) * 8
                ws = jnp.clip(ws_raw - row0, 0, Yl - 8 * _N_WIN)

                xic = jnp.clip(xi, 0, Xp - 1)
                uchunk = jnp.broadcast_to(xic // 128, (8, 128))
                ulocc = jnp.clip(
                    jnp.broadcast_to(xic, (8, 128)) - uchunk * 128, 0, 127
                )

                acc = jnp.zeros((8, 128), jnp.float32)
                for k in range(_N_WIN):
                    wk = pl.multiple_of(ws + 8 * k, 8)
                    win = slab_ref[m, pl.ds(wk, 8), :].astype(jnp.float32)
                    vloc = yil - wk  # [8,1]
                    rmask = (vloc >= 0) & (vloc < 8)
                    ridx = jnp.broadcast_to(jnp.clip(vloc, 0, 7), (8, Xp))
                    rows = jnp.take_along_axis(win, ridx, axis=0)
                    for ch in range(x_chunks):
                        lane = jnp.take_along_axis(
                            rows[:, ch * 128 : (ch + 1) * 128], ulocc, axis=1
                        )
                        sel = rmask & (uchunk == ch)
                        acc = jnp.where(sel, lane, acc)

                f_new = acc * (1.0 / SHORTMAX)
                yok = (
                    (yi >= jnp.maximum(1, row_lo))
                    & (yi < jnp.minimum(Yp - 1, row_hi + 1))
                )
                xok = (xi >= 1) & (xi < Xp - 1)
                zok = t_ok & (zg >= 1) & (zg < Zp - 1)
                valid = zok & yok & xok  # [8,128] via broadcast

                dead = (ht < _INF) | (bt < _INF)
                live = ~dead
                # NaN fp makes both comparisons False (no event)
                front = live & valid & (fp > 0.0) & (f_new < 0.0)
                back = live & valid & (fp < 0.0) & (f_new > 0.0)
                denom = fp - f_new
                frac = fp / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
                ht = jnp.where(front, t_m - vsz + vsz * frac, ht)
                bt = jnp.where(back, t_m, bt)

                # outward x/y exit: mark dead with no hit
                exit_out = (
                    ((xi >= Xp - 1) & (dxb > 0))
                    | ((xi <= 0) & (dxb < 0))
                    | ((yi >= Yp - 1) & (dyb > 0))
                    | ((yi <= 0) & (dyb < 0))
                ) & t_ok
                bt = jnp.where(live & ~front & ~back & exit_out, t_m, bt)

                fp = jnp.where(valid, f_new, jnp.float32(_NAN))

            fprev_ref[row_sl, lane_sl] = fp
            hit_ref[row_sl, lane_sl] = ht
            back_ref[row_sl, lane_sl] = bt
            still = jnp.any((ht >= _INF) & (bt >= _INF))
            alive_ref[tid] = still.astype(jnp.int32)

        return 0

    n_active = count_ref[s]
    jax.lax.fori_loop(0, n_active, tile_body, 0, unroll=False)


def _sweep_face_rays(
    tsdf_p: jnp.ndarray,
    origin_p: jnp.ndarray,
    vs_p: Tuple[float, float, float],
    spec: RaySpec,
    interpret: bool,
    dims_global: Tuple[int, int, int] | None = None,
    plane0: jnp.ndarray | int = 0,
    row0: jnp.ndarray | int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """March all face rays through the primed volume; returns (hit_t, back_t)
    [F, F] f32 in the t = z' - o'_z parameterization (+inf = no event).

    `tsdf_p` may be a LOCAL slab of a (Zg, Yg, Xg) = `dims_global` primed
    volume, starting at global plane `plane0` (sweep-axis sharding) or
    global row `row0` (row-axis sharding; include halo rows so boundary
    crossings resolve locally). Events outside the local buffer stay +inf —
    the sharded caller min-composites across shards (parallel/sharded.py).
    """
    Zl, Yl, Xp = tsdf_p.shape
    Zg, Yg, _ = dims_global if dims_global is not None else (Zl, Yl, Xp)
    F = spec.size
    n_slabs = Zl // 8
    n_tile_cols = F // 128
    n_tile_rows = F // 8
    n_tiles = n_tile_rows * n_tile_cols

    vsx, vsy, vsz = vs_p
    ox, oy, oz = origin_p[0], origin_p[1], origin_p[2]
    plane0 = jnp.asarray(plane0, jnp.int32)
    row0 = jnp.asarray(row0, jnp.int32)
    plane0f = plane0.astype(jnp.float32)
    row0f = row0.astype(jnp.float32)

    # ---- host-side (traced, vector jnp) work-list construction ----------
    # 8^3-pooled "contains negative voxel" map + per-slab 2D SAT (LOCAL).
    # Pooled axis-by-axis: the one-shot 6D reshape+reduce_min lowers to a
    # 14.7 ms relayout+reduce on XLA:TPU at 512^3, the staged form to
    # <1 ms (r5 trace + /tmp/pool_bench.py). Y reduces FIRST: the
    # lane-group (X) reduce makes XLA relayout its input, so it runs on
    # the 8x-smaller Y-pooled array instead of the full volume.
    Zc, Yc, Xc = Zl // 8, Yl // 8, Xp // 8
    pooled = tsdf_p.reshape(Zl, Yc, 8, Xp).min(axis=2)
    pooled = pooled.reshape(Zl, Yc, Xc, 8).min(axis=3)
    pooled = pooled.reshape(Zc, 8, Yc, Xc).min(axis=1)
    neg = pooled < 0  # [Zc, Yc, Xc]
    sat = jnp.pad(
        jnp.cumsum(jnp.cumsum(neg.astype(jnp.int32), axis=1), axis=2),
        ((0, 0), (1, 0), (1, 0)),
    )  # [Zc, Yc+1, Xc+1]

    # tile footprint rectangles per (slab, tile): the tile's y range is
    # affine in the row index with positive slope, x in the column index,
    # evaluated at the slab's far plane for the max and the near plane for
    # the min (t > 0 monotone; clamp t at 0 when the camera is inside).
    ti = jnp.arange(n_tiles, dtype=jnp.int32)
    trow = (ti // n_tile_cols).astype(jnp.float32) * 8.0
    tcol = (ti % n_tile_cols).astype(jnp.float32) * 128.0
    cc = spec.centre
    fo = spec.focal
    dy_lo = (trow - cc) / fo
    dy_hi = (trow + 7.0 - cc) / fo
    dx_lo = (tcol - cc) / fo
    dx_hi = (tcol + 127.0 - cc) / fo

    sidx = jnp.arange(n_slabs, dtype=jnp.float32)
    t_lo = jnp.maximum((plane0f + sidx * 8.0) * vsz - oz, 0.0)[:, None]  # [S,1]
    t_hi = jnp.maximum((plane0f + sidx * 8.0 + 7.0) * vsz - oz, 0.0)[:, None]

    def rng(d_lo, d_hi, o, inv):
        cands = jnp.stack(
            [
                (o + d_lo[None, :] * t_lo) * inv,
                (o + d_lo[None, :] * t_hi) * inv,
                (o + d_hi[None, :] * t_lo) * inv,
                (o + d_hi[None, :] * t_hi) * inv,
            ]
        )
        return cands.min(axis=0), cands.max(axis=0)

    y0, y1 = rng(dy_lo, dy_hi, oy, 1.0 / vsy)  # [S, T] voxel units
    x0, x1 = rng(dx_lo, dx_hi, ox, 1.0 / vsx)

    # pad 1 voxel for rounding, convert to LOCAL cell bounds
    yc0 = jnp.clip(
        jnp.floor((y0 - row0f - 1.0) / 8.0).astype(jnp.int32), 0, Yc
    )
    yc1 = jnp.clip(jnp.ceil((y1 - row0f + 2.0) / 8.0).astype(jnp.int32), 0, Yc)
    xc0 = jnp.clip(jnp.floor((x0 - 1.0) / 8.0).astype(jnp.int32), 0, Xc)
    xc1 = jnp.clip(jnp.ceil((x1 + 2.0) / 8.0).astype(jnp.int32), 0, Xc)
    sflat = sat.reshape(Zc, -1)
    W1 = Xc + 1

    def rect_any(s2d):
        a = jnp.take_along_axis(s2d, yc1 * W1 + xc1, axis=1)
        b = jnp.take_along_axis(s2d, yc0 * W1 + xc1, axis=1)
        cq = jnp.take_along_axis(s2d, yc1 * W1 + xc0, axis=1)
        d = jnp.take_along_axis(s2d, yc0 * W1 + xc0, axis=1)
        return (a - b - cq + d) > 0

    has_neg = rect_any(sflat)  # [S, T]
    # visit when this, the previous, or the next slab can hold a negative
    # sample under the footprint: keeps f_prev fresh across every boundary
    # that can produce an event (see module docstring)
    visit = (
        has_neg
        | jnp.pad(has_neg[1:], ((0, 1), (0, 0)))
        | jnp.pad(has_neg[:-1], ((1, 0), (0, 0)))
    )

    # static ownership: tiles with any pixel inside the padded +-45 cone
    pix = jnp.arange(F, dtype=jnp.float32)
    tan = jnp.abs((pix - cc) / fo)
    ok_1d = tan <= 1.0 + _OWN_PAD_PX / fo
    row_ok = jnp.any(ok_1d.reshape(n_tile_rows, 8), axis=1)
    col_ok = jnp.any(ok_1d.reshape(n_tile_cols, 128), axis=1)
    own_t = (row_ok[:, None] & col_ok[None, :]).reshape(-1)

    visit = visit & own_t[None, :] & (t_hi > 0)
    counts = visit.sum(axis=1).astype(jnp.int32)  # [S]
    order = jnp.argsort(~visit, axis=1, stable=True).astype(jnp.int32)  # [S,T]

    prm = jnp.array([ox, oy, oz, vsx, vsy, vsz, spec.focal, spec.centre],
                    jnp.float32)
    geom = jnp.stack(
        [
            jnp.asarray(Zg, jnp.int32),
            jnp.asarray(Yg, jnp.int32),
            plane0,
            row0,
            row0,  # row_lo: first buffer row
            row0 + jnp.asarray(Yl - 1, jnp.int32),  # row_hi: last buffer row
        ]
    )

    kern = functools.partial(
        _sweep_kernel,
        dims_local=(Zl, Yl, Xp),
        spec=spec,
        n_tile_cols=n_tile_cols,
        n_tiles=n_tiles,
    )
    # Slab work list: only slabs with a non-empty tile list are streamed —
    # the grid's slab dimension is the DYNAMIC active count with a
    # scalar-prefetch index map (ascending actives, so the march order is
    # preserved; fprev freshness across skipped slabs is already handled
    # by the +-1-slab visit padding above). interpret mode keeps the full
    # static grid (dynamic grids need the compiled path).
    active = counts > 0
    if interpret:
        grid_z = n_slabs
        slabwl = jnp.arange(n_slabs, dtype=jnp.int32)
    else:
        # grid >= 1 so the first step always initializes the state fields
        # (an all-empty volume pads with slab 0, whose count is 0)
        grid_z = jnp.maximum(jnp.sum(active.astype(jnp.int32)), 1)
        slabwl = jnp.argsort(~active, stable=True).astype(jnp.int32)
    full_out = pl.BlockSpec(
        (F, F), lambda s, wl: (0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_z,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, Yl, Xp), lambda s, wl: (wl[s], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[full_out, full_out],
        scratch_shapes=[
            pltpu.VMEM((F, F), jnp.float32),
            pltpu.SMEM((n_tiles,), jnp.int32),
        ],
    )
    hit, back = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((F, F), jnp.float32),
            jax.ShapeDtypeStruct((F, F), jnp.float32),
        ],
        interpret=interpret,
    )(slabwl, prm, geom, order, counts, own_t.astype(jnp.int32), tsdf_p)
    return hit, back


# --------------------------------------------------------------------------
# face shading (jnp vector math) + camera resample kernel
# --------------------------------------------------------------------------


def _face_fields(hit, back, origin_p, spec: RaySpec):
    """(t_valid, normal' [F,F,3], nvalid) on the face grid.

    t_valid = refined hit parameter where a front crossing precedes any
    backface/exit event, else +inf. Normals: cross products of vertex-map
    central differences, oriented toward the camera; invalid where any
    neighbour is missing or jumps by more than a relative threshold."""
    F = spec.size
    ok = (hit < back) & (hit < _INF)
    t = jnp.where(ok, hit, jnp.float32(_INF))

    pix = jnp.arange(F, dtype=jnp.float32)
    dxr = (pix[None, :] - spec.centre) / spec.focal  # [1,F]
    dyr = (pix[:, None] - spec.centre) / spec.focal  # [F,1]

    def sh(a, di, dj):
        return jnp.roll(a, (-di, -dj), axis=(0, 1))

    # The nearest-voxel plane march quantizes the refined t at the voxel
    # scale; differentiating raw t amplifies that into tens of degrees of
    # normal noise. Smooth t over the valid 3x3 neighbourhood first (the
    # vertex map itself stays unsmoothed — only normals use t_s).
    # Masking on this chain is by MULTIPLICATION with finite operands, not
    # `jnp.where(pred, x, 0.0)` — the select form miscompiles on XLA:TPU
    # next to the fused switch (tools/PERF_NOTES.md "fused-step masking
    # miscompile"). hit is clamped finite before the multiply so 0 * INF
    # never makes a NaN.
    okf32 = ok.astype(jnp.float32)
    tz = jnp.minimum(hit, jnp.float32(1e30)) * okf32
    wsum = jnp.zeros_like(okf32)
    tsum = jnp.zeros_like(tz)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            wsum = wsum + sh(okf32, di, dj)
            tsum = tsum + sh(tz, di, dj)
    # finite everywhere (zero where invalid): only used for the normal
    # differences below, which are masked to the all-valid neighbourhood
    t_s = tsum / jnp.maximum(wsum, 1.0) * okf32

    vx = origin_p[0] + dxr * t_s
    vy = origin_p[1] + dyr * t_s
    vz = origin_p[2] + t_s
    v = jnp.stack([vx, vy, vz], axis=-1)  # [F,F,3]

    # +-1 central differences on the 3x3-smoothed t field. The r4 build
    # used +-2 differences, whose 4-neighbour validity rule zeroed normals
    # in a 2-px dead band around every silhouette — the dominant term of
    # the hit-mask divergence vs the jnp march (DIVERGENCES.md item 20)
    # and the black speckle ring in the Phong renders.
    okf = ok
    ok_r = sh(okf, 0, 1) & sh(okf, 0, -1) & sh(okf, 1, 0) & sh(okf, -1, 0) & okf
    du = sh(v, 0, 1) - sh(v, 0, -1)
    dv = sh(v, 1, 0) - sh(v, -1, 0)
    n = jnp.cross(du, dv)
    # depth-discontinuity rejection (relative, like frontend normals)
    tmag = jnp.maximum(t, 1e-6)
    disc = jnp.maximum(
        jnp.abs(sh(t, 0, 1) - sh(t, 0, -1)), jnp.abs(sh(t, 1, 0) - sh(t, -1, 0))
    )
    ok_n = ok_r & (disc < 0.05 * tmag)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok_n = ok_n & (nn[..., 0] > 1e-20)
    n = n / jnp.maximum(nn, 1e-30)
    # orient toward the camera: n . d' < 0
    d3 = jnp.stack([jnp.broadcast_to(dxr, (F, F)),
                    jnp.broadcast_to(dyr, (F, F)),
                    jnp.ones((F, F), jnp.float32)], axis=-1)
    flip = jnp.sum(n * d3, axis=-1) > 0
    sign = 1.0 - 2.0 * flip.astype(jnp.float32)
    n = n * sign[..., None] * ok_n[..., None].astype(jnp.float32)

    # Silhouette fill (DIVERGENCES.md item 20 mitigation), two rings:
    #   1. rim pixels WITH a hit but no valid normal (one-sided
    #      neighbourhood) adopt the 3x3 average of valid normals;
    #   2. pixels WITHOUT a hit but with >= 1 hit neighbour adopt the
    #      neighbourhood-average hit + averaged normal — closes the 1-px
    #      resample holes that deleted ICP correspondences and speckled
    #      the Phong renders.
    # Selects here pick between computed finite values / +-INF constants,
    # never broadcast zeros (the miscompiling form — see the masking note
    # above).
    nsum = jnp.zeros_like(n)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            nsum = nsum + sh(n, di, dj)
    nsn = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
    n_fill = nsum / jnp.maximum(nsn, 1e-30)
    usable = nsn[..., 0] > 1e-20
    rim = ok & (~ok_n) & usable
    n = jnp.where(rim[..., None], n_fill, n)
    t_avg = tsum / jnp.maximum(wsum, 1.0)
    fill = (~ok) & (wsum > 0.5) & usable
    t = jnp.where(fill, t_avg, t)
    n = jnp.where(fill[..., None], n_fill, n)
    return t, n, ok_n | rim | fill


def _resample_kernel(
    prm_ref,  # SMEM f32[16]: A (row-major 9), fx, fy, cx, cy
    t_ref, nx_ref, ny_ref, nz_ref,  # VMEM [F, F] f32
    t_out, nx_out, ny_out, nz_out,  # VMEM [8, W] f32 per grid row-block
    *,
    spec: RaySpec,
    width: int,
):
    i = pl.program_id(0)
    F = spec.size
    a = [prm_ref[k] for k in range(9)]
    fx, fy, cx, cy = prm_ref[9], prm_ref[10], prm_ref[11], prm_ref[12]
    f = jnp.float32(spec.focal)
    c = jnp.float32(spec.centre)

    n_ch = width // 128
    for ch in range(n_ch):
        j0 = ch * 128
        lx = (
            j0 + _fiota((8, 128), 1) - cx
        ) / fx
        ly = (
            i * 8 + _fiota((8, 128), 0) - cy
        ) / fy
        # primed direction d' = A @ [lx, ly, 1]
        dpx = a[0] * lx + a[1] * ly + a[2]
        dpy = a[3] * lx + a[4] * ly + a[5]
        dpz = a[6] * lx + a[7] * ly + a[8]
        fwd = dpz > 1e-6
        zs = jnp.where(fwd, dpz, 1.0)
        fu = jnp.rint(f * dpx / zs + c).astype(jnp.int32)
        fv = jnp.rint(f * dpy / zs + c).astype(jnp.int32)
        inb = fwd & (fu >= 0) & (fu < F) & (fv >= 0) & (fv < F)
        fu = jnp.clip(fu, 0, F - 1)
        fv = jnp.clip(fv, 0, F - 1)

        idx = TileIndices(fv, fu, n_chunks=F // 128)
        tval, nxv, nyv, nzv = gather2d_multi(
            (t_ref, nx_ref, ny_ref, nz_ref), idx, jnp.float32,
            n_windows=2, n_d=3,
        )
        sl = slice(j0, j0 + 128)
        t_out[:, sl] = jnp.where(inb, tval, jnp.float32(_INF))
        nx_out[:, sl] = jnp.where(inb, nxv, 0.0)
        ny_out[:, sl] = jnp.where(inb, nyv, 0.0)
        nz_out[:, sl] = jnp.where(inb, nzv, 0.0)


def _resample_face(t_f, n_f, A, intr: Intrinsics, spec: RaySpec, interpret):
    """Nearest-face-pixel resample of (t, normal') onto the camera grid."""
    h, w = intr.height, intr.width
    hp = (h + 7) & ~7
    wp = (w + 127) & ~127
    prm = jnp.concatenate(
        [
            A.reshape(-1).astype(jnp.float32),
            jnp.array([intr.fx, intr.fy, intr.cx, intr.cy, 0, 0, 0],
                      jnp.float32),
        ]
    )
    kern = functools.partial(_resample_kernel, spec=spec, width=wp)
    row = pl.BlockSpec((8, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec(
        (spec.size, spec.size), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(hp // 8,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [whole] * 4,
        out_specs=[row] * 4,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 4,
        interpret=interpret,
    )(prm, t_f, n_f[..., 0], n_f[..., 1], n_f[..., 2])
    t, nx, ny, nz = (o[:h, :w] for o in outs)
    return t, jnp.stack([nx, ny, nz], axis=-1)


# --------------------------------------------------------------------------
# per-face glue + public entry
# --------------------------------------------------------------------------


def _prime_geometry(frame: FaceFrame, params: KinFuParams):
    dims = params.volume_dims  # (X, Y, Z)
    vs = params.voxel_size
    D = np.asarray(frame.D, np.float32)
    off = np.zeros(3, np.float32)
    if frame.flip:
        a = int(np.argmax(np.abs(frame.D[2])))
        off[2] = (dims[a] - 1) * vs[a]
    vs_p = tuple(float(vs[int(np.argmax(np.abs(D[i])))]) for i in range(3))
    return jnp.asarray(D), jnp.asarray(off), vs_p


def _face_pass(
    tsdf: jnp.ndarray,
    frame: FaceFrame,
    cam2vol: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    spec: RaySpec,
    interpret: bool,
):
    """Full sweep + shade + resample for one face. Returns camera-grid
    (t [H,W], normal [H,W,3] in the ORIGINAL volume frame, own [H,W])."""
    R, t = cam2vol
    org = t  # camera centre in volume coords (cam2vol translation)
    D, off, vs_p = _prime_geometry(frame, params)
    org_p = D @ org + off

    tsdf_p = jnp.transpose(tsdf, frame.axes)
    if frame.flip:
        tsdf_p = jnp.flip(tsdf_p, axis=0)

    hit, back = _sweep_face_rays(tsdf_p, org_p, vs_p, spec, interpret)
    t_f, n_f, _ = _face_fields(hit, back, org_p, spec)

    A = D @ R  # camera pixel ray -> primed direction
    t_cam, n_cam_p = _resample_face(t_f, n_f, A, intr, spec, interpret)

    # exact exclusive ownership of camera pixels (face_frames partition)
    rays = intr.pixel_rays()  # [H,W,3] camera frame
    d_p = jnp.einsum("ij,hwj->hwi", A, rays)
    adx, ady, dz = jnp.abs(d_p[..., 0]), jnp.abs(d_p[..., 1]), d_p[..., 2]
    own_x = (adx < dz) if frame.gt_x else (adx <= dz)
    own_y = (ady < dz) if frame.gt_y else (ady <= dz)
    own = (dz > 0) & own_x & own_y

    # vertex on OUR pixel ray at the resampled parameter: p' = o' + d'/dz * t
    ok = t_cam < _INF
    # clamp-then-multiply, not `jnp.where(ok, t_cam, 0.0)` — see the
    # select-with-zero miscompile note in _face_fields
    tsafe = jnp.minimum(t_cam, jnp.float32(1e30)) * ok.astype(jnp.float32)
    p_p = org_p[None, None, :] + d_p / jnp.maximum(dz, 1e-9)[..., None] * tsafe[
        ..., None
    ]
    # unprime: p = D^T (p' - off), n = D^T n'
    p_v = jnp.einsum("ji,hwj->hwi", D, p_p - off[None, None, :])
    n_v = jnp.einsum("ji,hwj->hwi", D, n_cam_p)
    return p_v, n_v, ok, own


def raycast_warped(
    vol: TSDFVolume,
    cam2vol: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    spec: RaySpec | None = None,
    interpret: bool | None = None,
    faces: str | tuple = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cube-face plane-sweep raycast; camera-frame (vmap, nmap) [H,W,3]
    like volume/raycast.raycast (tsdf_volume.cu:249-254 output convention).

    faces="auto" sweeps every face that owns a frustum direction (traced
    flags via lax.cond); an explicit tuple pins the sweep set (tests)."""
    if spec is None:
        size, focal = params.raycast_face
        spec = RaySpec(size=int(size), focal=float(focal))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w = intr.height, intr.width
    R, tt = cam2vol

    frames = {fr.name: fr for fr in face_frames()}
    acc = (
        jnp.zeros((h, w, 3), jnp.float32),  # vertex (volume frame)
        jnp.zeros((h, w, 3), jnp.float32),  # normal (volume frame)
        jnp.zeros((h, w), jnp.bool_),  # valid
    )

    def run_face(a, fr):
        p_v, n_v, ok, own = _face_pass(
            vol.tsdf, fr, cam2vol, intr, params, spec, interpret
        )
        # multiply-mask accumulation (finite operands) — select-with-zero
        # miscompiles next to the dispatch switch, see _face_fields
        m = (own & ok).astype(jnp.float32)[..., None]
        nz = jnp.any(jnp.abs(n_v) > 0, axis=-1)
        return (
            p_v * m + a[0] * (1.0 - m),
            n_v * m + a[1] * (1.0 - m),
            (own & ok & nz) | a[2],
        )

    if faces == "auto":
        flags = _faces_needed(cam2vol, intr)
        names = list(frames)
        # Single-face frames (the common case) dispatch through ONE
        # lax.switch branch: the 6-cond chain measured 18.1 ms/frame vs
        # 2.8 ms for one pinned face at 512^3 (tools/raycast_probe.py r3 —
        # conditional operand/result staging of the 256 MB volume dominates)
        flag_vec = jnp.stack([flags[n] for n in names])
        nset = jnp.sum(flag_vec.astype(jnp.int32))
        code = jnp.where(nset == 1, jnp.argmax(flag_vec), len(names))

        def single(fr):
            return lambda a: run_face(a, fr)

        def chain(a):
            for name in names:
                a = jax.lax.cond(
                    flags[name],
                    lambda x, fr=frames[name]: run_face(x, fr),
                    lambda x: x,
                    a,
                )
            return a

        acc = jax.lax.switch(
            code, [single(frames[n]) for n in names] + [chain], acc
        )
    else:
        for name in faces:
            acc = run_face(acc, frames[name])

    vertex, normal, valid = acc
    Rinv = R.T
    org = tt
    vcam = jnp.einsum("ij,hwj->hwi", Rinv, vertex - org[None, None, :])
    ncam = jnp.einsum("ij,hwj->hwi", Rinv, normal)
    mask = valid.astype(jnp.float32)[..., None]
    return vcam * mask, ncam * mask


def _faces_needed(cam2vol: Pose, intr: Intrinsics, margin: float = _FACE_MARGIN):
    """Per-face traced flags: any sampled frustum direction within `margin`
    of the face's ownership cone (same rule as pallas_integrate, but for
    cam2vol: directions are R @ ray, not R^T @ ray)."""
    R, _ = cam2vol
    n = 7
    u = jnp.linspace(0.0, intr.width - 1.0, n)
    v = jnp.linspace(0.0, intr.height - 1.0, n)
    lx = (u[None, :] - intr.cx) / intr.fx
    ly = (v[:, None] - intr.cy) / intr.fy
    d_cam = jnp.stack(
        [jnp.broadcast_to(lx, (n, n)), jnp.broadcast_to(ly, (n, n)),
         jnp.ones((n, n))],
        axis=-1,
    )
    d_vol = jnp.einsum("ij,hwj->hwi", R, d_cam)
    dinf = jnp.max(jnp.abs(d_vol), axis=-1)
    flags = {}
    for frame in face_frames():
        axis_row = jnp.asarray(frame.D[2], jnp.float32)
        comp = jnp.einsum("k,hwk->hw", axis_row, d_vol)
        flags[frame.name] = jnp.any(comp >= margin * dinf)
    return flags
