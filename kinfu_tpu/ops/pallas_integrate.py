"""Pallas TPU kernel: TSDF fusion against axis-aligned face images.

Replaces the per-voxel random depth gather of the jnp integrate path
(kinfu_tpu/volume/integrate.py, parity with tsdf_volume.cu:41-110) with a
SEPARABLE resample of a face image (kinfu_tpu/ops/facewarp.py): for a
volume z-slab, the face pixel row v depends only on the voxel y index and
the column u only on the voxel x index (both affine), so an [8,128] voxel
tile reads from a statically tiny face window:

  - a per-slab mip level keeps the resample slope <= 2 face px / voxel
    (sub-half-voxel observation quantization), so 8 voxel rows span <= 16
    face rows -> FOUR 8-aligned row windows cover every tile, and one
    `jnp.take_along_axis` per window picks rows (Mosaic lowers it to
    tpu.dynamic_gather when the gathered dim fits a vreg: <= 8 sublanes —
    see kinfu_tpu/ops/tilegather.py);
  - columns are covered by the face's static 128-lane chunks with one
    lane-gather + select each.

Per tile that is ~24 register shuffles instead of 1024 serial gather
elements. The volume streams through VMEM one z-slab per grid step with
in-place aliasing; the face (range + color mips, ~4.9 MB) stays resident.

Full-frustum coverage at any camera orientation comes from running ONE
SWEEP PER CUBE FACE the frustum touches (`integrate_warped` with
faces="auto"): each face's sweep sees the volume with its axes permuted
(and the sweep axis flipped for negative faces) so it is always a "+z'"
sweep, and updates exactly the voxels it owns (dominant |d| component,
z>y>x tie-break — see facewarp.face_frames). A camera looking near a
volume axis needs one sweep; the worst-case corner direction needs three.
Faces the frustum provably misses are skipped via lax.cond.

Update math is identical to the jnp path (weighted TSDF average with
weight clamp, color averaged within the half-truncation band,
tsdf_volume.cu:69-96) except distances are along the ray rather than z
(sdf' = lambda * sdf, lambda in [1, 1.25]) — DIVERGENCES.md item 17; mip
sampling and the near-camera slope limit are items 18-19.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose
from kinfu_tpu.ops.facewarp import (
    FaceFrame,
    FaceSpec,
    build_face,
    default_face_spec,
    face_frames,
)
from kinfu_tpu.volume.tsdf import SHORTMAX, TSDFVolume

#: row windows per tile: slope <= _S_MAX -> an 8-voxel strip spans
#: <= 7*_S_MAX + 1.5 rows; with the 8-row alignment loss, _N_WINDOWS * 8
#: must exceed that by 7 (coverage bound: slope <= (8*N - 8.5) / 7).
#: 3 windows cover slope <= 2.21 — the mip selector targets <= 2.0, so the
#: fourth window only ever served the clamped coarsest level very close to
#: the camera; dropping it cuts 25% of the gather work (r3 perf).
_N_WINDOWS = 3
#: mip target: finest level with slope <= _S_MAX face px / voxel. Higher =
#: finer observation sampling (lateral quantization error = 0.5/_S_MAX .. 1
#: voxels) but more row windows.
_S_MAX = 2.0
#: hard coverage limit for the clamped coarsest level (must stay within the
#: window bound 2.21 for 3 windows); slabs beyond it are masked
#: (DIVERGENCES.md 19)
_S_COVER = 2.2

#: a face sweep is considered needed when any sampled frustum direction d
#: has (face axis component) >= _FACE_MARGIN * ||d||_inf — ~17 deg of slack
#: beyond the exact ownership cone, safely above the 7x7 sampling gap
_FACE_MARGIN = 0.75

#: max voxels per slab row-block (see _sweep_face): 2^18 keeps the block's
#: in+out x 3-array footprint within the 16 MB scoped-VMEM budget
_YB_CAP = 1 << 18


def _fiota(shape, dim):
    """float32 iota via int32 (Mosaic rejects float tpu.iota)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _mip_scalars(spec: FaceSpec, slope: jnp.ndarray):
    """Per-slab mip scalars from the full-res slope (face px/voxel):
    level L = smallest with slope/2^L <= _S_MAX, clamped to the pyramid —
    the finest level whose _N_WINDOWS 8-row windows still cover an 8-voxel
    strip (the coarser the mip, the larger the lateral quantization error,
    so the criterion sits near the coverage bound).
    Returns (inv_scale, row_off, width, h_pad, cover_ok): `width` is the
    level's true pixel count, `h_pad` its 8-aligned row block, and
    `cover_ok` is False when even the clamped level's slope exceeds 1.0 —
    the bound past which two 8-row windows can no longer cover an 8-voxel
    strip (voxels that close to the camera are masked, DIVERGENCES.md 19)."""
    lvl = jnp.zeros((), jnp.int32)
    for l in range(1, spec.levels):
        lvl = lvl + (slope > _S_MAX * (1 << (l - 1))).astype(jnp.int32)
    inv_scale = jnp.float32(1.0)
    row_off = jnp.int32(spec.row_offsets[0])
    width = jnp.int32(spec.size)
    h_pad = jnp.int32(spec.level_rows[0])
    for l in range(1, spec.levels):
        sel = lvl == l
        inv_scale = jnp.where(sel, jnp.float32(1.0 / (1 << l)), inv_scale)
        row_off = jnp.where(sel, jnp.int32(spec.row_offsets[l]), row_off)
        width = jnp.where(sel, jnp.int32(spec.size >> l), width)
        h_pad = jnp.where(sel, jnp.int32(spec.level_rows[l]), h_pad)
    cover_ok = slope * inv_scale <= _S_COVER
    return inv_scale, row_off, width, h_pad, cover_ok


def _window_gather(range_ref, color_ref, ws_list, v_loc, u_mip, n_chunks):
    """out[i,j] = face[v[i], u[i,j]] for range (f32) + color (i32).

    `ws_list`: static-count window starts (8-aligned scalars, in-bounds);
    `v_loc[k]`: row index local to window k, [8,1] i32 lane-constant
    (separable: v depends only on the voxel y index; masked by range);
    `u_mip`: [8,128] i32 column index, pre-clipped to [0, stack width).
    """
    uchunk = u_mip // 128
    uloc = u_mip - uchunk * 128
    acc_r = jnp.zeros(u_mip.shape, jnp.float32)
    acc_c = jnp.zeros(u_mip.shape, jnp.int32)
    for k, ws in enumerate(ws_list):
        win_r = range_ref[pl.ds(ws, 8), :].astype(jnp.float32)
        win_c = color_ref[pl.ds(ws, 8), :]
        ridx = v_loc[k]  # [8,1]
        rmask = (ridx >= 0) & (ridx < 8)  # [8,1]
        ridx_full = jnp.broadcast_to(jnp.clip(ridx, 0, 7), win_r.shape)
        rows_r = jnp.take_along_axis(win_r, ridx_full, axis=0)
        rows_c = jnp.take_along_axis(win_c, ridx_full, axis=0)
        for c in range(n_chunks):
            sel = rmask & (uchunk == c)
            lane_r = jnp.take_along_axis(rows_r[:, c * 128 : (c + 1) * 128], uloc, 1)
            lane_c = jnp.take_along_axis(rows_c[:, c * 128 : (c + 1) * 128], uloc, 1)
            acc_r = jnp.where(sel, lane_r, acc_r)
            acc_c = jnp.where(sel, lane_c, acc_c)
    return acc_r, acc_c


def _min_abs(lo, hi):
    """min |x| over the interval [lo, hi] (elementwise)."""
    return jnp.where(lo > 0.0, lo, jnp.where(hi < 0.0, -hi, 0.0))


def _slab_geometry(spec: FaceSpec, zf, prm, x_dim: int, y_lo_f, y_hi_f):
    """Per-slab gate + affine face-coordinate scalars, elementwise in the
    plane index `zf` (float). ONE implementation serves both the kernel
    (scalar zf, this block's y bounds) and the host-side work-list builder
    in `_sweep_face` (vector zf over all planes, full-Y bounds — a
    SUPERSET of any y-block's gate, so listing by it is always safe).

    `prm` is the tuple (cx, cy, cz, vsx, vsy, vsz, focal, centre,
    trunc_mm, r_max_mm). Returns a dict of the derived values."""
    cx, cy, cz, vsx, vsy, vsz, focal, centre, trunc_mm, r_max_mm = prm
    dz = zf * vsz - cz
    dz_ok = dz > 1e-3
    dzs = jnp.maximum(dz, 1e-3)
    slope = focal * jnp.maximum(vsx, vsy) / dzs
    inv_scale, row_off, width, h_pad, cover_ok = _mip_scalars(spec, slope)
    h_lvl = width  # square face: level height == level width
    slab_ok = dz_ok & cover_ok

    # affine face coords in MIP units: u = au*x + bu, v = av*y + bv
    au = focal * vsx / dzs * inv_scale
    bu = (-focal * cx / dzs + centre) * inv_scale
    av = focal * vsy / dzs * inv_scale
    bv = (-focal * cy / dzs + centre) * inv_scale

    dx_min_f = _min_abs(-cx, (x_dim - 1) * vsx - cx)
    dy_min_f = _min_abs(y_lo_f * vsy - cy, y_hi_f * vsy - cy)
    u_hi_f = au * jnp.float32(x_dim - 1) + bu
    v_lo_f = av * y_lo_f + bv  # av >= 0: min over the block's rows
    v_hi_f = av * y_hi_f + bv
    r_min_slab_mm = (
        jnp.sqrt(dx_min_f * dx_min_f + dy_min_f * dy_min_f + dz * dz) * 1000.0
    )
    slab_do = (
        slab_ok
        & (dx_min_f <= dzs)
        & (dy_min_f <= dzs)
        & (u_hi_f >= -0.5)
        & (bu <= width.astype(jnp.float32) - 0.5)
        & (v_hi_f >= -0.5)
        & (v_lo_f <= h_lvl.astype(jnp.float32) - 0.5)
        & (r_min_slab_mm <= r_max_mm + trunc_mm)
    )
    return dict(
        dz=dz, dz_ok=dz_ok, dzs=dzs, inv_scale=inv_scale, row_off=row_off,
        width=width, h_pad=h_pad, cover_ok=cover_ok, h_lvl=h_lvl,
        au=au, bu=bu, av=av, bv=bv, slab_do=slab_do,
    )


def _kernel(
    *refs,
    spec: FaceSpec,
    y_dim: int,
    x_dim: int,
    y_block: int,
    unroll: int,
    gt_x: bool,
    gt_y: bool,
    worklist: bool,
):
    if worklist:
        # scalar-prefetch work-list of active plane indices: the dynamic
        # grid runs `count` steps and only the listed slabs are streamed
        # (unlisted slabs keep their content via in-place aliasing)
        (wl_ref, prm_ref, range_ref, color_ref, tsdf_ref, weight_ref,
         col_ref, tsdf_out, weight_out, col_out) = refs
        z = wl_ref[pl.program_id(0)]
    else:
        (prm_ref, range_ref, color_ref, tsdf_ref, weight_ref,
         col_ref, tsdf_out, weight_out, col_out) = refs
        z = pl.program_id(0)
    # y-blocking: at >=1024^2 slab cross-sections a whole (1, Y, X) slab
    # block exceeds the 16 MB scoped-VMEM budget (measured: 32 MB at
    # 1024^2), so the grid carries a second dimension over row blocks;
    # geometry below always uses the GLOBAL row index y_base + local.
    y_base = pl.program_id(1) * y_block
    y_basef = y_base.astype(jnp.float32)
    cx, cy, cz = prm_ref[0], prm_ref[1], prm_ref[2]
    vsx, vsy, vsz = prm_ref[3], prm_ref[4], prm_ref[5]
    focal, centre = prm_ref[6], prm_ref[7]
    trunc_mm, max_weight = prm_ref[8], prm_ref[9]
    r_max_mm = prm_ref[10]  # max observed range this face, mm

    g = _slab_geometry(
        spec,
        z.astype(jnp.float32),
        (cx, cy, cz, vsx, vsy, vsz, focal, centre, trunc_mm, r_max_mm),
        x_dim,
        y_basef,
        jnp.float32(y_block - 1) + y_basef,
    )
    dz = g["dz"]
    dz_ok = g["dz_ok"]
    dzs = g["dzs"]
    inv_scale, row_off = g["inv_scale"], g["row_off"]
    width, h_pad, cover_ok = g["width"], g["h_pad"], g["cover_ok"]
    h_lvl = g["h_lvl"]
    au, bu, av, bv = g["au"], g["bu"], g["av"], g["bv"]
    slab_do = g["slab_do"]

    dxl = (
        _fiota((1, 128), 1) * vsx - cx
    )  # per-chunk base added in the loop
    dyr = _fiota((8, 1), 0) * vsy - cy

    n_chunks = spec.size // 128
    x_chunks = x_dim // 128
    inv_short = jnp.float32(1.0 / SHORTMAX)

    def copy_chunk(row_sl, lane_sl):
        tsdf_out[0, row_sl, lane_sl] = tsdf_ref[0, row_sl, lane_sl]
        weight_out[0, row_sl, lane_sl] = weight_ref[0, row_sl, lane_sl]
        col_out[0, row_sl, lane_sl] = col_ref[0, row_sl, lane_sl]

    def strip(i):
        # NOTE: no per-strip/per-chunk predication — pl.when at that
        # granularity measured SLOWER than unconditional work (Mosaic
        # scheduling, tools/integrate_probe.py r3); only the whole-slab
        # gate below pays off.
        y0 = i * 8  # row index local to this y block
        y0f = (y_base + y0).astype(jnp.float32)  # GLOBAL row (geometry)
        row_sl = pl.ds(pl.multiple_of(y0, 8), 8)

        # window starts from the strip's first row (av >= 0 -> min at y0)
        vmin = jnp.floor(av * y0f + bv).astype(jnp.int32)
        ws_base = (vmin // 8) * 8
        dy = dyr + y0f * vsy  # [8,1] metres
        v_mip = jnp.rint(
            av * (y0f + _fiota((8, 1), 0)) + bv
        ).astype(jnp.int32)
        v_ok = (v_mip >= 0) & (v_mip < h_lvl)

        # per-window 8-aligned starts, clamped inside the level's padded
        # row block so every 8-row read stays in bounds (rows past h_lvl
        # are padding; v_ok masks them)
        ws_list, v_loc = [], []
        for k in range(_N_WINDOWS):
            ws_k = jnp.clip(ws_base + 8 * k, 0, h_pad - 8)
            ws_list.append(pl.multiple_of(row_off + ws_k, 8))
            v_loc.append(v_mip - ws_k)

        for xc in range(x_chunks):
            x0 = xc * 128
            _chunk_body(x0, slice(x0, x0 + 128), row_sl, dy, v_ok,
                        ws_list, v_loc)

    def _chunk_body(x0, lane_sl, row_sl, dy, v_ok, ws_list, v_loc):
        if True:  # keep the original body's indentation shallow
            dx = dxl + jnp.float32(x0) * vsx  # [1,128] metres
            u_mip = jnp.rint(
                au
                * (jnp.float32(x0) + _fiota((1, 128), 1))
                + bu
            ).astype(jnp.int32)
            u_ok = (u_mip >= 0) & (u_mip < width)
            u_cl = jnp.clip(jnp.broadcast_to(u_mip, (8, 128)), 0, spec.size - 1)

            r_obs, c_obs = _window_gather(
                range_ref, color_ref, ws_list, v_loc, u_cl, n_chunks
            )

            # exclusive cube-face ownership (facewarp.face_frames): this
            # face owns the voxel iff |d_z'| is the dominant component under
            # the z>y>x tie-break, expressed via the static gt_x/gt_y flags
            adx, ady = jnp.abs(dx), jnp.abs(dy)
            own_x = (adx < dzs) if gt_x else (adx <= dzs)
            own_y = (ady < dzs) if gt_y else (ady <= dzs)
            own = own_x & own_y & dz_ok & cover_ok
            valid = own & jnp.broadcast_to(u_ok, (8, 128)) & v_ok & (r_obs > 0)

            r_vox = jnp.sqrt(dx * dx + dy * dy + dz * dz) * 1000.0  # mm
            sdf = r_obs - r_vox
            upd = valid & (sdf >= -trunc_mm)
            tsdf_obs = jnp.minimum(1.0, sdf / trunc_mm)

            lane_sl = slice(x0, x0 + 128)
            t_old = tsdf_ref[0, row_sl, lane_sl].astype(jnp.float32) * inv_short
            w_old = weight_ref[0, row_sl, lane_sl].astype(jnp.float32)
            c_old = col_ref[0, row_sl, lane_sl]

            w_new = jnp.minimum(w_old + 1.0, max_weight)
            t_new = (t_old * w_old + tsdf_obs) / (w_old + 1.0)
            t_fix = jnp.trunc(jnp.clip(t_new * SHORTMAX, -SHORTMAX, SHORTMAX)).astype(
                jnp.int16
            )

            cupd = upd & (sdf <= trunc_mm * 0.5) & (sdf >= -trunc_mm * 0.5)
            pr = jnp.right_shift(c_obs, 16) & 0xFF
            pg = jnp.right_shift(c_obs, 8) & 0xFF
            pb = c_obs & 0xFF
            orr = jnp.right_shift(c_old, 16) & 0xFF
            org = jnp.right_shift(c_old, 8) & 0xFF
            orb = c_old & 0xFF

            def mix(o, p):
                m = (w_new * o.astype(jnp.float32) + p.astype(jnp.float32)) / (
                    w_new + 1.0
                )
                return jnp.clip(m, 0.0, 255.0).astype(jnp.int32)

            c_new = (
                jnp.left_shift(mix(orr, pr), 16)
                | jnp.left_shift(mix(org, pg), 8)
                | mix(orb, pb)
            )

            tsdf_out[0, row_sl, lane_sl] = jnp.where(
                upd, t_fix, tsdf_ref[0, row_sl, lane_sl]
            )
            weight_out[0, row_sl, lane_sl] = jnp.where(
                upd, w_new.astype(jnp.int16), weight_ref[0, row_sl, lane_sl]
            )
            col_out[0, row_sl, lane_sl] = jnp.where(cupd, c_new, c_old)

    n_strips = y_block // 8

    def body(k, _):
        for s in range(unroll):
            strip(k * unroll + s)
        return 0

    @pl.when(slab_do)
    def _slab_work():
        jax.lax.fori_loop(0, n_strips // unroll, body, 0)

    @pl.when(jnp.logical_not(slab_do))
    def _slab_copy():
        def cbody(k, _):
            for s in range(unroll):
                y0 = (k * unroll + s) * 8
                row_sl = pl.ds(pl.multiple_of(y0, 8), 8)
                for xc in range(x_chunks):
                    copy_chunk(row_sl, slice(xc * 128, (xc + 1) * 128))
            return 0

        jax.lax.fori_loop(0, n_strips // unroll, cbody, 0)


def _sweep_face(
    tsdf: jnp.ndarray,
    weight: jnp.ndarray,
    col_i32: jnp.ndarray,
    frame: FaceFrame,
    depth_m: jnp.ndarray,
    color_rgb: jnp.ndarray,
    vol2cam: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    spec: FaceSpec,
    interpret: bool,
    alias: bool | None = None,
):
    """One separable fusion sweep over the voxels owned by `frame`'s face.

    Arrays arrive in natural [Z, Y, X] order; they are permuted into the
    face's primed frame (sweep axis leading, flipped for negative faces),
    swept, and permuted back. Voxels the face does not own are untouched.
    """
    if alias is None:
        # in-place VMEM streaming by default; KINFU_DISABLE_ALIAS=1 is a
        # hardware-bisect lever for the miscompile class where aliasing a
        # pallas_call's IO inside a lax.switch branch corrupts buffers
        # (tools/PERF_NOTES.md "fused-step masking miscompile")
        alias = os.environ.get("KINFU_DISABLE_ALIAS") != "1"
    dims_xyz = (tsdf.shape[2], tsdf.shape[1], tsdf.shape[0])  # (X, Y, Z)
    vs = params.voxel_size

    def prime(a):
        a = jnp.transpose(a, frame.axes)
        return jnp.flip(a, axis=0) if frame.flip else a

    def unprime(a):
        a = jnp.flip(a, axis=0) if frame.flip else a
        inv = tuple(int(i) for i in np.argsort(frame.axes))
        return jnp.transpose(a, inv)

    t_p, w_p, c_p = prime(tsdf), prime(weight), prime(col_i32)
    Zp, Yp, Xp = t_p.shape
    assert Yp % 8 == 0 and Xp % 128 == 0, (frame.name, t_p.shape)

    # primed voxel sizes: vs'_i = vs of the original axis primed axis i maps to
    vs_p = tuple(float(vs[int(np.argmax(np.abs(frame.D[i])))]) for i in range(3))

    face = build_face(
        depth_m, color_rgb, vol2cam, intr, spec,
        frame=frame, dims=dims_xyz, voxel_size=vs,
    )
    # max observed range (scalar): lets the kernel skip whole tiles that are
    # provably beyond every observation (sdf < -trunc across the tile)
    r_max_mm = jnp.max(face.range_mm).astype(jnp.float32)
    prm = jnp.concatenate(
        [
            face.centre,
            jnp.array(
                [
                    vs_p[0],
                    vs_p[1],
                    vs_p[2],
                    spec.focal,
                    spec.centre,
                    params.trunc_dist * 1000.0,
                    float(params.tsdf_max_weight),
                ],
                jnp.float32,
            ),
            r_max_mm[None],
            jnp.zeros((5,), jnp.float32),
        ]
    )

    # y-block rows so the slab's (in + out) x 3-array VMEM footprint stays
    # inside the 16 MB scoped budget with double buffering: 8 B/voxel x
    # YB x Xp x 2 x 2 <= ~8 MB  =>  YB * Xp <= 2^18 (whole slab at <= 512^2)
    YB = Yp
    while YB * Xp > _YB_CAP and YB % 16 == 0:
        YB //= 2
    assert YB % 8 == 0, (frame.name, Yp, Xp, YB)
    # the halving loop stops when YB is 8*odd — if the block is still over
    # budget then (Y = 8*odd with very large X), fail here with a clear
    # message instead of a Mosaic scoped-VMEM compile error
    assert YB * Xp <= _YB_CAP, (
        f"{frame.name}: slab row-block {YB}x{Xp} exceeds the VMEM budget "
        f"({_YB_CAP} voxels); pad Y to a higher power-of-two multiple"
    )

    out_shape = [
        jax.ShapeDtypeStruct((Zp, Yp, Xp), jnp.int16),
        jax.ShapeDtypeStruct((Zp, Yp, Xp), jnp.int16),
        jax.ShapeDtypeStruct((Zp, Yp, Xp), jnp.int32),
    ]
    # Work-list slab streaming (TPU + in-place aliasing only): the host
    # mirrors the kernel's slab gate (same _slab_geometry, full-Y bounds —
    # a superset of any y-block's gate), sorts the active plane indices
    # first, and the pallas grid's z dimension becomes the DYNAMIC active
    # count with a scalar-prefetch index map — unobserved slabs are never
    # DMA'd at all and keep their content through the aliased buffers
    # (verified on hardware, r5 work-list probe). interpret mode and the
    # KINFU_DISABLE_ALIAS escape hatch keep the full static grid.
    use_worklist = alias and not interpret
    kern = functools.partial(
        _kernel,
        spec=spec,
        y_dim=Yp,
        x_dim=Xp,
        y_block=YB,
        unroll=4 if YB % 32 == 0 else 1,
        gt_x=frame.gt_x,
        gt_y=frame.gt_y,
        worklist=use_worklist,
    )
    if use_worklist:
        cen = face.centre
        gate = _slab_geometry(
            spec,
            jnp.arange(Zp, dtype=jnp.float32),
            (
                cen[0], cen[1], cen[2],
                jnp.float32(vs_p[0]), jnp.float32(vs_p[1]),
                jnp.float32(vs_p[2]),
                jnp.float32(spec.focal), jnp.float32(spec.centre),
                jnp.float32(params.trunc_dist * 1000.0), r_max_mm,
            ),
            Xp,
            jnp.float32(0.0),
            jnp.float32(Yp - 1),
        )["slab_do"]
        count = jnp.sum(gate.astype(jnp.int32))
        wl = jnp.argsort(~gate, stable=True).astype(jnp.int32)
        slab = lambda: pl.BlockSpec(  # noqa: E731
            (1, YB, Xp), lambda s, yb, wl: (wl[s], yb, 0)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(count, Yp // YB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (spec.stack_rows, spec.size), lambda s, yb, wl: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (spec.stack_rows, spec.size), lambda s, yb, wl: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                slab(),
                slab(),
                slab(),
            ],
            out_specs=[slab(), slab(), slab()],
        )
        t_n, w_n, c_n = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases={4: 0, 5: 1, 6: 2},
            interpret=interpret,
        )(wl, prm, face.range_mm, face.color, t_p, w_p, c_p)
    else:
        slab = lambda: pl.BlockSpec((1, YB, Xp), lambda z, yb: (z, yb, 0))  # noqa: E731
        whole = pl.BlockSpec(
            (spec.stack_rows, spec.size), lambda z, yb: (0, 0),
            memory_space=pltpu.VMEM,
        )
        t_n, w_n, c_n = pl.pallas_call(
            kern,
            grid=(Zp, Yp // YB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                whole,
                whole,
                slab(),
                slab(),
                slab(),
            ],
            out_specs=[slab(), slab(), slab()],
            out_shape=out_shape,
            input_output_aliases={3: 0, 4: 1, 5: 2} if alias else {},
            interpret=interpret,
        )(prm, face.range_mm, face.color, t_p, w_p, c_p)

    return unprime(t_n), unprime(w_n), unprime(c_n)


def faces_needed(vol2cam: Pose, intr: Intrinsics, margin: float = _FACE_MARGIN):
    """Traced per-face flags: True when any sampled frustum direction is
    within `margin` of the face's ownership cone. Samples a 7x7 pixel grid
    (~10 deg spacing at the reference FOV; the margin expands each cone by
    ~17 deg, so slivers between samples cannot be missed)."""
    R, _ = vol2cam
    n = 7
    u = jnp.linspace(0.0, intr.width - 1.0, n)
    v = jnp.linspace(0.0, intr.height - 1.0, n)
    lx = (u[None, :] - intr.cx) / intr.fx
    ly = (v[:, None] - intr.cy) / intr.fy
    d_cam = jnp.stack(
        [jnp.broadcast_to(lx, (n, n)), jnp.broadcast_to(ly, (n, n)), jnp.ones((n, n))],
        axis=-1,
    )
    d_vol = jnp.einsum("ji,hwj->hwi", R, d_cam)  # R^T @ d_cam
    dinf = jnp.max(jnp.abs(d_vol), axis=-1)
    flags = {}
    for frame in face_frames():
        axis_row = jnp.asarray(frame.D[2], jnp.float32)
        comp = jnp.einsum("k,hwk->hw", axis_row, d_vol)
        flags[frame.name] = jnp.any(comp >= margin * dinf)
    return flags


def integrate_warped(
    vol: TSDFVolume,
    depth_m: jnp.ndarray,
    color_rgb: jnp.ndarray,
    vol2cam: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    spec: FaceSpec | None = None,
    interpret: bool | None = None,
    faces: str | tuple = "auto",
    shard_dim: int | None = None,
) -> TSDFVolume:
    """Fuse one frame via face-warp + separable Pallas sweeps.

    faces="auto" runs every cube-face sweep the frustum touches (gated by
    traced `faces_needed` flags via lax.cond — full-frustum coverage at any
    camera orientation, like tsdf_volume.cu:49-68). Passing an explicit
    tuple of face names (e.g. ("+z",)) runs exactly those sweeps with no
    gating — tests and known-orientation callers.
    """
    if spec is None:
        spec = default_face_spec()
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Z, Y, X = vol.tsdf.shape

    frames = {f.name: f for f in face_frames(shard_dim)}
    arrays = (vol.tsdf, vol.weight, vol.color)  # colour is int32 packed

    sweep = functools.partial(
        _sweep_face,
        depth_m=depth_m,
        color_rgb=color_rgb,
        vol2cam=vol2cam,
        intr=intr,
        params=params,
        spec=spec,
        interpret=interpret,
    )

    if faces == "auto":
        flags = faces_needed(vol2cam, intr)
        names = list(frames)
        # The common case is ONE face (a near-axis camera). A chain of six
        # lax.conds costs a full volume copy per identity branch (~23 ms of
        # the 512^3 frame, tools/integrate_probe.py r3) — so single-face
        # frames dispatch through ONE lax.switch branch and only genuinely
        # multi-face frames pay the cond chain.
        flag_vec = jnp.stack([flags[n] for n in names])
        nset = jnp.sum(flag_vec.astype(jnp.int32))
        code = jnp.where(nset == 1, jnp.argmax(flag_vec), len(names))

        # branch roots pass through pin_natural so the switch result keeps
        # the row-major layout regardless of which branches transpose
        # internally (ops/layout_pin.py)
        from kinfu_tpu.ops.layout_pin import pin_natural

        def single(fr):
            return lambda a: pin_natural(*sweep(*a, fr))

        def chain(a):
            for name in names:
                a = jax.lax.cond(
                    flags[name],
                    lambda x, fr=frames[name]: sweep(*x, fr),
                    lambda x: x,
                    a,
                )
            return pin_natural(*a)

        arrays = jax.lax.switch(
            code, [single(frames[n]) for n in names] + [chain], arrays
        )
    else:
        for name in faces:
            arrays = sweep(*arrays, frames[name])

    tsdf_n, weight_n, col_n = arrays
    return TSDFVolume(tsdf=tsdf_n, weight=weight_n, color=col_n)
