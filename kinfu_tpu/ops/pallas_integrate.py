"""Pallas TPU kernel: TSDF fusion against an axis-aligned face image.

Replaces the per-voxel random depth gather of the jnp integrate path
(kinfu_tpu/volume/integrate.py, parity with tsdf_volume.cu:41-110) with a
SEPARABLE resample of a face image (kinfu_tpu/ops/facewarp.py): for a
volume z-slab, the face pixel row v depends only on the voxel y index and
the column u only on the voxel x index (both affine), so an [8,128] voxel
tile reads from a statically tiny face window:

  - a per-slab mip level keeps the resample slope <= 0.5 face px / voxel,
    so 8 voxel rows span <= 4 face rows -> TWO 8-aligned row windows cover
    every tile, and one `jnp.take_along_axis` per window picks rows
    (Mosaic lowers it to tpu.dynamic_gather when the gathered dim fits a
    vreg: <= 8 sublanes — see kinfu_tpu/ops/tilegather.py);
  - columns are covered by the face's static 128-lane chunks with one
    lane-gather + select each.

Per tile that is ~24 register shuffles instead of 1024 serial gather
elements. The volume streams through VMEM one z-slab per grid step with
in-place aliasing; the face (range + color mips, ~4.6 MB) stays resident.

Update math is identical to the jnp path (weighted TSDF average with
weight clamp, color averaged within the half-truncation band,
tsdf_volume.cu:69-96) except distances are along the ray rather than z
(sdf' = lambda * sdf, lambda in [1, 1.25]) — recorded in DIVERGENCES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose
from kinfu_tpu.ops.facewarp import Face, FaceSpec, build_face, default_face_spec
from kinfu_tpu.volume.tsdf import SHORTMAX, TSDFVolume

_N_WINDOWS = 2  # row windows per tile (slope <= 0.5 -> span <= 4 rows + align)


def _mip_scalars(spec: FaceSpec, slope: jnp.ndarray):
    """Per-slab mip level scalars from the full-res slope (face px/voxel):
    level L = smallest with slope/2^L <= 0.5, clamped to the pyramid."""
    lvl = jnp.zeros((), jnp.int32)
    for l in range(1, spec.levels):
        lvl = lvl + (slope > 0.5 * (1 << (l - 1))).astype(jnp.int32)
    inv_scale = jnp.float32(1.0)
    row_off = jnp.int32(spec.row_offsets[0])
    width = jnp.int32(spec.size)
    for l in range(1, spec.levels):
        sel = lvl == l
        inv_scale = jnp.where(sel, jnp.float32(1.0 / (1 << l)), inv_scale)
        row_off = jnp.where(sel, jnp.int32(spec.row_offsets[l]), row_off)
        width = jnp.where(sel, jnp.int32(spec.size >> l), width)
    return inv_scale, row_off, width


def _window_gather(range_ref, color_ref, ws_list, v_loc, u_mip, n_chunks):
    """out[i,j] = face[v[i,j], u[i,j]] for range (f32) + color (i32).

    `ws_list`: static-count window starts (8-aligned scalars);
    `v_loc[k]`: row index local to window k, [8,128] i32 (masked by range);
    `u_mip`: [8,128] i32 column index, pre-clipped to [0, width).
    """
    uchunk = u_mip // 128
    uloc = u_mip - uchunk * 128
    acc_r = jnp.zeros(u_mip.shape, jnp.float32)
    acc_c = jnp.zeros(u_mip.shape, jnp.int32)
    for k, ws in enumerate(ws_list):
        win_r = range_ref[pl.ds(ws, 8), :].astype(jnp.float32)
        win_c = color_ref[pl.ds(ws, 8), :]
        ridx = v_loc[k]
        rmask = (ridx >= 0) & (ridx < 8)
        ridx_c = jnp.clip(ridx, 0, 7)
        rows_r = jnp.take_along_axis(win_r, ridx_c, axis=0)
        rows_c = jnp.take_along_axis(win_c, ridx_c, axis=0)
        for c in range(n_chunks):
            sel = rmask & (uchunk == c)
            lane_r = jnp.take_along_axis(rows_r[:, c * 128 : (c + 1) * 128], uloc, 1)
            lane_c = jnp.take_along_axis(rows_c[:, c * 128 : (c + 1) * 128], uloc, 1)
            acc_r = jnp.where(sel, lane_r, acc_r)
            acc_c = jnp.where(sel, lane_c, acc_c)
    return acc_r, acc_c


def _kernel(
    prm_ref,  # SMEM f32[16]
    range_ref,  # VMEM [stack_rows, size] i16
    color_ref,  # VMEM [stack_rows, size] i32
    tsdf_ref,
    weight_ref,
    col_ref,  # volume slab blocks [1, Y, X]
    tsdf_out,
    weight_out,
    col_out,
    *,
    spec: FaceSpec,
    y_dim: int,
    x_dim: int,
    unroll: int,
):
    z = pl.program_id(0)
    cx, cy, cz = prm_ref[0], prm_ref[1], prm_ref[2]
    vsx, vsy, vsz = prm_ref[3], prm_ref[4], prm_ref[5]
    focal, centre = prm_ref[6], prm_ref[7]
    trunc_mm, max_weight = prm_ref[8], prm_ref[9]

    dz = z.astype(jnp.float32) * vsz - cz
    dz_ok = dz > 1e-3
    dzs = jnp.maximum(dz, 1e-3)
    slope = focal * jnp.maximum(vsx, vsy) / dzs
    inv_scale, row_off, width = _mip_scalars(spec, slope)
    h_lvl = width  # square face: level height == level width

    # affine face coords in MIP units: u = au*x + bu, v = av*y + bv
    au = focal * vsx / dzs * inv_scale
    bu = (-focal * cx / dzs + centre) * inv_scale
    av = focal * vsy / dzs * inv_scale
    bv = (-focal * cy / dzs + centre) * inv_scale

    dxl = (
        jax.lax.broadcasted_iota(jnp.float32, (1, 128), 1) * vsx - cx
    )  # per-chunk base added in the loop
    dyr = jax.lax.broadcasted_iota(jnp.float32, (8, 1), 0) * vsy - cy

    n_chunks = spec.size // 128
    x_chunks = x_dim // 128
    inv_short = jnp.float32(1.0 / SHORTMAX)

    def strip(i):
        y0 = i * 8
        y0f = y0.astype(jnp.float32)
        # window starts from the strip's first row (av >= 0 -> min at y0)
        vmin = jnp.floor(av * y0f + bv).astype(jnp.int32)
        ws_local = jnp.clip((vmin // 8) * 8, 0, h_lvl - 8)
        row_sl = pl.ds(pl.multiple_of(y0, 8), 8)
        dy = dyr + y0f * vsy  # [8,1] metres
        v_mip = jnp.rint(av * (y0f + jax.lax.broadcasted_iota(jnp.float32, (8, 1), 0)) + bv).astype(jnp.int32)
        v_ok = (v_mip >= 0) & (v_mip < h_lvl)

        for xc in range(x_chunks):
            x0 = xc * 128
            dx = dxl + jnp.float32(x0) * vsx  # [1,128] metres
            u_mip = jnp.rint(
                au * (jnp.float32(x0) + jax.lax.broadcasted_iota(jnp.float32, (1, 128), 1)) + bu
            ).astype(jnp.int32)
            u_ok = (u_mip >= 0) & (u_mip < width)
            u_cl = jnp.clip(jnp.broadcast_to(u_mip, (8, 128)), 0, spec.size - 1)

            ws_list, v_loc = [], []
            for k in range(_N_WINDOWS):
                ws = pl.multiple_of(row_off + ws_local + 8 * k, 8)
                ws_list.append(ws)
                v_loc.append(jnp.broadcast_to(v_mip - (ws_local + 8 * k), (8, 128)))
            r_obs, c_obs = _window_gather(
                range_ref, color_ref, ws_list, v_loc, u_cl, n_chunks
            )

            # cube-face cone: |dx|,|dy| <= dz (the +z face owns this voxel)
            cone = (jnp.abs(dx) <= dzs) & (jnp.abs(dy) <= dzs) & dz_ok
            valid = cone & jnp.broadcast_to(u_ok, (8, 128)) & v_ok & (r_obs > 0)

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

    n_strips = y_dim // 8

    def body(k, _):
        for s in range(unroll):
            strip(k * unroll + s)
        return 0

    jax.lax.fori_loop(0, n_strips // unroll, body, 0)


def integrate_warped(
    vol: TSDFVolume,
    depth_m: jnp.ndarray,
    color_rgb: jnp.ndarray,
    vol2cam: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    spec: FaceSpec | None = None,
    interpret: bool | None = None,
) -> TSDFVolume:
    """Fuse one frame via the face-warp + separable Pallas kernel.

    Covers voxels in the camera's +z cube-map cone (|d_x|,|d_y| <= d_z in
    volume coords) — the whole frustum whenever the camera looks within
    ~14 deg of the volume +z axis, the KinectFusion operating regime the
    reference's own volume placement assumes (kinectfusion.cpp:181-186).
    Voxels outside the cone keep their state for this frame (the
    axis-permuted sweeps that pick them up are tracked in DIVERGENCES.md).
    """
    if spec is None:
        spec = default_face_spec()
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Z, Y, X = vol.tsdf.shape
    assert Y % 8 == 0 and X % 128 == 0, (Y, X)

    face = build_face(depth_m, color_rgb, vol2cam, intr, spec)
    vsx, vsy, vsz = params.voxel_size
    prm = jnp.array(
        [
            face.centre[0],
            face.centre[1],
            face.centre[2],
            vsx,
            vsy,
            vsz,
            spec.focal,
            spec.centre,
            params.trunc_dist * 1000.0,
            float(params.tsdf_max_weight),
            0,
            0,
            0,
            0,
            0,
            0,
        ],
        jnp.float32,
    )

    col_i32 = jax.lax.bitcast_convert_type(vol.color, jnp.int32)
    kern = functools.partial(
        _kernel, spec=spec, y_dim=Y, x_dim=X, unroll=4 if Y % 32 == 0 else 1
    )
    slab = lambda s: pl.BlockSpec((1, Y, X), lambda z: (z, 0, 0))  # noqa: E731
    whole = pl.BlockSpec(
        (spec.stack_rows, spec.size), lambda z: (0, 0), memory_space=pltpu.VMEM
    )
    tsdf_n, weight_n, col_n = pl.pallas_call(
        kern,
        grid=(Z,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            whole,
            whole,
            slab(0),
            slab(1),
            slab(2),
        ],
        out_specs=[slab(0), slab(1), slab(2)],
        out_shape=[
            jax.ShapeDtypeStruct((Z, Y, X), jnp.int16),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.int16),
            jax.ShapeDtypeStruct((Z, Y, X), jnp.int32),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(prm, face.range_mm, face.color, vol.tsdf, vol.weight, col_i32)

    return TSDFVolume(
        tsdf=tsdf_n,
        weight=weight_n,
        color=jax.lax.bitcast_convert_type(col_n, jnp.uint32),
    )
