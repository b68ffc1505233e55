"""Mesh-sharded pipeline: Z-sharded volume, psum ICP, halo-exchange raycast.

Decomposition (no reference equivalent — the reference is single-GPU;
SURVEY.md section 2 parallelism call-out):

  - **integrate**: embarrassingly parallel — each shard fuses its own
    Z-slab of voxels against the (replicated, ~1 MB) depth/color images,
    offsetting voxel positions by its slab origin. Zero communication.
  - **raycast**: each shard marches only the t-interval where the ray's z
    lies inside its slab (on the *global* sample grid, so crossings are
    bit-identical to single-chip), using a 2-voxel halo obtained via two
    `ppermute`s so crossings/trilinear gradients straddling the boundary
    resolve locally. Hits composite with a `pmin` over the mesh (first hit
    along the ray wins; a closer backface cancels, preserving the
    reference's early-break semantics, tsdf_volume.cu:242-244); the winning
    shard shades, a masked `psum` broadcasts the result.
  - **ICP**: image rows shard across the mesh, each shard reduces its
    partial 6x6 normal equations, one `psum` finishes the reduction
    (the ICI equivalent of rigid_icp.cu:115-132), and every device solves
    the same 6x6 system — the pose stays replicated by construction.

All collectives ride the mesh axis "z" (ICI on a TPU slice); the host never
sees a voxel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.frontend.maps import build_measurement_pyramid, resize_points_normals
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import (
    Pose,
    compose,
    identity_pose,
    inverse,
    pose_matrix,
)
from kinfu_tpu.parallel.mesh import VOLUME_AXIS, volume_sharding
from kinfu_tpu.pipeline.kinfu import _model_pyramid, _volume_pose
from kinfu_tpu.pipeline.state import KinFuState, StepOutput
from kinfu_tpu.tracking.icp import rigid_icp
from kinfu_tpu.volume.integrate import integrate
from kinfu_tpu.volume.raycast import camera_rays, march, ray_aabb, shade, _INF
from kinfu_tpu.volume.tsdf import TSDFVolume, reset_volume

HALO = 3  # voxel rows: march samples reach +-2.5 rows past the owned slab
# (one step each side of a boundary crossing + rint), trilinear gradient
# +-1.5 — 3 covers the worst case at |dir_z| = 1.


def halo_exchange_z(
    x: jnp.ndarray,
    axis_name: str = VOLUME_AXIS,
    halo: int = HALO,
    dim: int = 0,
):
    """Pad a local slab with `halo` rows from each mesh neighbour along
    array dim `dim` (0 = volume Z, the default sharding; 1 = volume Y).

    Boundary shards receive zero rows (outside the global volume these are
    never sampled — the 1-voxel global border rule masks them)."""
    n = jax.lax.axis_size(axis_name)
    L = x.shape[dim]
    last = jax.lax.slice_in_dim(x, L - halo, L, axis=dim)
    first = jax.lax.slice_in_dim(x, 0, halo, axis=dim)
    below = jax.lax.ppermute(  # my last rows -> next shard's leading halo
        last, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    above = jax.lax.ppermute(  # my first rows -> previous shard's trailing halo
        first, axis_name, perm=[(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([below, x, above], axis=dim)


def _local_t_interval(org_z, dir_z, z_lo, z_hi, t_start, t_end, step):
    """Restrict the global march interval to where the ray's z coordinate is
    inside [z_lo, z_hi), *snapped to the global sample grid* so the sharded
    march visits exactly the same sample points as the single-chip one."""
    dz_safe = jnp.where(jnp.abs(dir_z) < 1e-12, 1e-12, dir_z)
    ta = (z_lo - org_z) / dz_safe
    tb = (z_hi - org_z) / dz_safe
    t_in = jnp.minimum(ta, tb)
    t_out = jnp.maximum(ta, tb)
    # near-horizontal rays: entirely inside or outside the slab
    horiz = jnp.abs(dir_z) < 1e-12
    inside = (org_z >= z_lo) & (org_z < z_hi)
    t_in = jnp.where(horiz, jnp.where(inside, t_start, _INF), t_in)
    t_out = jnp.where(horiz, jnp.where(inside, t_end, -_INF), t_out)

    # one-step overlap each side; duplicates resolve identically via pmin
    lo = jnp.maximum(t_start, t_in - 2 * step)
    hi = jnp.minimum(t_end, t_out + 2 * step)
    # snap to the global grid t_start + k*step: return the integer offset so
    # the marcher computes t = t_start + k*step with the SAME fp rounding as
    # the single-device march (bit-identical sample positions)
    k = jnp.ceil(jnp.maximum(lo - t_start, 0.0) / step).astype(jnp.int32)
    return k, hi


def sharded_raycast(
    tsdf_local: jnp.ndarray,
    cam2vol: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    axis_name: str = VOLUME_AXIS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raycast over a Z-sharded volume; returns replicated camera-frame
    vertex/normal maps. Call inside shard_map."""
    Zl, Y, X = tsdf_local.shape
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    Zg = Zl * n
    vsx, vsy, vsz = params.voxel_size
    step = params.raycast_step_voxels * vsx
    inv_vs = jnp.array([1.0 / vsx, 1.0 / vsy, 1.0 / vsz], dtype=jnp.float32)

    padded = halo_exchange_z(tsdf_local, axis_name)
    z0 = idx * Zl
    z0h = z0 - HALO

    org, dirs = camera_rays(cam2vol, intr)
    box_max = jnp.array(params.volume_range, dtype=jnp.float32)
    tnear, tfar = ray_aabb(org, dirs, box_max)
    t_start = jnp.maximum(tnear, 0.0) + step

    z_lo = z0.astype(jnp.float32) * vsz
    z_hi = (z0 + Zl).astype(jnp.float32) * vsz
    k_lo, t_hi = _local_t_interval(org[2], dirs[..., 2], z_lo, z_hi, t_start, tfar, step)

    res = march(
        padded, (Zg, Y, X), z0h, org, dirs, t_start, t_hi, step, inv_vs, k_start=k_lo
    )

    # composite: earliest hit / earliest backface across shards
    hit_t = jax.lax.pmin(res.hit_t, axis_name)
    back_t = jax.lax.pmin(res.back_t, axis_name)
    hit = (hit_t < back_t) & (hit_t < _INF)

    # unique winner: the shard whose slab contains the hit's z coordinate
    # (intervals overlap by 2 steps, so neighbours may detect the same
    # crossing at the identical grid t — ownership dedupes the psum)
    hit_z = org[2] + dirs[..., 2] * hit_t
    owned = (hit_z >= z_lo) & (hit_z < z_hi)
    # global-boundary hits (z outside every half-open slab) fall to shard 0/n-1
    owned = owned | ((idx == 0) & (hit_z < 0.0)) | (
        (idx == n - 1) & (hit_z >= vsz * Zg)
    )
    mine = hit & (res.hit_t <= hit_t) & owned
    winner = jax.lax.pmin(jnp.where(mine, idx, n), axis_name)
    i_shade = mine & (winner == idx)

    vertex, nrm, valid = shade(
        padded, (Zg, Y, X), z0h, org, dirs, hit_t, i_shade, params.voxel_size
    )
    R, _ = cam2vol
    Rinv = R.T
    vcam = jnp.einsum("ij,hwj->hwi", Rinv, vertex - org[None, None, :])
    ncam = jnp.einsum("ij,hwj->hwi", Rinv, nrm)
    mask = (valid & i_shade).astype(jnp.float32)[..., None]
    vout = jax.lax.psum(vcam * mask, axis_name)
    nout = jax.lax.psum(ncam * mask, axis_name)
    return vout, nout


#: halo rows for the warped (plane-sweep) raycast: one 8-row block each
#: side covers the <=~4.3-row sample drift between consecutive planes plus
#: rounding, and keeps window starts 8-aligned
HALO8 = 8


def _ray_face_local(
    a,
    frame,
    padded: jnp.ndarray,
    cam2vol: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    spec,
    interpret: bool,
    Lg: int,
    Ll: int,
    off0,
    axis_name: str,
    shard_dim: int = 0,
):
    """One cube-face plane-sweep raycast pass over a halo-padded shard
    (sharded along array dim `shard_dim`), min-composited over the mesh;
    accumulates into `a` = (vertex, normal, valid) in VOLUME coordinates.
    Runs the SAME Pallas sweep kernel as the single-chip warped raycast
    (ops/pallas_raycast.py) — the kernel takes the shard's global
    plane/row offsets as traced scalars. Shading / resample run replicated
    on every device. Call inside shard_map."""
    from kinfu_tpu.ops.pallas_raycast import (
        _face_fields,
        _prime_geometry,
        _resample_face,
        _sweep_face_rays,
    )

    R, tt = cam2vol
    org = tt

    D, off, vs_p = _prime_geometry(frame, params)
    org_p = D @ org + off
    prim = jnp.transpose(padded, frame.axes)
    if frame.flip:
        prim = jnp.flip(prim, axis=0)
    # primed GLOBAL dims: the sharded natural dim has global extent Lg;
    # the other two match the (unpadded there) local buffer
    nat_g = tuple(
        Lg if i == shard_dim else padded.shape[i] for i in range(3)
    )
    dims_g = tuple(nat_g[ax] for ax in frame.axes)

    # which primed axis carries the sharded natural dim? (face_frames
    # guarantees plane or row, never lanes, for the shard_dim in use)
    pos = frame.axes.index(shard_dim)
    if pos == 0:  # plane-sharded (sweep axis == shard axis)
        if frame.flip:
            plane0 = Lg - (off0 + Ll + HALO8)
        else:
            plane0 = off0 - HALO8
        row0 = jnp.asarray(0, jnp.int32)
    else:  # row-sharded; flip acts on the plane axis
        assert pos == 1, (frame.name, shard_dim)
        plane0 = jnp.asarray(0, jnp.int32)
        row0 = off0 - HALO8

    hit, back = _sweep_face_rays(
        prim, org_p, vs_p, spec, interpret,
        dims_global=dims_g, plane0=plane0, row0=row0,
    )
    hit = jax.lax.pmin(hit, axis_name)
    back = jax.lax.pmin(back, axis_name)

    t_f, n_f, _ = _face_fields(hit, back, org_p, spec)
    A = D @ R
    t_cam, n_cam_p = _resample_face(t_f, n_f, A, intr, spec, interpret)

    rays = intr.pixel_rays()
    d_p = jnp.einsum("ij,hwj->hwi", A, rays)
    adx, ady, dz = jnp.abs(d_p[..., 0]), jnp.abs(d_p[..., 1]), d_p[..., 2]
    own_x = (adx < dz) if frame.gt_x else (adx <= dz)
    own_y = (ady < dz) if frame.gt_y else (ady <= dz)
    own = (dz > 0) & own_x & own_y

    ok = t_cam < _INF
    # clamp-then-multiply masking (finite operands) — select-with-zero
    # miscompiles next to the dispatch switch (pallas_raycast._face_fields)
    tsafe = jnp.minimum(t_cam, jnp.float32(1e30)) * ok.astype(jnp.float32)
    p_p = org_p[None, None, :] + d_p / jnp.maximum(dz, 1e-9)[
        ..., None
    ] * tsafe[..., None]
    p_v = jnp.einsum("ji,hwj->hwi", D, p_p - off[None, None, :])
    n_v = jnp.einsum("ji,hwj->hwi", D, n_cam_p)
    m = (own & ok).astype(jnp.float32)[..., None]
    nz = jnp.any(jnp.abs(n_v) > 0, axis=-1)
    return (
        p_v * m + a[0] * (1.0 - m),
        n_v * m + a[1] * (1.0 - m),
        (own & ok & nz) | a[2],
    )


def sharded_raycast_warped(
    tsdf_local: jnp.ndarray,
    cam2vol: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    axis_name: str = VOLUME_AXIS,
    interpret: bool | None = None,
    shard_dim: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cube-face plane-sweep raycast over a mesh-sharded volume (sharded
    along array dim `shard_dim`: 0 = volume Z, 1 = volume Y).

    Per-face sweeps run on each shard's halo-padded slab and min-composite
    (hit_t, back_t) across the mesh with a pmin (events duplicated in the
    8-row halos land on the same global grid, so the composite is exact) —
    see _ray_face_local. Call inside shard_map."""
    from kinfu_tpu.ops.facewarp import face_frames
    from kinfu_tpu.ops.pallas_raycast import RaySpec, _faces_needed

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    size, focal = params.raycast_face
    spec = RaySpec(size=int(size), focal=float(focal))
    h, w = intr.height, intr.width
    R, tt = cam2vol
    org = tt

    Ll = tsdf_local.shape[shard_dim]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    Lg = Ll * n
    off0 = idx * Ll
    padded = halo_exchange_z(tsdf_local, axis_name, halo=HALO8, dim=shard_dim)

    acc = (
        jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((h, w), jnp.bool_),
    )

    def run_face(a, frame):
        return _ray_face_local(
            a, frame, padded, cam2vol, intr, params, spec, interpret,
            Lg, Ll, off0, axis_name, shard_dim,
        )

    flags = _faces_needed(cam2vol, intr)
    frames_all = list(face_frames(shard_dim or None))
    # single-face switch dispatch (same rationale as raycast_warped: the
    # cond chain stages the volume operand ~15 ms/frame at 512^3)
    flag_vec = jnp.stack([flags[fr.name] for fr in frames_all])
    nset = jnp.sum(flag_vec.astype(jnp.int32))
    code = jnp.where(nset == 1, jnp.argmax(flag_vec), len(frames_all))

    def single(fr):
        return lambda a: run_face(a, fr)

    def chain(a):
        for fr in frames_all:
            a = jax.lax.cond(
                flags[fr.name],
                lambda x, f=fr: run_face(x, f),
                lambda x: x,
                a,
            )
        return a

    acc = jax.lax.switch(
        code, [single(fr) for fr in frames_all] + [chain], acc
    )

    vertex, normal, valid = acc
    Rinv = R.T
    vcam = jnp.einsum("ij,hwj->hwi", Rinv, vertex - org[None, None, :])
    ncam = jnp.einsum("ij,hwj->hwi", Rinv, normal)
    mask = valid.astype(jnp.float32)[..., None]
    return vcam * mask, ncam * mask


def fused_supported_local(
    local_shape: Tuple[int, int, int],
    n_devices: int,
    params: KinFuParams,
    shard_dim: int = 0,
) -> bool:
    """True when the sharded fused one-switch update can serve this
    configuration (mirrors ops.fused_step.fused_supported: both warped
    kernels eligible on the GLOBAL dims, plus the shard-local tiling)."""
    from kinfu_tpu.ops.facewarp import warp_dims_ok

    if params.fused_mode == "off":
        return False
    global_shape = tuple(
        s * n_devices if i == shard_dim else s
        for i, s in enumerate(local_shape)
    )
    modes_ok = params.integrate_mode in ("auto", "warped") and (
        params.raycast_mode in ("auto", "warped")
    )
    sd = shard_dim or None
    ok = (
        modes_ok
        and warp_dims_ok(global_shape, sd)
        and warp_dims_ok(local_shape, sd)
    )
    if params.fused_mode == "on":  # force (interpret-mode Pallas off-TPU)
        return ok
    return ok and jax.default_backend() == "tpu"


def fused_update_local(
    vol: TSDFVolume,
    depth_m: jnp.ndarray,
    color_rgb: jnp.ndarray,
    vol2cam: Pose,
    cam2vol: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    good: jnp.ndarray,
    z_offset,
    axis_name: str = VOLUME_AXIS,
    interpret: bool | None = None,
    aux=None,
    shard_dim: int = 0,
):
    """Sharded one-switch volume update (per-device; call inside shard_map).

    The Z-shard's integrate sweep, halo exchange, raycast sweep and the
    tracking-failure reset all ride ONE lax.switch, exactly like the
    single-chip ops.fused_step.fused_update — XLA stages every conditional
    layer's operands/results through fresh buffers, so each extra layer
    wrapping the volume shard costs full-shard copies. The fusion and
    raycast face sets are identical (both depend only on the replicated
    rotation — the per-shard z-offset shifts only the translation), so
    every device takes the SAME branch and the collectives inside
    (ppermute halos, pmin composite) stay mesh-consistent.

    Returns (vol', vmap, nmap, aux') — replicated camera-frame raycast
    prediction, zeros + reset volume on the failure branch
    (kinectfusion.cpp:97-102 semantics). `aux` is threaded through the
    switch untouched: route every array needed after the switch here, not
    through a closure (XLA:TPU clobbers buffers merely live across the
    switch — ops.fused_step.fused_update docstring)."""
    from kinfu_tpu.ops.facewarp import default_face_spec, face_frames
    from kinfu_tpu.ops.pallas_integrate import _sweep_face, faces_needed
    from kinfu_tpu.ops.pallas_raycast import RaySpec

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    size, focal = params.raycast_face
    rspec = RaySpec(size=int(size), focal=float(focal))
    h, w = intr.height, intr.width
    R, tt = cam2vol
    # sanitize a possibly-NaN failed pose (see ops.fused_step.fused_update)
    R = jnp.where(jnp.isfinite(R), R, jnp.eye(3, dtype=R.dtype))
    org = jnp.where(jnp.isfinite(tt), tt, 0.0)

    Ll = vol.tsdf.shape[shard_dim]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    Lg = Ll * n
    off0 = idx * Ll

    # fold the shard origin into the integrate pose so the local sweep is
    # exactly the global one (volume/integrate.py z_offset rationale);
    # natural array dim 0 = volume z (xyz axis 2), dim 1 = volume y
    xyz_axis = 2 - shard_dim
    zoff_m = (
        jnp.asarray(z_offset, jnp.float32) * params.voxel_size[xyz_axis]
    )
    Ri, ti = vol2cam
    vol2cam_local = Pose(Ri, ti + Ri[:, xyz_axis] * zoff_m)

    frames = list(face_frames(shard_dim or None))
    col_i32 = vol.color  # int32 packed RGB (volume/tsdf.py)

    def sweep(arrays, fr):
        return _sweep_face(
            *arrays,
            fr,
            depth_m=depth_m,
            color_rgb=color_rgb,
            vol2cam=vol2cam_local,
            intr=intr,
            params=params,
            spec=default_face_spec(),
            interpret=interpret,
        )

    acc0 = (
        jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((h, w), jnp.bool_),
    )

    def ray_face(acc, padded, fr):
        return _ray_face_local(
            acc, fr, padded, cam2vol, intr, params, rspec, interpret,
            Lg, Ll, off0, axis_name, shard_dim,
        )

    flags = faces_needed(vol2cam, intr)  # rotation-only: same on every shard
    flag_vec = jnp.stack([flags[fr.name] for fr in frames])
    nset = jnp.sum(flag_vec.astype(jnp.int32))
    code = jnp.where(nset == 1, jnp.argmax(flag_vec), len(frames))
    code = jnp.where(good, code, len(frames) + 1)

    # pin_natural anchors every branch's volume outputs to the row-major
    # layout — see ops/fused_step.py / ops/layout_pin.py (conditional
    # result layouts are shared across branches; the transposing face
    # branches otherwise tax the hot branch with relayout copies)
    from kinfu_tpu.ops.layout_pin import pin_natural

    def single(fr):
        def branch(a):
            t, wgt, c = sweep((a[0], a[1], a[2]), fr)
            padded = halo_exchange_z(t, axis_name, halo=HALO8, dim=shard_dim)
            acc = ray_face(acc0, padded, fr)
            return *pin_natural(t, wgt, c), *acc, a[3]

        return branch

    def chain(a):
        arrs = (a[0], a[1], a[2])
        for fr in frames:
            arrs = jax.lax.cond(
                flags[fr.name],
                lambda x, f=fr: sweep(x, f),
                lambda x: x,
                arrs,
            )
        padded = halo_exchange_z(arrs[0], axis_name, halo=HALO8, dim=shard_dim)
        acc = acc0
        for fr in frames:
            acc = jax.lax.cond(
                flags[fr.name],
                lambda x, f=fr: ray_face(x, padded, f),
                lambda x: x,
                acc,
            )
        return (*pin_natural(*arrs), *acc, a[3])

    def fail(a):
        # kinectfusion.cpp:97-102 reset; collective-free is consistent
        # because every device takes this same branch (code is replicated)
        return (
            *pin_natural(
                jnp.zeros_like(a[0]),
                jnp.zeros_like(a[1]),
                jnp.zeros_like(a[2]),
            ),
            *acc0,
            a[3],
        )

    outs = jax.lax.switch(
        code,
        [single(fr) for fr in frames] + [chain, fail],
        (vol.tsdf, vol.weight, col_i32, aux),
    )
    tsdf_n, weight_n, col_n, vertex, normal, valid, aux_out = outs

    # multiply-mask epilogue (NOT jnp.where) — see the XLA:TPU miscompile
    # note in ops.fused_step.fused_update
    Rinv = R.T
    vcam = jnp.einsum("ij,hwj->hwi", Rinv, vertex - org[None, None, :])
    ncam = jnp.einsum("ij,hwj->hwi", Rinv, normal)
    valid_f = valid.astype(jnp.float32)[..., None]
    vol_n = TSDFVolume(tsdf=tsdf_n, weight=weight_n, color=col_n)
    return vol_n, vcam * valid_f, ncam * valid_f, aux_out


def _row_shard(img: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Slice this device's block of image rows (for the ICP psum reduce).

    Rows are zero-padded up to a multiple of the axis size first — zero
    rows have zero normals, which the ICP correspondence mask rejects, so
    padding never contributes to the reduction. (Without the pad, `h // n`
    would silently DROP the remainder rows from the sharded reduction and
    the sharded pose would diverge from single-device.)"""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    rows = -(-img.shape[0] // n)
    pad = rows * n - img.shape[0]
    if pad:
        img = jnp.pad(img, ((0, pad),) + ((0, 0),) * (img.ndim - 1))
    return jax.lax.dynamic_slice_in_dim(img, idx * rows, rows, axis=0)


def kinfu_step_local(
    state: KinFuState,
    depth_mm: jnp.ndarray,
    color_rgb: jnp.ndarray,
    params: KinFuParams,
    intr: Intrinsics,
    axis_name: str = VOLUME_AXIS,
    shard_dim: int = 0,
) -> Tuple[KinFuState, StepOutput]:
    """Per-device body of the sharded per-frame step (mirrors
    pipeline.kinfu.kinfu_step; runs inside shard_map). `shard_dim` selects
    the sharded volume array dim: 0 = Z (default), 1 = Y — Y-sharding
    balances the surface band across shards for any camera whose view
    axis is not near volume Y (the Z-sharded layout concentrates the band
    in few Z-slabs, capping scaling efficiency — tools/PERF_NOTES.md
    1024^3 north-star)."""
    vol_pose = _volume_pose(params)
    Ll = state.vol.tsdf.shape[shard_dim]
    z_offset = jax.lax.axis_index(axis_name) * Ll

    dmaps, vmaps, nmaps = build_measurement_pyramid(
        depth_mm,
        intr,
        pyramid_height=params.pyramid_height,
        bfilter_kernel_size=params.bfilter_kernel_size,
        bfilter_color_sigma=params.bfilter_color_sigma,
        bfilter_spatial_sigma=params.bfilter_spatial_sigma,
        depth_scale=params.depth_scale,
        max_dist=params.dfilter_dist,
        normal_disc_threshold=params.normal_disc_threshold,
    )

    # Same single-conditional structure as pipeline.kinfu.kinfu_step (see
    # its structure note): the volume shard passes through exactly ONE
    # lax.cond; ICP runs every frame (zero model maps on frame 1 are
    # rejected by the correspondence mask) and small selects handle the
    # bootstrap special cases.
    is_first = state.frame_count == 1
    cur_v = [_row_shard(v, axis_name) for v in vmaps]
    cur_n = [_row_shard(n, axis_name) for n in nmaps]
    icp = rigid_icp(
        cur_v,
        cur_n,
        state.model_vmaps,
        state.model_nmaps,
        intr,
        params,
        axis_name=axis_name,
    )
    good = (icp.ok & ~is_first) | is_first

    tracked_pose = compose(state.pose, icp.pose)
    new_pose = jax.tree.map(
        lambda a, b: jnp.where(is_first, a, b), state.pose, tracked_pose
    )

    vol2cam = compose(inverse(new_pose), vol_pose)
    cam2vol = compose(inverse(vol_pose), new_pose)
    if fused_supported_local(
        state.vol.tsdf.shape, jax.lax.axis_size(axis_name), params, shard_dim
    ):
        # integrate + halo exchange + raycast + failure reset in ONE
        # lax.switch — the volume shard crosses a single conditional
        # boundary (see fused_update_local); post-switch consumers thread
        # through `aux`
        vol_n, rv, rn, aux = fused_update_local(
            state.vol,
            dmaps[0],
            color_rgb,
            vol2cam,
            cam2vol,
            intr,
            params,
            good,
            z_offset,
            axis_name,
            aux=(tuple(vmaps), tuple(nmaps)),
            shard_dim=shard_dim,
        )
        vmaps_t, nmaps_t = aux
        mv, mn = _model_pyramid(rv, rn, params.pyramid_height)
        mv = tuple(jnp.where(is_first, a, b) for a, b in zip(vmaps_t, mv))
        mn = tuple(jnp.where(is_first, a, b) for a, b in zip(nmaps_t, mn))
    else:

        def fuse(vol):
            vol = integrate(
                vol, dmaps[0], color_rgb, vol2cam, intr, params,
                z_offset=z_offset, shard_dim=shard_dim,
            )
            from kinfu_tpu.ops.facewarp import warp_dims_ok

            nn = jax.lax.axis_size(axis_name)
            gshape = tuple(
                s * nn if i == shard_dim else s
                for i, s in enumerate(vol.tsdf.shape)
            )
            warp_ok = (
                warp_dims_ok(gshape, shard_dim or None)
                and vol.tsdf.shape[shard_dim] % 8 == 0
            )
            mode = params.raycast_mode
            if mode == "auto":
                mode = (
                    "warped"
                    if jax.default_backend() == "tpu" and warp_ok
                    else "step"
                )
            if mode == "warped" and warp_ok:
                rv, rn = sharded_raycast_warped(
                    vol.tsdf, cam2vol, intr, params, axis_name,
                    shard_dim=shard_dim,
                )
            else:
                if shard_dim != 0:
                    raise NotImplementedError(
                        "Y-sharding requires the warped raycast path "
                        "(volume dims must satisfy warp_dims_ok)"
                    )
                rv, rn = sharded_raycast(
                    vol.tsdf, cam2vol, intr, params, axis_name
                )
            mv, mn = _model_pyramid(rv, rn, params.pyramid_height)
            mv = tuple(jnp.where(is_first, a, b) for a, b in zip(vmaps, mv))
            mn = tuple(jnp.where(is_first, a, b) for a, b in zip(nmaps, mn))
            return vol, mv, mn

        def fail(vol):
            return (
                reset_volume(vol),
                tuple(jnp.zeros_like(v) for v in state.model_vmaps),
                tuple(jnp.zeros_like(n) for n in state.model_nmaps),
            )

        vol_n, mv, mn = jax.lax.cond(good, fuse, fail, state.vol)

    pose_n = jax.tree.map(
        lambda a, b: jnp.where(good, a, b), new_pose, identity_pose()
    )
    fc_n = jnp.where(
        good,
        jnp.where(is_first, 2, state.frame_count + 1),
        jnp.asarray(1, jnp.int32),
    )
    new_state = KinFuState(
        vol=vol_n,
        pose=pose_n,
        model_vmaps=mv,
        model_nmaps=mn,
        frame_count=fc_n,
    )
    out = StepOutput(
        pose_matrix=pose_matrix(pose_n),
        tracking_ok=good,
        icp_inliers=jnp.where(is_first, 0, icp.num_inliers),
    )
    return new_state, out


def _state_specs(params: KinFuParams, shard_dim: int = 0) -> KinFuState:
    spec = [None, None, None]
    spec[shard_dim] = VOLUME_AXIS
    vol_p = P(*spec)
    vol_spec = TSDFVolume(tsdf=vol_p, weight=vol_p, color=vol_p)
    return KinFuState(
        vol=vol_spec,
        pose=Pose(P(), P()),
        model_vmaps=tuple(P() for _ in range(params.pyramid_height)),
        model_nmaps=tuple(P() for _ in range(params.pyramid_height)),
        frame_count=P(),
    )


def make_sharded_step_fn(
    params: KinFuParams, intr: Intrinsics, mesh: Mesh, shard_dim: int = 0
):
    """Jitted mesh-sharded per-frame step with donated volume state.

    `shard_dim`: 0 shards the volume along Z (default), 1 along Y — see
    kinfu_step_local for the load-balance rationale."""
    state_spec = _state_specs(params, shard_dim)
    out_spec = StepOutput(pose_matrix=P(), tracking_ok=P(), icp_inliers=P())

    body = functools.partial(
        kinfu_step_local, params=params, intr=intr, shard_dim=shard_dim
    )
    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(state_spec, P(), P()),
        out_specs=(state_spec, out_spec),
        check_rep=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def shard_state(
    state: KinFuState, mesh: Mesh, shard_dim: int = 0
) -> KinFuState:
    """Place a host-built state onto the mesh (volume sharded along
    `shard_dim`, rest replicated)."""
    vs = volume_sharding(mesh, shard_dim)
    rep = NamedSharding(mesh, P())
    vol = jax.tree.map(lambda x: jax.device_put(x, vs), state.vol)
    rest = jax.tree.map(
        lambda x: jax.device_put(x, rep), state._replace(vol=None)
    )
    return rest._replace(vol=vol)
