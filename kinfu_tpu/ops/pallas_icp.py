"""Pallas TPU kernel: ICP projective association + normal-equation build.

One Gauss-Newton iteration of point-to-plane ICP needs, per pixel: transform
the current vertex by the running increment, project it into the model view,
fetch the model vertex/normal THERE (a 6-channel random 2D gather —
rigid_icp.cu:58-63), gate, and accumulate the 27-term normal equations
(rigid_icp.cu:89-112). In plain XLA the gather costs ~7-13 ns/element
-> 14-38 ms per frame for the 19 iterations (tools/PERF_NOTES.md).

This kernel fuses the whole iteration: the model maps sit in VMEM, the
current maps stream through in 8-row blocks, the association gather runs on
the tilegather primitive (projective fields are near-identity, so the
straight-line fast path covers ~all tiles), and the Gram matrix G = E^T E of
the extended row vectors e = [s x n, n, n.(d - s), mask] accumulates into a
revisited [36*8, 128] output block — summed to 36 scalars by the caller.
A = G[:6,:6], b = G[:6,6], inlier count = G[7,7] (mask^2 == mask).

The 6x6 solve and the coarse-to-fine loop stay in jnp
(kinfu_tpu/tracking/icp.py); only the per-iteration gather+reduce moves
here. Invalid pixels project to their own coordinates (identity) so the
index field stays smooth and the fast gather path keeps covering the tile.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose
from kinfu_tpu.ops.tilegather import TileIndices, gather2d_multi

_N_TERMS = 36  # upper triangle of the 8x8 Gram matrix


def _pad_w(a: jnp.ndarray, wp: int) -> jnp.ndarray:
    h, w = a.shape[:2]
    if w == wp:
        return a
    return jnp.pad(a, ((0, 0), (0, wp - w)) + ((0, 0),) * (a.ndim - 2))


def _kernel(
    prm_ref,  # SMEM f32[20]: R(9), t(3), fx, fy, cx, cy, dist2, sin2, w, h
    cvx, cvy, cvz, cnx, cny, cnz,  # VMEM [8, Wp] current row-block
    pvx, pvy, pvz, pnx, pny, pnz,  # VMEM [Hp, Wp] model maps (whole)
    g_ref,  # VMEM [_N_TERMS * 8, 128] f32 out (revisited accumulator)
    *,
    wp: int,
    hp: int,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        g_ref[:] = jnp.zeros((_N_TERMS * 8, 128), jnp.float32)

    r = [prm_ref[k] for k in range(9)]
    t0, t1, t2 = prm_ref[9], prm_ref[10], prm_ref[11]
    fx, fy, cx, cy = prm_ref[12], prm_ref[13], prm_ref[14], prm_ref[15]
    dist2, sin2 = prm_ref[16], prm_ref[17]
    w_real = prm_ref[18]
    h_real = prm_ref[19]

    n_ch = wp // 128
    accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(_N_TERMS)]

    for ch in range(n_ch):
        sl = slice(ch * 128, (ch + 1) * 128)
        vx, vy, vz = cvx[:, sl], cvy[:, sl], cvz[:, sl]
        nx, ny, nz = cnx[:, sl], cny[:, sl], cnz[:, sl]
        ncur_ok = (nx != 0) | (ny != 0) | (nz != 0)

        # s = R v + t; n_c = R n
        sx = r[0] * vx + r[1] * vy + r[2] * vz + t0
        sy = r[3] * vx + r[4] * vy + r[5] * vz + t1
        sz = r[6] * vx + r[7] * vy + r[8] * vz + t2
        mx = r[0] * nx + r[1] * ny + r[2] * nz
        my = r[3] * nx + r[4] * ny + r[5] * nz
        mz = r[6] * nx + r[7] * ny + r[8] * nz

        zok = sz > 0
        zs = jnp.where(zok, sz, 1.0)
        uf = sx / zs * fx + cx
        vf = sy / zs * fy + cy
        uI = jnp.rint(uf).astype(jnp.int32)
        vI = jnp.rint(vf).astype(jnp.int32)
        inb = (
            zok
            & (uI >= 0)
            & (uI.astype(jnp.float32) < w_real)
            & (vI >= 0)
            & (vI.astype(jnp.float32) < h_real)
            & ncur_ok
        )
        # invalid pixels look up their own coordinates: keeps the index
        # field smooth so the fast gather path covers the tile
        own_u = ch * 128 + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        own_v = i * 8 + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        uI = jnp.clip(jnp.where(inb, uI, own_u), 0, wp - 1)
        vI = jnp.clip(jnp.where(inb, vI, own_v), 0, hp - 1)

        idx = TileIndices(vI, uI, n_chunks=n_ch)
        dx, dy, dz, qx, qy, qz = gather2d_multi(
            (pvx, pvy, pvz, pnx, pny, pnz),
            idx,
            jnp.float32,
            n_windows=2,
            n_d=3,
        )

        npre_ok = (qx != 0) | (qy != 0) | (qz != 0)
        ex, ey, ez = sx - dx, sy - dy, sz - dz
        d2 = ex * ex + ey * ey + ez * ez
        # || n_c x q ||^2 <= sin^2 * ||n_c||^2 * ||q||^2 (unit normals)
        crx = my * qz - mz * qy
        cry = mz * qx - mx * qz
        crz = mx * qy - my * qx
        s2 = crx * crx + cry * cry + crz * crz
        mask = inb & npre_ok & (d2 <= dist2) & (s2 <= sin2)
        mf = mask.astype(jnp.float32)

        # e = [s x q, q, q.(d - s), 1] * mask
        e0 = (sy * qz - sz * qy) * mf
        e1 = (sz * qx - sx * qz) * mf
        e2 = (sx * qy - sy * qx) * mf
        e3 = qx * mf
        e4 = qy * mf
        e5 = qz * mf
        e6 = -(qx * ex + qy * ey + qz * ez) * mf
        e = (e0, e1, e2, e3, e4, e5, e6, mf)

        k = 0
        for a in range(8):
            for bb in range(a, 8):
                accs[k] = accs[k] + e[a] * e[bb]
                k += 1

    for k in range(_N_TERMS):
        rs = slice(k * 8, (k + 1) * 8)
        g_ref[rs, :] = g_ref[rs, :] + accs[k]


def icp_normal_eqs_warped(
    inc: Pose,
    cur_vmap: jnp.ndarray,
    cur_nmap: jnp.ndarray,
    pre_vmap: jnp.ndarray,
    pre_nmap: jnp.ndarray,
    intr: Intrinsics,
    dist_thres: float,
    sin_angle_thres: float,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in Pallas replacement for tracking.icp._normal_equations:
    returns (A [6,6], b [6], inlier_count).

    cur maps may be a ROW-SHARD of the image (fewer rows than the model
    maps — the distributed psum reduction, parallel/sharded.py); bounds and
    the association gather always use the full model dimensions."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w, _ = pre_vmap.shape
    hc = cur_vmap.shape[0]
    hp = (h + 7) & ~7
    hcp = (hc + 7) & ~7
    wp = (w + 127) & ~127

    R, t = inc
    prm = jnp.concatenate(
        [
            R.reshape(-1).astype(jnp.float32),
            t.astype(jnp.float32),
            jnp.array(
                [
                    intr.fx,
                    intr.fy,
                    intr.cx,
                    intr.cy,
                    dist_thres * dist_thres,
                    sin_angle_thres * sin_angle_thres,
                    float(w),
                    float(h),
                ],
                jnp.float32,
            ),
        ]
    )

    def chans(m, rows):
        mp = jnp.pad(m, ((0, rows - m.shape[0]), (0, wp - m.shape[1]), (0, 0)))
        return [mp[..., k] for k in range(3)]

    cur = chans(cur_vmap, hcp) + chans(cur_nmap, hcp)
    pre = chans(pre_vmap, hp) + chans(pre_nmap, hp)

    kern = functools.partial(_kernel, wp=wp, hp=hp)
    row = pl.BlockSpec((8, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    whole = pl.BlockSpec((hp, wp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    gout = pl.BlockSpec(
        (_N_TERMS * 8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    g = pl.pallas_call(
        kern,
        grid=(hcp // 8,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [row] * 6
        + [whole] * 6,
        out_specs=gout,
        out_shape=jax.ShapeDtypeStruct((_N_TERMS * 8, 128), jnp.float32),
        interpret=interpret,
    )(prm, *cur, *pre)

    g36 = g.reshape(_N_TERMS, 8 * 128).sum(axis=1)
    G = jnp.zeros((8, 8), jnp.float32)
    k = 0
    for a in range(8):
        for bb in range(a, 8):
            G = G.at[a, bb].set(g36[k])
            k += 1
    A = G[:6, :6] + jnp.triu(G[:6, :6], 1).T
    b = G[:6, 6]
    ninl = G[7, 7].astype(jnp.int32)
    return A, b, ninl
