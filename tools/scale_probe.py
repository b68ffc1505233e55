"""1024^3 scaling evidence: per-shard warped-kernel cost at north-star
shard shapes (BASELINE.md: >= 0.7 scaling efficiency for a sharded 1024^3
volume at 4 hosts).

Multi-chip hardware is not reachable from this host, so the methodology is:
measure the PER-SHARD Pallas kernel time on one chip at the exact slab
shape each mesh size would own, plus the fixed (shard-count-independent)
costs, and project efficiency as

    eff(n) = T1 / (n * Tn),   Tn = compute(slab_n) + fixed + collectives

where collectives are bounded analytically from payload bytes / ICI
bandwidth (halo: 2x8 rows of [1024,1024] int16 each way; composite: pmin
over two [face,face] f32 fields; both << 1 ms on v5e ICI) — the same
bound-from-payload method the scaling-book recipe uses for its roofline.

    python tools/scale_probe.py --xy 1024 --shards 1,8,32 [--iters 4]

Writes one JSON line per shard count; PERF_NOTES.md records the round's
results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xy", type=int, default=1024)
    ap.add_argument("--z", type=int, default=1024, help="global Z dim")
    ap.add_argument("--shards", type=str, default="8,32")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument(
        "--no-ray", action="store_true",
        help="skip the raycast sweep (its (8, rows, XY) block exceeds "
        "scoped VMEM when the primed row dim is >= 512 at XY=1024 — the "
        "unsharded volume; needs the DMA-tile rewrite, see PERF_NOTES)",
    )
    ap.add_argument(
        "--axis", choices=("z", "y"), default="z",
        help="shard axis: z = per-shard Z-slab (r4 method; surface band "
        "concentrates in few shards), y = per-shard Y-stripe "
        "(parallel/sharded.py shard_dim=1 — band spans all shards for any "
        "camera not looking along Y, and a +z-looking raycast becomes "
        "ROW-sharded, fitting VMEM where Z-sharding's plane-sharded "
        "orientation blew the scoped budget)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/kinfu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from kinfu_tpu.config import KinFuParams
    from kinfu_tpu.data.synthetic import default_test_scene
    from kinfu_tpu.geometry.intrinsics import Intrinsics
    from kinfu_tpu.geometry.se3 import Pose, compose, identity_pose, inverse, pose_from_matrix
    from kinfu_tpu.ops.facewarp import face_frames
    from kinfu_tpu.ops.pallas_integrate import _sweep_face
    from kinfu_tpu.ops.pallas_raycast import RaySpec, _sweep_face_rays, _prime_geometry
    from kinfu_tpu.ops.facewarp import default_face_spec

    XY = args.xy
    Zg = args.z
    params = KinFuParams(
        volume_dims=(XY, XY, Zg),
        volume_range=(3.0 * XY / 512, 3.0 * XY / 512, 3.0 * Zg / 512),
    )
    intr = Intrinsics(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(np.eye(4, dtype=np.float32), intr)
    depth_m = jnp.asarray(depth_raw) * params.depth_scale
    color = jnp.asarray(color)
    vol_pose = pose_from_matrix(jnp.asarray(params.volume_pose))
    vol2cam = compose(inverse(identity_pose()), vol_pose)
    cam2vol = compose(inverse(vol_pose), identity_pose())
    ispec = default_face_spec()
    size, focal = params.raycast_face
    rspec = RaySpec(size=int(size), focal=float(focal))
    pz = face_frames()[0]
    assert pz.name == "+z"

    shard_counts = [int(s) for s in args.shards.split(",")]
    for n in shard_counts:
        pad = 8 if n > 1 else 0
        Ri, ti = vol2cam
        if args.axis == "z":
            Zl = Zg // n
            assert Zl % 8 == 0, (Zg, n)
            # middle shard of the volume: fold the z offset into the pose
            # like volume/integrate.py does for the sharded sweep
            z_off = (n // 2) * Zl
            zoff_m = float(z_off) * params.voxel_size[2]
            v2c_local = Pose(Ri, ti + Ri[:, 2] * zoff_m)
            vol_shape = (Zl, XY, XY)
            # raycast: the plane-sharded (+-z-looking) orientation needs a
            # whole (8, XY, XY) plane block in VMEM — 16 MB at 1024^2, over
            # the scoped budget (needs the DMA-tile rewrite, PERF_NOTES).
            # Measure the ROW-SHARDED orientation (+-y/+-x-looking camera):
            # primed local slab (XY, Zl + 2*pad, XY), block (8, Zl+2p, XY).
            py = [fr for fr in face_frames() if fr.name == "+y"][0]
            Dy, offy, vs_py = _prime_geometry(py, params)
            org_py = Dy @ cam2vol.t + offy
            ray_shape = (XY, Zl + 2 * pad, XY)
            dims_gy = (XY, Zg, XY)  # primed global dims for the +y face
            row0 = z_off - pad
        else:  # Y-sharded stripe (parallel/sharded.py shard_dim=1)
            Yl = XY // n
            assert Yl % 8 == 0, (XY, n)
            y_off = (n // 2) * Yl
            yoff_m = float(y_off) * params.voxel_size[1]
            v2c_local = Pose(Ri, ti + Ri[:, 1] * yoff_m)
            vol_shape = (Zg, Yl, XY)
            # a +z-looking camera under Y-sharding is ROW-sharded in the
            # +z primed frame (identity): slab (Zg, Yl + 2*pad, XY)
            vs_py = tuple(float(v) for v in params.voxel_size)
            org_py = cam2vol.t
            ray_shape = (Zg, Yl + 2 * pad, XY)
            dims_gy = (Zg, XY, XY)
            row0 = y_off - pad
        # Content-realistic raycast slab: integrate the test frame into the
        # measured shard once, then prime + halo-pad it — with the r5 slab
        # work lists an all-zeros slab would measure ~0 (nothing to march),
        # overstating the win; a fused band gives the true per-shard cost.
        if args.no_ray:  # unused, but a real program argument: keep tiny
            tsdf_p = jnp.zeros((8, 8, 128), jnp.int16)
        else:

            @jax.jit
            def _prep():
                t0 = jnp.zeros(vol_shape, jnp.int16)
                w0 = jnp.zeros(vol_shape, jnp.int16)
                c0 = jnp.zeros(vol_shape, jnp.int32)
                t1, _, _ = _sweep_face(
                    t0, w0, c0, pz, depth_m=depth_m, color_rgb=color,
                    vol2cam=v2c_local, intr=intr, params=params,
                    spec=ispec, interpret=False,
                )
                if args.axis == "z":
                    prim = jnp.transpose(t1, (1, 0, 2))  # +y face priming
                else:
                    prim = t1  # +z face: identity
                return jnp.pad(prim, ((0, 0), (pad, pad), (0, 0)))

            tsdf_p = _prep()
            assert tsdf_p.shape == ray_shape, (tsdf_p.shape, ray_shape)

        def run(n_int, n_ray, tsdf, weight, col, tsdf_p):
            def loop(k, body, c0):
                return jax.lax.fori_loop(0, k, lambda _, c: body(c), c0)

            t1, w1, c1 = loop(
                n_int,
                lambda a: _sweep_face(
                    *a, pz, depth_m=depth_m, color_rgb=color,
                    vol2cam=v2c_local, intr=intr, params=params,
                    spec=ispec, interpret=False,
                ),
                (tsdf, weight, col),
            )

            def ray_body(carry):
                hit, back = _sweep_face_rays(
                    tsdf_p, org_py + carry * 1e-30, vs_py, rspec, False,
                    dims_global=dims_gy,
                    plane0=jnp.asarray(0, jnp.int32),
                    row0=jnp.asarray(row0, jnp.int32),
                )
                return carry + hit[0, 0] * 1e-30 + back[0, 0] * 1e-30

            if args.no_ray:
                r = jnp.float32(0) * n_ray
            else:
                r = loop(n_ray, ray_body, jnp.float32(0))
            return (
                t1[0, 0, 0].astype(jnp.float32)
                + w1[0, 0, 0].astype(jnp.float32)
                + c1[0, 0, 0].astype(jnp.float32)
                + r
            )

        jrun = jax.jit(run, donate_argnums=(2, 3, 4))

        def t(ni, nr):
            tsdf_, weight_, col_ = (
                jnp.zeros(vol_shape, jnp.int16),
                jnp.zeros(vol_shape, jnp.int16),
                jnp.zeros(vol_shape, jnp.int32),
            )  # fresh (donated) volume arrays per call
            t0 = time.perf_counter()
            np.asarray(jrun(ni, nr, tsdf_, weight_, col_, tsdf_p))
            return time.perf_counter() - t0

        print(f"n={n} axis={args.axis} slab={vol_shape}: compiling...",
              flush=True)
        t(1, 1)
        K = args.iters
        base = min(t(1, 1) for _ in range(3))
        ti_ = min(t(1 + K, 1) for _ in range(2))
        if args.no_ray:
            tr_ = base
            ray_ms = float("nan")
        else:
            tr_ = min(t(1, 1 + K) for _ in range(2))
            ray_ms = (tr_ - base) / K * 1e3
        int_ms = (ti_ - base) / K * 1e3
        # analytic collective bound: halo 2 dirs x 8 rows x XY*XY int16,
        # pmin composite 2 x face^2 f32 x log2(n) hops; v5e ICI ~45 GB/s
        halo_ms = 0.0 if n == 1 else (2 * 8 * XY * XY * 2) / 45e9 * 1e3
        pmin_ms = 0.0 if n == 1 else (
            2 * rspec.size * rspec.size * 4 * np.log2(n)
        ) / 45e9 * 1e3
        print(
            json.dumps(
                {
                    "shards": n,
                    "axis": args.axis,
                    "slab": list(vol_shape),
                    "integrate_sweep_ms": round(int_ms, 2),
                    "raycast_sweep_ms": None if np.isnan(ray_ms) else round(ray_ms, 2),
                    "halo_bound_ms": round(halo_ms, 3),
                    "pmin_bound_ms": round(pmin_ms, 3),
                    "per_shard_total_ms": None
                    if np.isnan(ray_ms)
                    else round(int_ms + ray_ms + halo_ms + pmin_ms, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
