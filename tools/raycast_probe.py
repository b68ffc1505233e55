"""On-chip decomposition of the raycast stage (r3 perf work).

Stages timed (one compile, dynamic counts, loop-difference):
  full      raycast_warped(faces="auto")          — production path
  sweep     _sweep_face_rays only (+z primed)     — kernel + worklist prep
  prep      the work-list construction alone (occupancy SAT + argsort)
  fields    _face_fields + _resample_face          — shade/resample glue

Usage: python tools/raycast_probe.py [--dim 512] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/kinfu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, "/root/repo")
    from kinfu_tpu.config import KinFuParams
    from kinfu_tpu.data.synthetic import default_test_scene
    from kinfu_tpu.geometry.intrinsics import Intrinsics
    from kinfu_tpu.geometry.se3 import compose, identity_pose, inverse, pose_from_matrix
    from kinfu_tpu.ops.pallas_raycast import (
        RaySpec,
        _face_fields,
        _resample_face,
        _sweep_face_rays,
    )
    from kinfu_tpu.ops.pallas_raycast import raycast_warped
    from kinfu_tpu.volume.integrate import integrate
    from kinfu_tpu.volume.tsdf import create_volume

    params = KinFuParams(volume_dims=(args.dim,) * 3)
    intr = Intrinsics(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(np.eye(4, dtype=np.float32), intr)
    depth_m = jnp.asarray(depth_raw) * params.depth_scale
    color = jnp.asarray(color)
    vol_pose = pose_from_matrix(jnp.asarray(params.volume_pose))
    vol2cam = compose(inverse(identity_pose()), vol_pose)
    cam2vol = compose(inverse(vol_pose), identity_pose())
    spec = RaySpec(*params.raycast_face)
    vs = params.voxel_size

    vol0 = create_volume(params.volume_dims)
    vol0 = jax.jit(
        lambda v: integrate(v, depth_m, color, vol2cam, intr, params)
    )(vol0)

    F = spec.size

    @jax.jit
    def run(n_full, n_pinned, n_sweep, n_prep, n_fields, tsdf, hit0, back0):
        from kinfu_tpu.volume.tsdf import TSDFVolume

        def loop(n, body, c0):
            return jax.lax.fori_loop(0, n, lambda _, c: body(c), c0)

        vol = TSDFVolume(tsdf=tsdf, weight=None, color=None)

        def full_body(seed):
            from kinfu_tpu.geometry.se3 import Pose

            c2v = Pose(cam2vol.R, cam2vol.t + seed * 1e-30)
            vm, nm = raycast_warped(vol, c2v, intr, params, spec=spec,
                                    interpret=False)
            return seed + vm[0, 0, 2] * 1e-30

        a = loop(n_full, full_body, jnp.float32(0))

        def pinned_body(seed):
            from kinfu_tpu.geometry.se3 import Pose

            c2v = Pose(cam2vol.R, cam2vol.t + seed * 1e-30)
            vm, nm = raycast_warped(vol, c2v, intr, params, spec=spec,
                                    interpret=False, faces=("+z",))
            return seed + vm[0, 0, 2] * 1e-30

        a2 = loop(n_pinned, pinned_body, jnp.float32(0))

        org_p = cam2vol.t

        def sweep_body(seed):
            h, b = _sweep_face_rays(
                tsdf, org_p + seed * 1e-30, vs, spec, False
            )
            return seed + h[0, 0] * 1e-30

        b = loop(n_sweep, sweep_body, jnp.float32(0))

        def prep_body(seed):
            Zc = Yc = Xc = args.dim // 8
            m = tsdf.reshape(args.dim, args.dim, Xc, 8).min(axis=3)
            m = m.reshape(args.dim, Yc, 8, Xc).min(axis=2)
            neg = m.reshape(Zc, 8, Yc, Xc).min(axis=1) < 0
            sat = jnp.pad(
                jnp.cumsum(jnp.cumsum(neg.astype(jnp.int32), 1), 2),
                ((0, 0), (1, 0), (1, 0)),
            )
            n_tiles = (F // 8) * (F // 128)
            visit = (sat[:, -1, -1] + seed.astype(jnp.int32) > 0)[:, None] & jnp.ones(
                (Zc, n_tiles), bool
            )
            order = jnp.argsort(~visit, axis=1, stable=True).astype(jnp.int32)
            return seed + order[0, 0].astype(jnp.float32) * 1e-30

        c = loop(n_prep, prep_body, jnp.float32(0))

        def fields_body(seed):
            t_f, n_f, _ = _face_fields(hit0 + seed * 1e-30, back0, org_p, spec)
            A = jnp.eye(3, dtype=jnp.float32)
            t_cam, n_cam = _resample_face(t_f, n_f, A, intr, spec, False)
            return seed + t_cam[0, 0] * 1e-30

        d = loop(n_fields, fields_body, jnp.float32(0))
        return a + a2 + b + c + d

    hit0 = jnp.full((F, F), 2.0, jnp.float32)
    back0 = jnp.full((F, F), 1e30, jnp.float32)

    def t(*ns):
        t0 = time.perf_counter()
        np.asarray(run(*ns, vol0.tsdf, hit0, back0))
        return time.perf_counter() - t0

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    t(1, 1, 1, 1, 1)
    print(f"compile+first: {time.perf_counter()-t0:.0f} s", flush=True)

    base = min(t(1, 1, 1, 1, 1) for _ in range(3))
    K = args.iters
    results = {}
    for i, nm in enumerate(["full_auto", "full_pinned_pz", "sweep_pz", "worklist_prep", "fields_resample"]):
        ns = [1, 1, 1, 1, 1]
        ns[i] = 1 + K
        tt = min(t(*ns) for _ in range(3))
        results[nm] = (tt - base) / K
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
