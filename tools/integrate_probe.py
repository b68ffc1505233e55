"""On-chip decomposition of the integrate stage (r3 perf work).

One jitted program, dynamic iteration counts (single compile), loop-difference
timing. Stages:
  auto      integrate_warped(faces="auto")      — the production path
  explicit  integrate_warped(faces=("+z",))     — no lax.cond gates
  sweep     _sweep_face only, prebuilt face     — kernel cost alone
  face      build_face only                     — warp gather cost alone

Usage: python tools/integrate_probe.py [--dim 512] [--iters 8]
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
    from kinfu_tpu.ops.facewarp import build_face, default_face_spec, face_frames
    from kinfu_tpu.ops.pallas_integrate import _sweep_face, integrate_warped
    from kinfu_tpu.volume.tsdf import create_volume

    params = KinFuParams(volume_dims=(args.dim,) * 3)
    intr = Intrinsics(width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5)
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(np.eye(4, dtype=np.float32), intr)
    depth_m = jnp.asarray(depth_raw) * params.depth_scale
    color = jnp.asarray(color)
    vol_pose = pose_from_matrix(jnp.asarray(params.volume_pose))
    vol2cam = compose(inverse(identity_pose()), vol_pose)
    spec = default_face_spec()
    pz = face_frames()[0]
    assert pz.name == "+z"

    vol0 = create_volume(params.volume_dims)
    face0 = build_face(depth_m, color, vol2cam, intr, spec,
                       frame=pz, dims=params.volume_dims,
                       voxel_size=params.voxel_size)

    def seed_of(x):
        return x.astype(jnp.float32) * 1e-30

    @jax.jit
    def run(n_auto, n_expl, n_sweep, n_face, vol, depth_m, color, f_range, f_color):
        def loop(n, body, c0):
            return jax.lax.fori_loop(0, n, lambda _, c: body(c), c0)

        va = loop(n_auto,
                  lambda v: integrate_warped(v, depth_m, color, vol2cam, intr, params),
                  vol)
        vb = loop(n_expl,
                  lambda v: integrate_warped(v, depth_m, color, vol2cam, intr, params,
                                             faces=("+z",)),
                  vol)

        col_i32 = jax.lax.bitcast_convert_type(vol.color, jnp.int32)

        def sweep_body(arrs):
            from kinfu_tpu.ops.facewarp import Face
            t, w, c = arrs
            return _sweep_face(
                t, w, c, pz, depth_m, color, vol2cam, intr, params, spec, False
            )

        tc, wc, cc = loop(n_sweep, sweep_body, (vol.tsdf, vol.weight, col_i32))

        def face_body(carry):
            f = build_face(depth_m + carry * 1e-30, color, vol2cam, intr, spec,
                           frame=pz, dims=params.volume_dims,
                           voxel_size=params.voxel_size)
            return carry + f.range_mm[0, 0].astype(jnp.float32) * 1e-30

        fd = loop(n_face, face_body, jnp.float32(0))

        return (va.tsdf[0, 0, 0].astype(jnp.float32)
                + vb.weight[0, 0, 0].astype(jnp.float32)
                + tc[0, 0, 0].astype(jnp.float32) + fd
                + f_range[0, 0].astype(jnp.float32) * 1e-30
                + f_color[0, 0].astype(jnp.float32) * 1e-30)

    def t(*ns):
        t0 = time.perf_counter()
        np.asarray(run(*ns, vol0, depth_m, color, face0.range_mm, face0.color))
        return time.perf_counter() - t0

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    t(1, 1, 1, 1)
    print(f"compile+first: {time.perf_counter()-t0:.0f} s", flush=True)

    base = min(t(1, 1, 1, 1) for _ in range(3))
    K = args.iters
    results = {}
    for i, nm in enumerate(["auto", "explicit_pz", "sweep_only", "build_face"]):
        ns = [1, 1, 1, 1]
        ns[i] = 1 + K
        tt = min(t(*ns) for _ in range(3))
        results[nm] = (tt - base) / K
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
