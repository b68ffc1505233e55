"""Per-stage device-time breakdown on real hardware.

Single compiled program with DYNAMIC per-stage iteration counts
(fori_loop), so varying the workload never recompiles — essential on
remote/tunneled TPU backends where each distinct program costs minutes of
compile time. Per-stage time = (T(stage boosted) - T(baseline)) / extra
iterations, which also cancels the fixed dispatch round-trip.

Usage: python tools/stagebench.py [--dim 512] [--iters 16]
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
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--iters", type=int, default=16)
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
    from kinfu_tpu.frontend.maps import build_measurement_pyramid
    from kinfu_tpu.geometry.intrinsics import Intrinsics
    from kinfu_tpu.geometry.se3 import (
        Pose,
        compose,
        identity_pose,
        inverse,
        pose_from_matrix,
    )
    from kinfu_tpu.tracking.icp import rigid_icp
    from kinfu_tpu.volume.integrate import integrate
    from kinfu_tpu.volume.raycast import raycast
    from kinfu_tpu.volume.tsdf import create_volume

    params = KinFuParams(
        pyramid_height=args.levels,
        icp_iters=(4, 5, 10)[: args.levels],
        volume_dims=(args.dim,) * 3,
    )
    intr = Intrinsics(
        width=args.width,
        height=args.height,
        fx=525.0 * args.width / 640,
        fy=525.0 * args.width / 640,
        cx=args.width / 2 - 0.5,
        cy=args.height / 2 - 0.5,
    )
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(np.eye(4, dtype=np.float32), intr)
    depth_raw = jnp.asarray(depth_raw)
    color = jnp.asarray(color)
    vol_pose = pose_from_matrix(jnp.asarray(params.volume_pose))
    cam = identity_pose()
    vol2cam = compose(inverse(cam), vol_pose)
    cam2vol = compose(inverse(vol_pose), cam)

    def pyramid(d):
        return build_measurement_pyramid(
            d,
            intr,
            pyramid_height=params.pyramid_height,
            bfilter_kernel_size=params.bfilter_kernel_size,
            bfilter_color_sigma=params.bfilter_color_sigma,
            bfilter_spatial_sigma=params.bfilter_spatial_sigma,
            depth_scale=params.depth_scale,
            max_dist=params.dfilter_dist,
        )

    vol0 = create_volume(params.volume_dims)
    vol0 = jax.jit(
        lambda v: integrate(
            v, depth_raw * params.depth_scale, color, vol2cam, intr, params
        )
    )(vol0)
    dmaps, vmaps, nmaps = jax.jit(pyramid)(depth_raw)

    # NOTE: all large arrays are explicit ARGUMENTS — a closed-over array
    # becomes an HLO constant and the 512^3 volume (~0.75 GB) blows the
    # remote-compile upload limit (HTTP 413 on the axon tunnel).
    @jax.jit
    def run(n_pyr, n_icp, n_int, n_ray, depth_raw, color, vol0, dmaps, vmaps, nmaps):
        def loop(n, body, c0):
            return jax.lax.fori_loop(0, n, lambda _, c: body(c), c0)

        def pyr_body(d):
            dm, vm, nm = pyramid(d)
            return d + vm[0][..., 2] * 1e-30

        a = loop(n_pyr, pyr_body, depth_raw)

        def icp_body(seed):
            res = rigid_icp(
                [v + seed * 1e-30 for v in vmaps], nmaps, vmaps, nmaps, intr, params
            )
            return seed + res.pose.t[0] * 1e-30

        b = loop(n_icp, icp_body, jnp.float32(0))

        c = loop(
            n_int,
            lambda v: integrate(v, dmaps[0], color, vol2cam, intr, params),
            vol0,
        )

        def ray_body(seed):
            c2v = Pose(cam2vol.R, cam2vol.t + seed * 1e-30)
            rv, rn = raycast(vol0, c2v, intr, params)
            return seed + rv[0, 0, 2] * 1e-30

        d = loop(n_ray, ray_body, jnp.float32(0))
        return a[0, 0] + b + c.tsdf[0, 0, 0].astype(jnp.float32) + d

    def t(*ns):
        t0 = time.perf_counter()
        np.asarray(run(*ns, depth_raw, color, vol0, dmaps, vmaps, nmaps))
        return time.perf_counter() - t0

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    np.asarray(run(1, 1, 1, 1, depth_raw, color, vol0, dmaps, vmaps, nmaps))
    print(f"compile+first: {time.perf_counter()-t0:.0f} s", flush=True)

    base = min(t(1, 1, 1, 1) for _ in range(3))
    K = args.iters
    results = {}
    for i, nm in enumerate(["pyramid", "icp_19iter", "integrate", "raycast"]):
        ns = [1, 1, 1, 1]
        ns[i] = 1 + K
        tt = min(t(*ns) for _ in range(3))
        results[nm] = (tt - base) / K
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
