"""Per-stage device-time breakdown on real hardware.

Times each pipeline stage (measurement pyramid, ICP, integrate, raycast,
full step) with the same scan-length-difference method as bench.py: each
stage runs inside a jitted `lax.scan` over N iterations, and time is
(T(N_big) - T(N_small)) / (N_big - N_small), which cancels the fixed
dispatch round-trip of remote/tunneled TPU backends.

Usage: python tools/stagebench.py [--dim 512] [--iters 16] [--stages icp,raycast]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def measure(fn, state, n_small, n_big, reps=3):
    """fn(state, n) -> array output; returns per-iter seconds."""
    fn(state, n_small)
    fn(state, n_big)
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(state, n_small))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(fn(state, n_big))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--stages", type=str, default="pyramid,icp,integrate,raycast")
    args = ap.parse_args()

    import functools

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
    from kinfu_tpu.geometry.se3 import compose, identity_pose, inverse, pose_from_matrix
    from kinfu_tpu.pipeline.kinfu import init_state
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

    # build one real fused state so raycast/ICP hit real geometry
    vol = create_volume(params.volume_dims)
    vol = jax.jit(lambda v: integrate(v, depth_raw * params.depth_scale, color, vol2cam, intr, params))(vol)
    dmaps, vmaps, nmaps = jax.jit(
        lambda d: build_measurement_pyramid(
            d, intr,
            pyramid_height=params.pyramid_height,
            bfilter_kernel_size=params.bfilter_kernel_size,
            bfilter_color_sigma=params.bfilter_color_sigma,
            bfilter_spatial_sigma=params.bfilter_spatial_sigma,
            depth_scale=params.depth_scale,
            max_dist=params.dfilter_dist,
        )
    )(depth_raw)

    results = {}
    stages = args.stages.split(",")

    def scan_n(body, init, n):
        def f(carry, _):
            return body(carry), None

        out, _ = jax.lax.scan(f, init, None, length=n)
        return out

    if "pyramid" in stages:
        @functools.partial(jax.jit, static_argnums=(1,))
        def pyr_n(d, n):
            def body(d):
                dm, vm, nm = build_measurement_pyramid(
                    d, intr,
                    pyramid_height=params.pyramid_height,
                    bfilter_kernel_size=params.bfilter_kernel_size,
                    bfilter_color_sigma=params.bfilter_color_sigma,
                    bfilter_spatial_sigma=params.bfilter_spatial_sigma,
                    depth_scale=params.depth_scale,
                    max_dist=params.dfilter_dist,
                )
                # feed back something depth-shaped to serialise iterations
                return d + vm[0][..., 2] * 1e-30  # real dep: stops loop-invariant hoisting
            return scan_n(body, d, n)

        results["pyramid"] = measure(
            lambda s, n: pyr_n(s, n), depth_raw, args.small, args.iters
        )

    if "icp" in stages:
        @functools.partial(jax.jit, static_argnums=(1,))
        def icp_n(seed, n):
            def body(seed):
                res = rigid_icp(
                    [v + seed * 1e-30 for v in vmaps], nmaps, vmaps, nmaps, intr, params
                )
                return seed + res.pose.t[0] * 1e-30
            return scan_n(body, seed, n)

        results["icp_19iter"] = measure(
            lambda s, n: icp_n(s, n), jnp.float32(0), args.small, args.iters
        )

    if "integrate" in stages:
        @functools.partial(jax.jit, static_argnums=(1,))
        def int_n(v, n):
            return scan_n(
                lambda v: integrate(v, dmaps[0], color, vol2cam, intr, params), v, n
            ).tsdf[0, 0, 0]

        results["integrate"] = measure(
            lambda s, n: int_n(s, n), vol, args.small, args.iters
        )

    if "raycast" in stages:
        @functools.partial(jax.jit, static_argnums=(1,))
        def ray_n(seed, n):
            def body(seed):
                from kinfu_tpu.geometry.se3 import Pose
                c2v = Pose(cam2vol.R, cam2vol.t + seed * 1e-30)
                rv, rn = raycast(vol, c2v, intr, params)
                return seed + rv[0, 0, 2] * 1e-30
            return scan_n(body, seed, n)

        results["raycast"] = measure(
            lambda s, n: ray_n(s, n), jnp.float32(0), args.small, args.iters
        )

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
