"""End-to-end benchmark: ms/frame of the full per-frame pipeline step.

Workload parity with the reference's published number (BASELINE.md):
640x480 RGB-D frames, 512^3 TSDF volume over a 3 m cube, 3-level pyramid,
{4,5,10} ICP iterations — the reference runs ~18 ms/frame on a GTX 1650 Ti
(README.md:9-10). Prints one JSON line; vs_baseline > 1 means faster than
the reference.

Measurement method: the per-frame step runs as a `lax.scan` over a stacked
frame batch entirely on device, and the reported time is the *difference*
between a long scan and a short scan divided by the frame-count difference.
This cancels fixed per-dispatch overhead exactly — required on tunneled /
remote TPU setups where a single dispatch round-trip (~1 s) would drown the
~ms device time, and harmless locally. Completion is forced with a host
fetch of the scan outputs (some experimental PJRT backends return from
block_until_ready without blocking).

Both scan lengths start from a FRESH init_state and replay the same orbit
from frame 0, so every measured frame is a genuinely tracking frame (the
r3 harness replayed frames onto a continuing state, which silently relied
on auto-reset at the replay discontinuity). On tracking failure the
per-frame ok/inlier trace is printed before exiting non-zero, and the
dispatch-mode knobs are exposed as flags for hardware bisection
(tools/hw_bisect.py is the finer-grained companion).

Usage: python bench.py [--dim 512] [--frames 20] [--fused auto|on|off]
                       [--integrate auto|warped|gather]
                       [--raycast auto|warped|hier|step]
                       [--icp auto|warped|gather]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _run_scan(scan_fn, init_fn, depths, colors):
    """Run the scanned pipeline from fresh state; force completion via
    host fetch. Returns (poses, oks, inliers, seconds)."""
    state = init_fn()
    t0 = time.perf_counter()
    state, (poses, oks, inl) = scan_fn(state, depths, colors)
    poses = np.asarray(poses)  # host fetch == hard sync
    oks = np.asarray(oks)
    inl = np.asarray(inl)
    dt = time.perf_counter() - t0
    return poses, oks, inl, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--fused", default="auto", choices=["auto", "on", "off"])
    ap.add_argument(
        "--integrate", default="auto", choices=["auto", "warped", "gather"]
    )
    ap.add_argument(
        "--raycast", default="auto", choices=["auto", "warped", "hier", "step"]
    )
    ap.add_argument("--icp", default="auto", choices=["auto", "warped", "gather"])
    ap.add_argument(
        "--corner",
        action="store_true",
        help="yaw the orbit ~50 deg so every frame's frustum straddles the "
        "+z/+x cube edge and the fused step takes the multi-face CHAIN "
        "branch — measures the rare-branch latency "
        "(tools/hw_bisect.py --corner is the correctness probe)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/kinfu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from kinfu_tpu.config import KinFuParams
    from kinfu_tpu.data.synthetic import default_test_scene, make_orbit_trajectory
    from kinfu_tpu.geometry.intrinsics import Intrinsics
    from kinfu_tpu.pipeline.kinfu import init_state, kinfu_step

    params = KinFuParams(
        pyramid_height=args.levels,
        icp_iters=(4, 5, 10)[: args.levels],
        volume_dims=(args.dim, args.dim, args.dim),
        fused_mode=args.fused,
        integrate_mode=args.integrate,
        raycast_mode=args.raycast,
        icp_mode=args.icp,
    )
    intr = Intrinsics(
        width=args.width,
        height=args.height,
        fx=525.0 * args.width / 640,
        fy=525.0 * args.width / 640,
        cx=args.width / 2 - 0.5,
        cy=args.height / 2 - 0.5,
    )

    n_small, n_big = args.warmup, args.warmup + args.frames
    traj = make_orbit_trajectory(n_big, angle_step_deg=0.3)
    if args.corner:
        from kinfu_tpu.data.synthetic import corner_test_scene, yaw_trajectory

        scene = corner_test_scene()
        traj = yaw_trajectory(traj)
    else:
        scene = default_test_scene()
    rendered = [scene.render_frame(T, intr) for T in traj]
    depths = jnp.asarray(np.stack([d for d, _ in rendered]))
    colors = jnp.asarray(np.stack([c for _, c in rendered]))

    def scan_pipeline(state, ds, cs):
        def body(st, frame):
            d, c = frame
            st, out = kinfu_step(st, d, c, params=params, intr=intr)
            return st, (out.pose_matrix, out.tracking_ok, out.icp_inliers)

        return jax.lax.scan(body, state, (ds, cs))

    scan = jax.jit(scan_pipeline, donate_argnums=(0,))
    init = lambda: init_state(params, intr)  # noqa: E731

    sm_d, sm_c = depths[:n_small], colors[:n_small]
    # compile both scan lengths
    _run_scan(scan, init, sm_d, sm_c)
    _run_scan(scan, init, depths, colors)

    # timed: both lengths from fresh state, difference out fixed overhead
    t_small, t_big = [], []
    for _ in range(3):
        _, _, _, dt = _run_scan(scan, init, sm_d, sm_c)
        t_small.append(dt)
        poses, oks, inl, dt = _run_scan(scan, init, depths, colors)
        t_big.append(dt)
    if not oks[1:].all():  # frame 0 bootstraps; all others must track
        for i in range(n_big):
            print(
                f"frame {i:3d}  ok={bool(oks[i])}  inliers={int(inl[i])}",
                file=sys.stderr,
            )
        raise AssertionError("tracking failed during benchmark")

    ms = (min(t_big) - min(t_small)) / (n_big - n_small) * 1e3
    baseline_ms = 18.0
    print(
        json.dumps(
            {
                "metric": f"ms_per_frame_{args.width}x{args.height}_{args.dim}^3"
                + ("_corner" if args.corner else ""),
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
