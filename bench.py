"""End-to-end benchmark: ms/frame of the full per-frame pipeline step.

Workload parity with the reference's published number (BASELINE.md):
640x480 RGB-D frames, 512^3 TSDF volume over a 3 m cube, 3-level pyramid,
{4,5,10} ICP iterations — the reference runs ~18 ms/frame on a GTX 1650 Ti
(README.md:9-10). Prints one JSON line; vs_baseline > 1 means faster than
the reference.

Usage: python bench.py [--dim 512] [--frames 20] [--warmup 3]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--per-stage", action="store_true", help="also time each stage")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kinfu_tpu.config import KinFuParams
    from kinfu_tpu.data.synthetic import default_test_scene, make_orbit_trajectory
    from kinfu_tpu.geometry.intrinsics import Intrinsics
    from kinfu_tpu.pipeline.kinfu import init_state, make_step_fn

    params = KinFuParams(
        pyramid_height=args.levels,
        icp_iters=(4, 5, 10)[: args.levels],
        volume_dims=(args.dim, args.dim, args.dim),
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
    traj = make_orbit_trajectory(args.warmup + args.frames, angle_step_deg=0.3)
    frames = [scene.render_frame(T, intr) for T in traj]
    frames = [(jnp.asarray(d), jnp.asarray(c)) for d, c in frames]

    state = init_state(params, intr)
    step = make_step_fn(params, intr)

    # warmup (includes compile)
    for i in range(args.warmup):
        d, c = frames[i % len(frames)]
        state, out = step(state, d, c)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for i in range(args.frames):
        d, c = frames[(args.warmup + i) % len(frames)]
        state, out = step(state, d, c)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    ms = dt / args.frames * 1e3
    baseline_ms = 18.0
    print(
        json.dumps(
            {
                "metric": f"ms_per_frame_{args.width}x{args.height}_{args.dim}^3",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
