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

Usage: python bench.py [--dim 512] [--frames 20] [--warmup 2]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _run_scan(scan_fn, state, depths, colors):
    """Run the scanned pipeline and force completion via host fetch."""
    t0 = time.perf_counter()
    state, (poses, oks) = scan_fn(state, depths, colors)
    poses = np.asarray(poses)  # host fetch == hard sync
    oks = np.asarray(oks)
    dt = time.perf_counter() - t0
    return state, poses, oks, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--levels", type=int, default=3)
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
    scene = default_test_scene()
    traj = make_orbit_trajectory(n_small + n_big, angle_step_deg=0.3)
    rendered = [scene.render_frame(T, intr) for T in traj]
    depths = jnp.asarray(np.stack([d for d, _ in rendered]))
    colors = jnp.asarray(np.stack([c for _, c in rendered]))

    def scan_pipeline(state, ds, cs):
        def body(st, frame):
            d, c = frame
            st, out = kinfu_step(st, d, c, params=params, intr=intr)
            return st, (out.pose_matrix, out.tracking_ok)

        return jax.lax.scan(body, state, (ds, cs))

    scan = jax.jit(scan_pipeline, donate_argnums=(0,))

    state = init_state(params, intr)
    # small scan: compile (both lengths) + fixed-overhead sample
    sm_d, sm_c = depths[:n_small], colors[:n_small]
    bg_d, bg_c = depths[n_small:], colors[n_small:]
    state, _, _, _ = _run_scan(scan, state, sm_d, sm_c)  # compile small
    st2 = init_state(params, intr)
    st2, _, _, _ = _run_scan(scan, st2, bg_d, bg_c)  # compile big
    del st2

    # timed: alternate small/big scans, difference out the fixed overhead
    t_small, t_big = [], []
    for _ in range(3):
        state, _, _, dt = _run_scan(scan, state, sm_d, sm_c)
        t_small.append(dt)
        state, poses, oks, dt = _run_scan(scan, state, bg_d, bg_c)
        t_big.append(dt)
    assert oks.all(), "tracking failed during benchmark"

    ms = (min(t_big) - min(t_small)) / (n_big - n_small) * 1e3
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
