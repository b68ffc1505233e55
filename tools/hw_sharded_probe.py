"""Run the SHARDED per-frame step on real TPU hardware (1-device mesh).

Multi-chip hardware is unreachable from this host, but a 1-device
`jax.sharding.Mesh` still compiles and executes the full sharded path —
shard_map, fused_update_local's traced plane/row offsets, the halo-padded
sweep kernels, the pmin/psum collectives (degenerate but present) — with
the REAL Mosaic backend instead of interpret mode. All other sharded
evidence is CPU-interpret (tests/test_distributed.py etc.); this probe
closes the "sharded kernels never compiled for the chip" gap for both
shard axes.

Usage: python tools/hw_sharded_probe.py [--dim 256] [--frames 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
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
    from kinfu_tpu.parallel.mesh import make_mesh
    from kinfu_tpu.parallel.sharded import make_sharded_step_fn, shard_state
    from kinfu_tpu.pipeline.kinfu import init_state

    params = KinFuParams(
        pyramid_height=2,
        icp_iters=(4, 8),
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
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    scene = default_test_scene()
    traj = make_orbit_trajectory(args.frames, angle_step_deg=0.3)
    frames = [scene.render_frame(T, intr) for T in traj]

    mesh = make_mesh(1)
    all_ok = True
    for shard_dim in (0, 1):
        step = make_sharded_step_fn(params, intr, mesh, shard_dim=shard_dim)
        st = shard_state(init_state(params, intr), mesh, shard_dim=shard_dim)
        for i, (d, c) in enumerate(frames):
            t0 = time.perf_counter()
            st, out = step(st, jnp.asarray(d), jnp.asarray(c))
            ok = bool(out.tracking_ok)
            inl = int(out.icp_inliers)
            dt = time.perf_counter() - t0
            print(
                f"shard_dim={shard_dim} frame {i}  ok={ok}  inliers={inl}"
                f"  ({dt:.1f}s)",
                flush=True,
            )
            if i > 0:
                all_ok &= ok and inl > 0
    print("RESULT:", "OK" if all_ok else "FAIL")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
