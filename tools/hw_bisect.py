"""Hardware bisect harness for the per-frame pipeline step.

Runs the bench.py workload (640x480 / 512^3 / 3 levels, 0.3 deg orbit) on
whatever backend is live, printing per-frame `tracking_ok` / `icp_inliers`
instead of a single end-of-run assert, with every dispatch knob exposed as
a flag so a TPU-only failure can be localized in component space:

    python tools/hw_bisect.py --frames 10                    # production modes
    python tools/hw_bisect.py --fused off                    # no fused switch
    python tools/hw_bisect.py --fused off --raycast step     # jnp marcher
    python tools/hw_bisect.py --fused off --integrate gather --raycast step \
        --icp gather                                         # all-jnp

Exit code 0 iff every frame after the first tracks. Written for the r3->r4
BENCH_r03 regression ("tracking failed during benchmark", rc=1): the CPU
interpret-mode suite is structurally blind to compiled-TPU-only miscompiles,
so this is the minimal program that exercises the production composition on
the chip with observability.
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
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--angle-step", type=float, default=0.3)
    ap.add_argument("--fused", default="auto", choices=["auto", "on", "off"])
    ap.add_argument(
        "--integrate", default="auto", choices=["auto", "warped", "gather"]
    )
    ap.add_argument(
        "--raycast", default="auto", choices=["auto", "warped", "hier", "step"]
    )
    ap.add_argument("--icp", default="auto", choices=["auto", "warped", "gather"])
    ap.add_argument(
        "--no-donate",
        action="store_true",
        help="disable state donation (bisect lever: donation + in-kernel "
        "aliasing + switch is a suspected miscompile trigger)",
    )
    ap.add_argument(
        "--scan",
        action="store_true",
        help="run frames inside one lax.scan (bench.py structure) instead of "
        "per-frame jitted steps",
    )
    ap.add_argument(
        "--streaming",
        action="store_true",
        help="use the streaming (moving-volume) step instead of kinfu_step "
        "(per-frame mode only)",
    )
    ap.add_argument(
        "--replay",
        type=int,
        default=0,
        help="after the main pass, re-run the first N frames on the "
        "continuing state (reproduces bench.py's alternating structure)",
    )
    ap.add_argument(
        "--corner",
        action="store_true",
        help="yaw the whole trajectory ~50 deg so the frustum straddles the "
        "+z/+x cube edge: the fused step takes the multi-face CHAIN branch "
        "(ops/fused_step.py branch 6) every frame — the least-exercised "
        "branch of the most miscompile-prone construct (VERDICT r4 item 4). "
        "Uses a corner-facing scene (sphere + 2 planes along the yawed axis).",
    )
    args = ap.parse_args()
    if args.scan and args.streaming:
        ap.error("--streaming only supports per-frame mode (drop --scan)")

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
    from kinfu_tpu.pipeline.kinfu import init_state, kinfu_step, make_step_fn

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

    print(
        f"backend={jax.default_backend()} dim={args.dim} "
        f"fused={args.fused} integrate={args.integrate} "
        f"raycast={args.raycast} icp={args.icp} scan={args.scan}",
        flush=True,
    )

    n_traj = args.frames
    traj = make_orbit_trajectory(n_traj, angle_step_deg=args.angle_step)
    if args.corner:
        from kinfu_tpu.data.synthetic import SyntheticScene, plane, sphere

        yaw = np.deg2rad(50.0)
        d = np.array([np.sin(yaw), 0.0, np.cos(yaw)])
        Ry = np.eye(4, dtype=np.float32)
        Ry[:3, :3] = np.array(
            [
                [np.cos(yaw), 0, np.sin(yaw)],
                [0, 1, 0],
                [-np.sin(yaw), 0, np.cos(yaw)],
            ],
            np.float32,
        )
        traj = [T @ Ry for T in traj]
        back_n = -d + np.array([0.1, 0.05, 0.0])
        back_n /= np.linalg.norm(back_n)
        floor_n = np.array([0.05, -1.0, 0.1])
        floor_n /= np.linalg.norm(floor_n)
        scene = SyntheticScene(
            [
                sphere(center=d * 1.4 + np.array([0.0, -0.1, 0.0]), radius=0.4),
                plane(point=d * 2.4, normal=back_n),
                plane(point=np.array([0.0, 0.5, 0.0]), normal=floor_n),
            ]
        )
        # report how many cube faces each frame's frustum engages (the
        # host-side mirror of pallas_integrate.faces_needed): >= 2 on every
        # frame means every tracked frame runs the chain branch
        u = np.linspace(0.0, args.width - 1.0, 7)
        v = np.linspace(0.0, args.height - 1.0, 7)
        lx = (u[None, :] - intr.cx) / intr.fx
        ly = (v[:, None] - intr.cy) / intr.fy
        d_cam = np.stack(
            [np.broadcast_to(lx, (7, 7)), np.broadcast_to(ly, (7, 7)),
             np.ones((7, 7))], axis=-1,
        )
        for i, T in enumerate(traj):
            R = T[:3, :3]
            d_vol = d_cam @ R.T
            dinf = np.abs(d_vol).max(-1)
            nf = sum(
                bool((s * d_vol[..., ax] >= 0.75 * dinf).any())
                for ax in (0, 1, 2)
                for s in (1, -1)
            )
            if i == 0 or i == len(traj) - 1:
                print(f"frame {i}: frustum engages {nf} cube faces")
            assert nf >= 2, f"corner mode but frame {i} engages {nf} face(s)"
    else:
        scene = default_test_scene()
    rendered = [scene.render_frame(T, intr) for T in traj]
    depths = np.stack([d for d, _ in rendered])
    colors = np.stack([c for _, c in rendered])

    state = init_state(params, intr)
    all_ok = True

    if args.scan:
        jdepths = jnp.asarray(depths)
        jcolors = jnp.asarray(colors)

        def scan_pipeline(st, ds, cs):
            def body(s, frame):
                d, c = frame
                s, out = kinfu_step(s, d, c, params=params, intr=intr)
                return s, (out.tracking_ok, out.icp_inliers)

            return jax.lax.scan(body, st, (ds, cs))

        scan = jax.jit(
            scan_pipeline, donate_argnums=() if args.no_donate else (0,)
        )
        t0 = time.perf_counter()
        state, (oks, inl) = scan(state, jdepths, jcolors)
        oks, inl = np.asarray(oks), np.asarray(inl)
        print(f"scan pass: {time.perf_counter() - t0:.1f}s", flush=True)
        for i in range(args.frames):
            print(f"frame {i:3d}  ok={bool(oks[i])}  inliers={int(inl[i])}")
        all_ok &= bool(oks[1:].all())
        if args.replay:
            n = args.replay
            state, (oks, inl) = scan(state, jdepths[:n], jcolors[:n])
            oks, inl = np.asarray(oks), np.asarray(inl)
            for i in range(n):
                print(f"replay {i:3d}  ok={bool(oks[i])}  inliers={int(inl[i])}")
            all_ok &= bool(oks.all())
    elif args.streaming:
        from kinfu_tpu.pipeline.streaming import (
            init_streaming_state,
            make_streaming_step_fn,
        )

        sstep = make_streaming_step_fn(params, intr, donate=not args.no_donate)
        sstate = init_streaming_state(params, intr)
        for i in range(args.frames):
            t0 = time.perf_counter()
            sstate, out = sstep(
                sstate, jnp.asarray(depths[i]), jnp.asarray(colors[i])
            )
            ok = bool(out.tracking_ok)
            inl = int(out.icp_inliers)
            origin = np.asarray(sstate.origin_vox).tolist()
            dt = time.perf_counter() - t0
            print(
                f"frame {i:3d}  ok={ok}  inliers={inl}  origin={origin}"
                f"  ({dt:.2f}s)",
                flush=True,
            )
            if i > 0:
                all_ok &= ok
    else:
        step = make_step_fn(params, intr, donate=not args.no_donate)
        for i in range(args.frames):
            t0 = time.perf_counter()
            state, out = step(state, jnp.asarray(depths[i]), jnp.asarray(colors[i]))
            ok = bool(out.tracking_ok)
            inl = int(out.icp_inliers)
            dt = time.perf_counter() - t0
            print(f"frame {i:3d}  ok={ok}  inliers={inl}  ({dt:.2f}s)", flush=True)
            if i > 0:
                all_ok &= ok
        if args.replay:
            for i in range(args.replay):
                state, out = step(
                    state, jnp.asarray(depths[i]), jnp.asarray(colors[i])
                )
                print(
                    f"replay {i:3d}  ok={bool(out.tracking_ok)}  "
                    f"inliers={int(out.icp_inliers)}",
                    flush=True,
                )
                all_ok &= bool(out.tracking_ok)

    print("RESULT:", "OK" if all_ok else "TRACKING-FAIL")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
