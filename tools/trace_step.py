"""Op-level device-time profile of the production per-frame step.

Runs a short scan of kinfu_step at the bench workload under
jax.profiler.trace, parses the XLA:TPU xplane, and prints the top device
ops by total duration — the ground truth for where the ms/frame goes
(scan-difference stage timing in stagebench.py localizes stages; this
localizes individual fusions/copies inside them).

Usage: python tools/trace_step.py [--dim 512] [--frames 6] [--top 40]
       [--fused auto|on|off]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np


def parse_trace(trace_dir: str):
    """Aggregate (op name -> total_us, count) from the newest Chrome-format
    device trace (trace.json.gz) under trace_dir. Keeps only events on
    device ('/device:TPU' process) op lanes — host/runtime lanes are
    skipped so durations are pure device time."""
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # map pid -> process name, (pid, tid) -> thread name
    pid_name, tid_name = {}, {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_name[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                tid_name[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    agg = collections.defaultdict(lambda: [0.0, 0])
    lanes = collections.defaultdict(float)
    for ev in events:
        if ev.get("ph") != "X":
            continue
        pname = pid_name.get(ev.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        lane = tid_name.get((ev.get("pid"), ev.get("tid")), "")
        lanes[lane] += ev.get("dur", 0.0)
        if "XLA Op" not in lane and "Ops" != lane:
            continue
        agg[ev["name"]][0] += ev.get("dur", 0.0)
        agg[ev["name"]][1] += 1
    if not agg:
        # fall back: aggregate every device lane, report lane totals too
        for ev in events:
            if ev.get("ph") != "X":
                continue
            pname = pid_name.get(ev.get("pid"), "")
            if "TPU" not in pname and "device" not in pname.lower():
                continue
            agg[ev["name"]][0] += ev.get("dur", 0.0)
            agg[ev["name"]][1] += 1
    print("device lanes (total us):")
    for lane, us in sorted(lanes.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {us:>12.0f}  {lane}")
    return {k: (v[0], v[1]) for k, v in agg.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--fused", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--trace-dir", default="/tmp/kinfu_trace")
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
    from kinfu_tpu.data.synthetic import default_test_scene, make_orbit_trajectory
    from kinfu_tpu.geometry.intrinsics import Intrinsics
    from kinfu_tpu.pipeline.kinfu import init_state, kinfu_step

    params = KinFuParams(
        pyramid_height=3,
        icp_iters=(4, 5, 10),
        volume_dims=(args.dim,) * 3,
        fused_mode=args.fused,
    )
    intr = Intrinsics(
        width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5
    )
    scene = default_test_scene()
    traj = make_orbit_trajectory(args.frames, angle_step_deg=0.3)
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
    # warm up / compile outside the trace
    _, (poses, oks, _) = scan(init_state(params, intr), depths, colors)
    np.asarray(poses)

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    _, (poses, oks, _) = scan(init_state(params, intr), depths, colors)
    np.asarray(poses)
    jax.profiler.stop_trace()

    agg = parse_trace(args.trace_dir)
    total = sum(us for us, _ in agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[: args.top]
    print(
        f"\ndevice total {total/1e3:.1f} ms over {args.frames} frames "
        f"= {total/1e3/args.frames:.2f} ms/frame  (ok={np.asarray(oks).all()})"
    )
    print(f"{'us/frame':>10} {'count':>6}  op")
    for name, (us, cnt) in rows:
        print(f"{us/args.frames:>10.0f} {cnt:>6}  {name[:140]}")


if __name__ == "__main__":
    main()
