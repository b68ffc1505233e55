"""Write a synthetic RGB-D sequence to disk in the reference's bundled
dataset layout (color/*.png + depth/*.png + intr.txt, depth_sensor.cpp:13-46)
so the FULL disk -> PNG decode -> track pipeline can run end-to-end:

    python tools/make_dataset.py --out /tmp/kinfu_seq --frames 50
    python -m kinfu_tpu run --data /tmp/kinfu_seq --save-poses poses.txt ...

Also writes gt_poses.txt (world-from-camera 4x4 per frame, the reference's
doc/poses.txt format) for ATE evaluation of the run.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--angle-step", type=float, default=0.3, help="deg/frame")
    ap.add_argument(
        "--traj", default="orbit", choices=["orbit", "translate"],
    )
    args = ap.parse_args()

    from kinfu_tpu.data.synthetic import (
        default_test_scene,
        make_orbit_trajectory,
        make_translation_trajectory,
    )
    from kinfu_tpu.geometry.intrinsics import Intrinsics
    from kinfu_tpu.io.images import write_color_png, write_depth_png
    from kinfu_tpu.io.poses import write_poses_reference_format

    intr = Intrinsics(
        width=args.width,
        height=args.height,
        fx=525.0 * args.width / 640,
        fy=525.0 * args.width / 640,
        cx=args.width / 2 - 0.5,
        cy=args.height / 2 - 0.5,
    )
    scene = default_test_scene()
    if args.traj == "orbit":
        traj = make_orbit_trajectory(args.frames, angle_step_deg=args.angle_step)
    else:
        traj = make_translation_trajectory(args.frames, step=(0.004, 0.0, 0.006))

    os.makedirs(os.path.join(args.out, "color"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "depth"), exist_ok=True)
    for i, T in enumerate(traj):
        depth_raw, color = scene.render_frame(T, intr)
        write_depth_png(
            os.path.join(args.out, "depth", f"{i:06d}.png"),
            np.round(depth_raw).astype(np.uint16),
        )
        write_color_png(os.path.join(args.out, "color", f"{i:06d}.png"), color)

    # fx cx fy cy c  (c = depth units per metre; reference parser
    # depth_sensor.cpp:23-41)
    with open(os.path.join(args.out, "intr.txt"), "w") as f:
        f.write(f"{intr.fx} {intr.cx} {intr.fy} {intr.cy} 1000.0\n")

    # ground truth, normalised so frame 0 is identity (the tracker's frame)
    T0inv = np.linalg.inv(traj[0])
    write_poses_reference_format(
        os.path.join(args.out, "gt_poses.txt"), [T0inv @ T for T in traj]
    )
    print(f"wrote {len(traj)} frames to {args.out}")


if __name__ == "__main__":
    main()
