"""Production-scale raycast parity: warped sweep vs the jnp unit-step march.

One 512^3 / 640x480 frame on the live backend; prints the hit-mask
divergence both ways plus vertex/normal gaps on commonly-hit pixels —
the hardware evidence behind DIVERGENCES.md item 20 / ACCURACY.md
(VERDICT r4 item 8: march-hits-sweep-misses < 1%).

Usage: python tools/raycast_parity_probe.py [--dim 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
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
    from kinfu_tpu.data.synthetic import default_test_scene
    from kinfu_tpu.geometry.intrinsics import Intrinsics
    from kinfu_tpu.geometry.se3 import (
        Pose, compose, identity_pose, inverse, pose_from_matrix,
    )
    from kinfu_tpu.ops.pallas_raycast import raycast_warped
    from kinfu_tpu.volume.integrate import integrate
    from kinfu_tpu.volume.raycast import raycast
    from kinfu_tpu.volume.tsdf import TSDFVolume, create_volume

    params = KinFuParams(volume_dims=(args.dim,) * 3)
    params_step = params.replace(raycast_mode="step")
    intr = Intrinsics(
        width=640, height=480, fx=525.0, fy=525.0, cx=319.5, cy=239.5
    )
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(np.eye(4, dtype=np.float32), intr)
    depth_m = jnp.asarray(depth_raw) * params.depth_scale
    color = jnp.asarray(color)
    vol_pose = pose_from_matrix(jnp.asarray(params.volume_pose))
    vol2cam = compose(inverse(identity_pose()), vol_pose)
    cam2vol = compose(inverse(vol_pose), identity_pose())
    vol = create_volume(params.volume_dims)
    vol = jax.jit(
        lambda v: integrate(v, depth_m, color, vol2cam, intr, params)
    )(vol)

    @jax.jit
    def warped(tsdf, R, t):
        v = TSDFVolume(tsdf=tsdf, weight=None, color=None)
        return raycast_warped(v, Pose(R, t), intr, params)

    @jax.jit
    def ref(tsdf, R, t):
        v = TSDFVolume(tsdf=tsdf, weight=None, color=None)
        return raycast(v, Pose(R, t), intr, params_step)

    vm_w, nm_w = warped(vol.tsdf, cam2vol.R, cam2vol.t)
    vm_r, nm_r = ref(vol.tsdf, cam2vol.R, cam2vol.t)
    hw = np.any(np.asarray(nm_w) != 0, -1)
    hr = np.any(np.asarray(nm_r) != 0, -1)
    both = hw & hr
    dv = np.linalg.norm(np.asarray(vm_w) - np.asarray(vm_r), axis=-1)[both]
    nang = np.degrees(
        np.arccos(
            np.clip(np.sum(np.asarray(nm_w) * np.asarray(nm_r), -1)[both],
                    -1, 1)
        )
    )
    print(
        json.dumps(
            {
                "dim": args.dim,
                "agree": round(float((hw == hr).mean()), 4),
                "march_hits_sweep_misses": round(float((hr & ~hw).mean()), 4),
                "sweep_hits_march_misses": round(float((~hr & hw).mean()), 4),
                "dv_med_mm": round(float(np.median(dv)) * 1e3, 2),
                "nang_med_deg": round(float(np.median(nang)), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
