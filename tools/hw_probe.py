"""Numeric stage-sanity probe on live hardware.

One jitted program: run the measurement pyramid + two pipeline steps on a
synthetic orbit and return COUNTS (nonzero normals per stage, ICP inliers)
so the "maps read back as zeros" miscompile class is visible in one
dispatch. Companion to tools/hw_bisect.py (which localizes in component
space); this localizes in DATA space: which map died.

    python tools/hw_probe.py [--dim 512] [--fused auto] [--integrate auto]
                             [--raycast auto] [--icp auto]
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
    from kinfu_tpu.frontend.maps import build_measurement_pyramid
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

    scene = default_test_scene()
    traj = make_orbit_trajectory(2, angle_step_deg=0.3)
    rendered = [scene.render_frame(T, intr) for T in traj]
    d0, c0 = rendered[0]
    d1, c1 = rendered[1]

    def nz(a):
        return jnp.sum(jnp.any(a != 0, axis=-1).astype(jnp.int32))

    def probe(state, d0, c0, d1, c1):
        diag = {}
        _, vm, nm = build_measurement_pyramid(
            d1,
            intr,
            pyramid_height=params.pyramid_height,
            bfilter_kernel_size=params.bfilter_kernel_size,
            bfilter_color_sigma=params.bfilter_color_sigma,
            bfilter_spatial_sigma=params.bfilter_spatial_sigma,
            depth_scale=params.depth_scale,
            max_dist=params.dfilter_dist,
            normal_disc_threshold=params.normal_disc_threshold,
        )
        diag["meas_vmap_nz"] = nz(vm[0])
        diag["meas_nmap_nz"] = nz(nm[0])

        state, out0 = kinfu_step(state, d0, c0, params=params, intr=intr)
        diag["model_vmap_nz_after_boot"] = nz(state.model_vmaps[0])
        diag["model_nmap_nz_after_boot"] = nz(state.model_nmaps[0])
        diag["model_vmap_finite"] = jnp.all(jnp.isfinite(state.model_vmaps[0]))
        diag["model_nmap_finite"] = jnp.all(jnp.isfinite(state.model_nmaps[0]))
        diag["vol_weight_nz"] = jnp.sum((state.vol.weight != 0).astype(jnp.int32))

        state, out1 = kinfu_step(state, d1, c1, params=params, intr=intr)
        diag["frame2_ok"] = out1.tracking_ok
        diag["frame2_inliers"] = out1.icp_inliers
        diag["model_nmap_nz_after_f2"] = nz(state.model_nmaps[0])
        return diag

    jprobe = jax.jit(probe, donate_argnums=(0,))
    print(
        f"backend={jax.default_backend()} dim={args.dim} fused={args.fused} "
        f"integrate={args.integrate} raycast={args.raycast} icp={args.icp}",
        flush=True,
    )
    t0 = time.perf_counter()
    diag = jprobe(
        init_state(params, intr),
        jnp.asarray(d0), jnp.asarray(c0), jnp.asarray(d1), jnp.asarray(c1),
    )
    diag = {k: np.asarray(v).item() for k, v in diag.items()}
    print(f"({time.perf_counter() - t0:.1f}s)")
    for k, v in diag.items():
        print(f"  {k} = {v}")
    h_w = args.width * args.height
    ok = (
        diag["meas_nmap_nz"] > 0.5 * h_w
        and diag["model_nmap_nz_after_boot"] > 0.3 * h_w
        and diag["frame2_ok"]
        and diag["frame2_inliers"] > 0.2 * h_w
    )
    print("PROBE:", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
