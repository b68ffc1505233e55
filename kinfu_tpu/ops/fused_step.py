"""Fused TPU volume update: integrate + raycast + failure-reset in ONE
conditional.

XLA stages every lax.cond/lax.switch operand and result through fresh
buffers, so each conditional layer that carries the TSDF volume costs
full-volume copies (~4-8 ms per layer at 512^3, measured r3 —
tools/integrate_probe.py, tools/raycast_probe.py, bench deltas). The
per-frame step needs three volume-touching decisions:

  - which cube face(s) to fuse        (pallas_integrate.integrate_warped)
  - which cube face(s) to raycast     (pallas_raycast.raycast_warped)
  - tracked vs failed (reset)         (pipeline.kinfu.kinfu_step)

The fusion and raycast face sets are IDENTICAL — fusion gates on the
frustum directions in volume coordinates via vol2cam.R^T, raycast via
cam2vol.R, and cam2vol.R == vol2cam.R^T — so all three decisions collapse
into one lax.switch over branches:

  0..5   single face f: fusion sweep + raycast sweep + shade/resample
  6      multi-face fallback: cond-chains over both kernels (rare frames
         whose frustum straddles a cube edge/corner)
  7      tracking failure: reset volume, zero prediction maps

The volume arrays cross exactly ONE conditional boundary per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose
from kinfu_tpu.ops.facewarp import face_frames, warp_dims_ok
from kinfu_tpu.ops.facewarp import default_face_spec
from kinfu_tpu.ops.pallas_integrate import _sweep_face, faces_needed
from kinfu_tpu.ops.pallas_raycast import RaySpec, _face_pass
from kinfu_tpu.volume.tsdf import TSDFVolume


def fused_supported(vol_shape, params: KinFuParams) -> bool:
    """True when the fused switch path can serve this configuration."""
    if params.fused_mode == "off":
        return False
    modes_ok = params.integrate_mode in ("auto", "warped") and (
        params.raycast_mode in ("auto", "warped")
    )
    if params.fused_mode == "on":  # force (interpret-mode Pallas off-TPU)
        return modes_ok and warp_dims_ok(vol_shape)
    return (
        modes_ok
        and jax.default_backend() == "tpu"
        and warp_dims_ok(vol_shape)
    )


def fused_update(
    vol: TSDFVolume,
    depth_m: jnp.ndarray,
    color_rgb: jnp.ndarray,
    vol2cam: Pose,
    cam2vol: Pose,
    intr: Intrinsics,
    params: KinFuParams,
    good: jnp.ndarray,
    interpret: bool | None = None,
    reset_on_fail: bool | jnp.ndarray = True,
    pre=None,
    aux=None,
):
    """One-switch volume update.

    Returns (vol', vmap [H,W,3], nmap [H,W,3], aux') — camera-frame raycast
    prediction of the post-fusion surface, zeros on the failure branch
    (`good` False: volume reset when reset_on_fail, else kept for the
    relocalizer).

    `pre`, if given, maps the (tsdf, weight, color_i32) tuple to a
    transformed tuple INSIDE each success branch — so a volume-touching
    prologue (the streaming grid shift, pipeline/streaming.py) rides the
    same single conditional instead of adding its own staging layer. The
    failure branch skips it (reset discards content; keep-for-relocalizer
    keeps the untransformed volume, matching a pose that did not
    advance).

    `aux` (any pytree of arrays) is threaded THROUGH the switch untouched
    and returned as aux'. Callers MUST route every array they still need
    after the switch through here instead of closing over it: XLA:TPU's
    buffer assignment clobbers buffers that are merely live ACROSS the
    switch (the r3/r4 miscompile — a measurement normal map kept for the
    bootstrap select read back all-zeros on hardware; bisect record in
    tools/PERF_NOTES.md "fused-step masking miscompile"). Making the
    arrays conditional operands/results gives them their own staged
    buffers, which survives. Cost: one copy of aux per frame (~10 MB for
    the measurement pyramids — microseconds of HBM)."""
    if interpret is None:
        # interpret-mode Pallas anywhere the Mosaic TPU kernels can't
        # compile natively (cpu, gpu) — fused_mode="on" forces this path
        # for cross-backend parity tests
        interpret = jax.default_backend() != "tpu"
    size, focal = params.raycast_face
    rspec = RaySpec(size=int(size), focal=float(focal))
    h, w = intr.height, intr.width
    R, tt = cam2vol
    # A singular ICP solve can leave NaNs in the failed pose; the multiply
    # masking below (0 * NaN = NaN) would leak them into the documented
    # "zeros on the failure branch" contract, so sanitize here (3x3 + 3
    # scalars — free next to the volume work). Whole-matrix substitution:
    # element-wise repair of a partially-NaN R would mix surviving entries
    # with identity entries into a non-orthonormal matrix.
    pose_ok = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(tt))
    R = jnp.where(pose_ok, R, jnp.eye(3, dtype=R.dtype))
    org = jnp.where(pose_ok, tt, jnp.zeros_like(tt))

    frames = list(face_frames())
    col_i32 = vol.color  # int32 packed RGB (volume/tsdf.py)

    def sweep(arrays, fr):
        return _sweep_face(
            *arrays,
            fr,
            depth_m=depth_m,
            color_rgb=color_rgb,
            vol2cam=vol2cam,
            intr=intr,
            params=params,
            spec=default_face_spec(),
            interpret=interpret,
        )

    def ray_face(acc, tsdf, fr):
        p_v, n_v, ok, own = _face_pass(
            tsdf, fr, cam2vol, intr, params, rspec, interpret
        )
        # multiply-mask accumulation (operands finite) — select-with-zero
        # miscompiles next to the switch, see the epilogue note below
        m = (own & ok).astype(jnp.float32)[..., None]
        nz = jnp.any(jnp.abs(n_v) > 0, axis=-1)
        return (
            p_v * m + acc[0] * (1.0 - m),
            n_v * m + acc[1] * (1.0 - m),
            (own & ok & nz) | acc[2],
        )

    acc0 = (
        jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((h, w, 3), jnp.float32),
        jnp.zeros((h, w), jnp.bool_),
    )

    flags = faces_needed(vol2cam, intr)  # == raycast's flags (R^T == cam R)
    flag_vec = jnp.stack([flags[fr.name] for fr in frames])
    nset = jnp.sum(flag_vec.astype(jnp.int32))
    code = jnp.where(nset == 1, jnp.argmax(flag_vec), len(frames))
    code = jnp.where(good, code, len(frames) + 1)

    # Every branch's volume outputs pass through pin_natural: XLA assigns
    # ONE layout per switch result across branches, and without the pin it
    # chose the layout that made a never-executed transposing branch free
    # while taxing the hot branch + scan carry with ~7 ms/frame of
    # full-volume relayout copies (ops/layout_pin.py).
    from kinfu_tpu.ops.layout_pin import pin_natural

    def single(fr):
        def branch(a):
            arrs = (a[0], a[1], a[2])
            if pre is not None:
                arrs = pre(arrs)
            t, wgt, c = sweep(arrs, fr)
            acc = ray_face(acc0, t, fr)
            return *pin_natural(t, wgt, c), *acc, a[3]

        return branch

    def chain(a):
        arrs = (a[0], a[1], a[2])
        if pre is not None:
            arrs = pre(arrs)
        for fr in frames:
            arrs = jax.lax.cond(
                flags[fr.name],
                lambda x, f=fr: sweep(x, f),
                lambda x: x,
                arrs,
            )
        acc = acc0
        for fr in frames:
            acc = jax.lax.cond(
                flags[fr.name],
                lambda x, f=fr: ray_face(x, arrs[0], f),
                lambda x: x,
                acc,
            )
        return (*pin_natural(*arrs), *acc, a[3])

    def fail(a):
        # reset (kinectfusion.cpp:97-102) or keep-for-relocalizer, selected
        # by multiplication so `reset_on_fail` may be traced (one switch
        # trace serves both modes); cost is a slab read+write only on
        # failure frames
        k16 = jnp.asarray(jnp.logical_not(reset_on_fail), jnp.int16)
        return (
            *pin_natural(
                a[0] * k16,
                a[1] * k16,
                a[2] * k16.astype(jnp.int32),
            ),
            *acc0,
            a[3],
        )

    outs = jax.lax.switch(
        code,
        [single(fr) for fr in frames] + [chain, fail],
        (vol.tsdf, vol.weight, col_i32, aux),
    )
    tsdf_n, weight_n, col_n, vertex, normal, valid, aux_out = outs

    # Multiply-masking (NOT `jnp.where(valid, x, 0.0)`) and the `aux`
    # threading above are both XLA:TPU miscompile workarounds — see the
    # docstring and tools/PERF_NOTES.md "fused-step masking miscompile"
    # for the r3/r4 hardware bisect record.
    Rinv = R.T
    vcam = jnp.einsum("ij,hwj->hwi", Rinv, vertex - org[None, None, :])
    ncam = jnp.einsum("ij,hwj->hwi", Rinv, normal)
    valid_f = valid.astype(jnp.float32)[..., None]
    vol_n = TSDFVolume(tsdf=tsdf_n, weight=weight_n, color=col_n)
    return vol_n, vcam * valid_f, ncam * valid_f, aux_out
