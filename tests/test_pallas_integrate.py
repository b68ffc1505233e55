"""Interpret-mode tests for the Pallas face-warp fusion kernel.

Validates ops/pallas_integrate.integrate_warped — the production TPU fusion
path — against the jnp gather integrate (reference semantics,
tsdf_volume.cu:41-110) on CPU via interpret=True, including the tilted- and
backward-camera orientations that the +z-only round-1 kernel silently
dropped.

What "parity" means here (DIVERGENCES.md items 17-19): the warped path
measures signed distance ALONG THE RAY (the reference measures along the
camera z axis), so in-band TSDF values differ by a surface-dependent
secant factor — but the ZERO CROSSING (the reconstructed surface) is the
same point in space. Tests therefore assert (a) update-footprint parity,
(b) sign agreement away from the surface, (c) zero-crossing position
parity to ~1 voxel, and (d) tight value parity only where the scaling is
provably small (near-axis, near-surface).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.data.synthetic import SyntheticScene, default_test_scene, plane, sphere
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import Pose, compose, inverse, pose_from_matrix
from kinfu_tpu.ops.facewarp import FaceSpec, face_frames
from kinfu_tpu.ops.pallas_integrate import faces_needed, integrate_warped
from kinfu_tpu.volume.integrate import integrate
from kinfu_tpu.volume.tsdf import create_volume, tsdf_to_float

INTR = Intrinsics(width=160, height=120, fx=140.0, fy=140.0, cx=79.5, cy=59.5)
PARAMS = KinFuParams(
    pyramid_height=1,
    icp_iters=(4,),
    volume_dims=(128, 128, 128),
    volume_range=(3.0, 3.0, 3.0),
)
# small face for test speed: 256 px covers the ownership cone (+-45 deg)
# plus margin at f=104 (tan = 127.5/104 -> +-50.8 deg)
SPEC = FaceSpec(size=256, focal=104.0, levels=6)

ALL_FACES = tuple(f.name for f in face_frames())


def _roty(deg: float, t=(0.0, 0.0, 0.0)) -> np.ndarray:
    a = np.radians(deg)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    )
    T[:3, 3] = t
    return T


def _vol2cam(T_world_cam: np.ndarray):
    cam = pose_from_matrix(jnp.asarray(T_world_cam, jnp.float32))
    volp = pose_from_matrix(jnp.asarray(PARAMS.volume_pose))
    return compose(inverse(cam), volp)


# One jitted callable per `faces` value shared across this file's cases
# (pose/depth traced): interpret-mode Pallas lowering dominates the wall
# time and unjitted calls retrace per invocation. Needs --dist loadfile.
@functools.partial(jax.jit, static_argnames=("faces",))
def _fuse_both_jit(depth_m, color, R, t, faces):
    v2c = Pose(R, t)
    vol0 = create_volume(PARAMS.volume_dims)
    g = integrate(vol0, depth_m, color, v2c, INTR, PARAMS)
    w = integrate_warped(
        vol0, depth_m, color, v2c, INTR, PARAMS, spec=SPEC, interpret=True,
        faces=faces,
    )
    return g, w


def _fuse_both(T, faces, scene=None):
    scene = scene or default_test_scene()
    depth_raw, color = scene.render_frame(T.astype(np.float32), INTR)
    depth_m, color = jnp.asarray(depth_raw * 0.001), jnp.asarray(color)
    v2c = _vol2cam(T)
    return _fuse_both_jit(depth_m, color, v2c.R, v2c.t, faces)


@functools.partial(jax.jit, static_argnames=("faces",))
def _warped_only_jit(depth_m, color, R, t, faces):
    vol0 = create_volume(PARAMS.volume_dims)
    return integrate_warped(
        vol0, depth_m, color, Pose(R, t), INTR, PARAMS, spec=SPEC,
        interpret=True, faces=faces,
    )


def _crossing_depth(t, wmask):
    """Per (y, x) column: fractional z index of the first +,- zero crossing
    of the TSDF (NaN when none). The surface-position witness."""
    valid = wmask[:-1] & wmask[1:]
    cross = valid & (t[:-1] > 0) & (t[1:] < 0)
    has = cross.any(axis=0)
    first = cross.argmax(axis=0).astype(np.float32)
    zi = np.take_along_axis(t, first[None].astype(int), 0)[0]
    zn = np.take_along_axis(t, first[None].astype(int) + 1, 0)[0]
    frac = zi / np.maximum(zi - zn, 1e-9)
    return np.where(has, first + frac, np.nan)


def _compare(g, w, min_ratio, sign_min=0.95):
    gw = np.asarray(g.weight) > 0
    ww = np.asarray(w.weight) > 0
    gt = np.asarray(tsdf_to_float(g.tsdf))
    wt = np.asarray(tsdf_to_float(w.tsdf))

    assert ww.sum() > 1000
    ratio = ww.sum() / gw.sum()
    assert ratio > min_ratio, f"updated-voxel ratio {ratio}"
    # warped may update a small fringe outside the gather footprint (nearest
    # mip sampling bleeds up to 2^(l-1) base px past the frustum border,
    # DIVERGENCES.md 18) — but every extra voxel must hug that footprint:
    # nothing outside a 2-voxel dilation of it
    extra = (ww & ~gw).sum() / ww.sum()
    assert extra < 0.06, f"warped-only fraction {extra}"
    dil = gw.copy()
    for ax in (0, 1, 2):
        for sh in (-2, -1, 1, 2):
            dil |= np.roll(gw, sh, axis=ax)
    stray = (ww & ~dil).sum()
    assert stray / ww.sum() < 1e-3, f"{stray} warped updates far from frustum"

    # sign agreement: the along-ray vs along-z scaling (DIVERGENCES.md 17)
    # rescales in-band values but cannot flip their sign; disagreements are
    # confined to sampling noise at silhouettes
    both = gw & ww & (np.abs(gt) > 0.1) & (np.abs(gt) < 0.99)
    if both.sum() > 500:
        agree = (np.sign(gt[both]) == np.sign(wt[both])).mean()
        assert agree > sign_min, f"sign agreement {agree}"

    # surface-position parity: first +,- crossing along z, compared on
    # locally smooth columns (at silhouettes the two paths can legitimately
    # latch onto different surfaces — measured unbiased, median ~0.1 voxel)
    gc = _crossing_depth(gt, gw)
    wc = _crossing_depth(wt, ww)
    from numpy.lib.stride_tricks import sliding_window_view

    import warnings

    wins = sliding_window_view(np.pad(gc, 1, mode="edge"), (3, 3))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN windows
        rough = np.nanmax(wins, axis=(2, 3)) - np.nanmin(wins, axis=(2, 3))
    bothc = np.isfinite(gc) & np.isfinite(wc) & (rough < 1.0)
    if bothc.sum() > 200:
        d = np.abs(gc[bothc] - wc[bothc])
        assert np.percentile(d, 90) < 0.6, np.percentile(d, 90)
        assert np.median(d) < 0.25, np.median(d)


def test_y_blocked_sweep_matches_unblocked():
    """Slab cross-sections past 512^2 split the grid over row blocks to fit
    scoped VMEM (pallas_integrate._sweep_face YB). A (512, 1024) slab
    triggers YB=512: the blocked sweep must be BIT-IDENTICAL to the
    unblocked one (same math, different grid partitioning)."""
    import kinfu_tpu.ops.pallas_integrate as PI

    params = KinFuParams(
        pyramid_height=1,
        icp_iters=(4,),
        volume_dims=(512, 1024, 8),  # (X, Y, Z) -> slab rows x lanes = 1024 x 512
        volume_range=(3.0, 6.0, 3.0 / 128),
        volume_origin=(-1.5, -3.0, 2.19),  # thin sheet through the scene
    )
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(np.eye(4, dtype=np.float32), INTR)
    depth_m, color = jnp.asarray(depth_raw * 0.001), jnp.asarray(color)
    cam = pose_from_matrix(jnp.asarray(np.eye(4, dtype=np.float32)))
    v2c = compose(inverse(cam), pose_from_matrix(jnp.asarray(params.volume_pose)))
    vol0 = create_volume(params.volume_dims)

    cap0 = PI._YB_CAP
    try:
        PI._YB_CAP = 1 << 30  # whole-slab blocks (the pre-blocking layout)
        ref = integrate_warped(
            vol0, depth_m, color, v2c, INTR, params, spec=SPEC,
            interpret=True, faces=("+z",),
        )
        PI._YB_CAP = 1 << 18  # production cap -> YB=512, grid (8, 2)
        blk = integrate_warped(
            vol0, depth_m, color, v2c, INTR, params, spec=SPEC,
            interpret=True, faces=("+z",),
        )
    finally:
        PI._YB_CAP = cap0

    assert int(np.asarray(blk.weight).astype(np.int64).sum()) > 500
    np.testing.assert_array_equal(np.asarray(blk.tsdf), np.asarray(ref.tsdf))
    np.testing.assert_array_equal(np.asarray(blk.weight), np.asarray(ref.weight))
    np.testing.assert_array_equal(np.asarray(blk.color), np.asarray(ref.color))


def test_warped_matches_gather_near_axis():
    g, w = _fuse_both(np.eye(4, dtype=np.float32), faces=("+z",))
    _compare(g, w, min_ratio=0.9)

    # near the axis the along-ray scaling is <= sec(31 deg)^2 ~ 1.25, so
    # values themselves must also agree near the surface
    gt = np.asarray(tsdf_to_float(g.tsdf))
    wt = np.asarray(tsdf_to_float(w.tsdf))
    both = (np.asarray(g.weight) > 0) & (np.asarray(w.weight) > 0)
    near = both & (np.abs(gt) < 0.2)
    assert near.sum() > 500
    assert np.median(np.abs(gt[near] - wt[near])) < 0.06


def test_plane_surface_parity():
    """Discontinuity-free scene: the reconstructed surface (zero crossing)
    must match the gather path to well under a voxel — any affine/mip
    indexing bug in the kernel shifts it immediately."""
    n = np.array([0.25, 0.15, -1.0])
    n /= np.linalg.norm(n)
    scene = SyntheticScene(primitives=[plane(np.array([0.0, 0.0, 2.2]), n)])
    g, w = _fuse_both(np.eye(4, dtype=np.float32), faces=("+z",), scene=scene)
    gc = _crossing_depth(np.asarray(tsdf_to_float(g.tsdf)), np.asarray(g.weight) > 0)
    wc = _crossing_depth(np.asarray(tsdf_to_float(w.tsdf)), np.asarray(w.weight) > 0)
    both = np.isfinite(gc) & np.isfinite(wc)
    assert both.sum() > 3000
    d = np.abs(gc[both] - wc[both])
    assert np.percentile(d, 95) < 0.75, np.percentile(d, 95)
    assert np.median(d) < 0.25, np.median(d)
    # crossings found in (almost) the same columns
    assert (np.isfinite(gc) != np.isfinite(wc)).mean() < 0.05


def test_warped_full_coverage_tilted():
    """55 deg off-axis: the frustum straddles the +z and +x ownership cones.
    faces='auto' must cover it; the round-1 single +z face provably cannot."""
    T = _roty(55.0)
    g, w = _fuse_both(T, faces="auto")
    # at 55 deg much of the scene is viewed at grazing incidence, where
    # nearest-mip sampling flips more band-edge signs than head-on
    _compare(g, w, min_ratio=0.85, sign_min=0.85)
    auto_frac = (np.asarray(w.weight) > 0).sum() / (np.asarray(g.weight) > 0).sum()

    _, w_zonly = _fuse_both(T, faces=("+z",))
    zfrac = (np.asarray(w_zonly.weight) > 0).sum() / (np.asarray(g.weight) > 0).sum()
    assert zfrac < auto_frac - 0.15, f"+z-only {zfrac} vs auto {auto_frac}"


def test_warped_backward_camera():
    """~170 deg: camera inside the volume looking back along -z — the
    round-1 kernel dropped the entire frame here (dcz <= 0 everywhere on
    the +z face)."""
    scene = SyntheticScene(
        primitives=[
            sphere((0.25, 0.0, 1.5), 0.5),
            plane(np.array([0.0, 0.0, 0.7]), np.array([0.0, 0.0, 1.0])),
        ]
    )
    T = _roty(170.0, t=(0.0, 0.0, 3.3))
    g, w = _fuse_both(T, faces="auto", scene=scene)
    _compare(g, w, min_ratio=0.85)


def test_face_ownership_exclusive():
    """Fusing all six faces explicitly on a fresh volume updates every voxel
    at most once (exclusive cube ownership with z>y>x tie-break)."""
    T = _roty(40.0)
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(T, INTR)
    v2c = _vol2cam(T)
    vol = _warped_only_jit(
        jnp.asarray(depth_raw * 0.001), jnp.asarray(color), v2c.R, v2c.t,
        ALL_FACES,
    )
    wts = np.asarray(vol.weight)
    assert wts.max() == 1
    assert (wts > 0).sum() > 1000


def test_auto_equals_all_faces():
    """The traced face gating is conservative: skipped faces would not have
    updated any voxel, so 'auto' equals running all six sweeps."""
    T = _roty(40.0)
    scene = default_test_scene()
    depth_raw, color = scene.render_frame(T, INTR)
    depth_m, color = jnp.asarray(depth_raw * 0.001), jnp.asarray(color)
    v2c = _vol2cam(T)
    vol0 = create_volume(PARAMS.volume_dims)
    a = _warped_only_jit(depth_m, color, v2c.R, v2c.t, "auto")
    b = _warped_only_jit(depth_m, color, v2c.R, v2c.t, ALL_FACES)
    np.testing.assert_array_equal(np.asarray(a.tsdf), np.asarray(b.tsdf))
    np.testing.assert_array_equal(np.asarray(a.weight), np.asarray(b.weight))
    np.testing.assert_array_equal(np.asarray(a.color), np.asarray(b.color))
    # sanity: something was actually fused, and the gating skipped something
    assert int(np.asarray(a.weight).sum()) > 1000
    flags = faces_needed(v2c, INTR)
    assert not all(bool(v) for v in flags.values())


def test_color_band_parity():
    """Color is averaged only within the half-truncation band; compare the
    fused color against the gather path where both paths colored."""
    g, w = _fuse_both(np.eye(4, dtype=np.float32), faces=("+z",))
    gc = np.asarray(g.color)
    wc = np.asarray(w.color)
    both = (gc != 0) & (wc != 0)
    assert both.sum() > 300
    # channelwise compare (packed 0xRRGGBB)
    for shift in (16, 8, 0):
        a = (gc[both] >> shift) & 0xFF
        b = (wc[both] >> shift) & 0xFF
        match = np.abs(a.astype(int) - b.astype(int)) <= 8
        assert match.mean() > 0.9, f"shift {shift}: {match.mean()}"


def test_build_face_pallas_matches_jnp():
    """The Pallas stack builder (facewarp._build_face_pallas, production
    TPU path) must reproduce the jnp gather + mip stack bit-exactly —
    every mip pixel samples the camera frame at its strided face ray, so
    the two paths run identical arithmetic."""
    from kinfu_tpu.ops.facewarp import build_face

    scene = default_test_scene()
    frames = {f.name: f for f in face_frames()}
    dims = (PARAMS.volume_dims[0],) * 3
    vs = PARAMS.voxel_size
    for deg, fname in ((0.0, "+z"), (35.0, "+z"), (55.0, "+x"), (180.0, "-z")):
        T = _roty(deg, t=(0.1, -0.05, 0.2))
        depth_mm, color = scene.render_frame(T, INTR)
        depth_m = jnp.asarray(depth_mm) * 1e-3
        color = jnp.asarray(color)
        v2c = _vol2cam(T)
        kw = dict(
            frame=frames[fname], dims=dims, voxel_size=vs
        )
        ref = build_face(depth_m, color, v2c, INTR, SPEC, mode="jnp", **kw)
        got = build_face(
            depth_m, color, v2c, INTR, SPEC, mode="interpret", **kw
        )
        np.testing.assert_array_equal(
            np.asarray(got.range_mm), np.asarray(ref.range_mm),
            err_msg=f"range mismatch at {deg} deg face {fname}",
        )
        np.testing.assert_array_equal(
            np.asarray(got.color), np.asarray(ref.color),
            err_msg=f"color mismatch at {deg} deg face {fname}",
        )
        np.testing.assert_allclose(
            np.asarray(got.centre), np.asarray(ref.centre)
        )


def test_slab_gate_host_mirror_is_superset():
    """The work-list builder (host, full-Y bounds) and the kernel's slab
    gate share _slab_geometry; this pins two properties future edits must
    keep: (a) vectorized-over-z evaluation equals per-scalar evaluation,
    (b) the full-Y gate is a SUPERSET of every y-block's gate — a slab any
    block would fuse is always on the work list."""
    from kinfu_tpu.ops.pallas_integrate import _slab_geometry

    spec = SPEC
    Zp = Yp = Xp = 128
    prm = (
        jnp.float32(0.83), jnp.float32(1.12), jnp.float32(-0.41),  # centre
        jnp.float32(3.0 / 128), jnp.float32(3.0 / 128), jnp.float32(3.0 / 128),
        jnp.float32(spec.focal), jnp.float32(spec.centre),
        jnp.float32(12.3), jnp.float32(2600.0),  # trunc_mm, r_max_mm
    )
    zf = jnp.arange(Zp, dtype=jnp.float32)
    vec = np.asarray(
        _slab_geometry(spec, zf, prm, Xp, jnp.float32(0.0),
                       jnp.float32(Yp - 1))["slab_do"]
    )
    scl = np.array(
        [
            bool(
                _slab_geometry(
                    spec, jnp.float32(z), prm, Xp, jnp.float32(0.0),
                    jnp.float32(Yp - 1)
                )["slab_do"]
            )
            for z in range(Zp)
        ]
    )
    np.testing.assert_array_equal(vec, scl)
    assert vec.any()  # the scenario must exercise both gate outcomes
    assert not vec.all()

    YB = 32
    for yb in range(Yp // YB):
        blk = np.asarray(
            _slab_geometry(
                spec, zf, prm, Xp, jnp.float32(yb * YB),
                jnp.float32(yb * YB + YB - 1)
            )["slab_do"]
        )
        assert not np.any(blk & ~vec), f"block {yb} fuses a slab not listed"
