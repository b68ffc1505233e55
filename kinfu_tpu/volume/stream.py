"""Streaming (moving) TSDF volume: shift the grid to follow the camera.

No reference equivalent: the reference's world is one 3 m cube fixed in
space forever (kinectfusion.cpp:181-184) — walk out of it and fusion just
stops. Here the dense grid recenters itself by whole voxels when the camera
nears a boundary: content rolls inside the arrays, the newly-exposed slabs
zero (voxels that scroll off the far side are discarded — stitching them to
disk is the natural extension), and the volume's world-space origin advances
by the same amount, so fused geometry stays world-consistent.

Everything is traced (dynamic shifts via jnp.roll + iota masks), so the
shift lives inside the jitted per-frame step with no host round-trip.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from kinfu_tpu.volume.tsdf import TSDFVolume


def _shift_axis(a: jnp.ndarray, s: jnp.ndarray, axis: int) -> jnp.ndarray:
    """new[k] = old[k + s] (zeros where out of range). s is a traced int32
    scalar; implemented as roll + mask so shapes stay static."""
    n = a.shape[axis]
    idx_shape = [1, 1, 1]
    idx_shape[axis] = n
    idx = jnp.arange(n).reshape(idx_shape)
    valid = (idx + s >= 0) & (idx + s < n)
    rolled = jnp.roll(a, -s, axis=axis)
    return jnp.where(valid, rolled, jnp.zeros_like(a))


def shift_volume(vol: TSDFVolume, shift_xyz: jnp.ndarray) -> TSDFVolume:
    """Shift volume content by whole voxels. shift_xyz = (sx, sy, sz) int32:
    the volume origin moves +s voxels along each world axis, so content
    moves -s inside the arrays. Arrays are [Z, Y, X]."""
    out = vol
    for axis_arr, comp in ((2, 0), (1, 1), (0, 2)):
        s = shift_xyz[comp]
        out = TSDFVolume(
            tsdf=_shift_axis(out.tsdf, s, axis_arr),
            weight=_shift_axis(out.weight, s, axis_arr),
            color=_shift_axis(out.color, s, axis_arr),
        )
    return out


def camera_centering_shift(
    cam_pos_vol: jnp.ndarray,
    dims_xyz: Tuple[int, int, int],
    voxel_size: Tuple[float, float, float],
    margin_frac: float = 0.25,
) -> jnp.ndarray:
    """Whole-voxel shift keeping the camera inside the volume's central box.

    cam_pos_vol: camera position in the *volume* frame (metres). When a
    coordinate leaves [margin, range - margin], shift by the excess
    (rounded to voxels) so it lands back on the nearest margin."""
    out = []
    for c in range(3):
        rng = dims_xyz[c] * voxel_size[c]
        lo = margin_frac * rng
        hi = rng - lo
        p = cam_pos_vol[c]
        excess = jnp.where(p < lo, p - lo, jnp.where(p > hi, p - hi, 0.0))
        out.append(jnp.round(excess / voxel_size[c]).astype(jnp.int32))
    return jnp.stack(out)
