"""Pinhole intrinsics with pyramid-level scaling.

Static (Python-float) configuration: width/height must be compile-time
constants for XLA, and fx/fy/cx/cy fold into the jitted graph as literals.

Parity: the half-pixel pyramid convention of the reference,
``c' = (c + 0.5) * 0.5^l - 0.5`` with ``w' = w >> l`` (types.hpp:18-28).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    #: depth scale from the dataset's intr.txt 5th value; informational —
    #: the pipeline scales depth with KinFuParams.depth_scale.
    depth_scale: float = 1.0

    def level(self, level: int) -> "Intrinsics":
        if level == 0:
            return self
        s = 0.5**level
        return Intrinsics(
            width=self.width >> level,
            height=self.height >> level,
            fx=self.fx * s,
            fy=self.fy * s,
            cx=(self.cx + 0.5) * s - 0.5,
            cy=(self.cy + 0.5) * s - 0.5,
            depth_scale=self.depth_scale,
        )

    # ---- jnp ops (broadcast over pixels/points) ----
    def project(self, pts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Camera-frame points [..., 3] -> nearest-integer pixel (u, v).

        Parity: Intrs::proj rounds to nearest (device_utils.cuh:15-21).
        """
        z = pts[..., 2]
        u = jnp.rint(pts[..., 0] / z * self.fx + self.cx).astype(jnp.int32)
        v = jnp.rint(pts[..., 1] / z * self.fy + self.cy).astype(jnp.int32)
        return u, v

    def backproject(self, u: jnp.ndarray, v: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        """Pixel + depth -> camera-frame point (device_utils.cuh:22-27)."""
        x = z * (u - self.cx) / self.fx
        y = z * (v - self.cy) / self.fy
        return jnp.stack([x, y, jnp.broadcast_to(z, x.shape)], axis=-1)

    def pixel_rays(self) -> jnp.ndarray:
        """[H, W, 3] unit-depth back-projected ray directions (camera frame)."""
        v = jnp.arange(self.height, dtype=jnp.float32)[:, None]
        u = jnp.arange(self.width, dtype=jnp.float32)[None, :]
        x = (u - self.cx) / self.fx
        y = (v - self.cy) / self.fy
        x, y = jnp.broadcast_to(x, (self.height, self.width)), jnp.broadcast_to(
            y, (self.height, self.width)
        )
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
