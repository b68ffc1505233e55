"""Host-side session wrapper — the API a reference user expects.

Maps one-to-one onto `kf::kinectfusion` (kinectfusion.h:31-73):

  reference                      here
  -------------------------------------------------------
  pipeline(color, depth)         KinFuSession.pipeline(color, depth)
  reset()                        KinFuSession.reset()
  getRenderMap(PHONG|NORMAL)     KinFuSession.get_render_map(...)
  extracePointcloud()            KinFuSession.extract_pointcloud()
  savePointcloud(path)           KinFuSession.save_pointcloud(path)
  getCurCameraPose()             KinFuSession.get_cur_camera_pose()
  frame_count / pose_record      KinFuSession.frame_count / .pose_record

Everything device-side happens in jitted functions with donated state; this
class only keeps the pose history and frame counter on the host.
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics
from kinfu_tpu.geometry.se3 import pose_from_matrix
from kinfu_tpu.pipeline.kinfu import init_state, make_step_fn, _volume_pose
from kinfu_tpu.pipeline.render import render_normals, render_phong
from kinfu_tpu.volume.extract import extract_points


class KinFuSession:
    PHONG = "phong"
    NORMAL = "normal"

    def __init__(self, intr: Intrinsics, params: Optional[KinFuParams] = None):
        self.intr = intr
        self.params = params or KinFuParams()
        self.state = init_state(self.params, intr)
        self._step = make_step_fn(self.params, intr)
        self.pose_record: List[np.ndarray] = [np.eye(4, dtype=np.float32)]
        self.frame_count = 1
        self.frame_times_ms: List[float] = []
        self.last_icp_inliers = 0
        self._points_cache: Optional[np.ndarray] = None

        @functools.partial(jax.jit, static_argnames=("mode",))
        def _render(state, mode):
            if mode == self.NORMAL:
                return render_normals(state.model_nmaps[0])
            return render_phong(
                state.pose.t, state.model_vmaps[0], state.model_nmaps[0]
            )

        self._render = _render

        @jax.jit
        def _extract(state):
            return extract_points(state.vol, _volume_pose(self.params), self.params)

        self._extract = _extract

    # ------------------------------------------------------------------
    def pipeline(self, color_rgb: np.ndarray, depth_mm: np.ndarray) -> bool:
        """Process one frame; returns tracking success.

        Parity: kinectfusion::pipeline (kinectfusion.cpp:78-131), including
        the per-frame wall-clock log.
        """
        t0 = time.perf_counter()
        depth = jnp.asarray(depth_mm, dtype=jnp.float32)
        color = jnp.asarray(color_rgb, dtype=jnp.uint8)
        self.state, out = self._step(self.state, depth, color)
        pose_m = np.asarray(out.pose_matrix)
        ok = bool(out.tracking_ok)
        self.last_icp_inliers = int(out.icp_inliers)
        if ok:
            if self.frame_count >= 2:
                self.pose_record.append(pose_m)
            self.frame_count += 1
        else:
            # tracking fail -> the jitted step already reset device state
            self.pose_record = [np.eye(4, dtype=np.float32)]
            self.frame_count = 1
        ms = (time.perf_counter() - t0) * 1e3
        self.frame_times_ms.append(ms)
        return ok

    def reset(self) -> None:
        self.state = init_state(self.params, self.intr)
        self.pose_record = [np.eye(4, dtype=np.float32)]
        self.frame_count = 1

    def get_render_map(self, mode: str = PHONG) -> np.ndarray:
        return np.asarray(self._render(self.state, mode))

    def get_cur_camera_pose(self) -> np.ndarray:
        return self.pose_record[-1]

    def extract_pointcloud(self) -> np.ndarray:
        pts, count = self._extract(self.state)
        n = int(count)
        self._points_cache = np.asarray(pts[:n])
        return self._points_cache

    def save_pointcloud(self, path: str) -> None:
        from kinfu_tpu.io.ply import write_ply

        pts = (
            self._points_cache
            if self._points_cache is not None
            else self.extract_pointcloud()
        )
        write_ply(path, pts)

    def save_poses(self, path: str) -> None:
        """Write the trajectory in the reference's poses.txt format
        (main.cpp:95-98 / doc/poses.txt)."""
        from kinfu_tpu.io.poses import write_poses_reference_format

        write_poses_reference_format(path, self.pose_record)
