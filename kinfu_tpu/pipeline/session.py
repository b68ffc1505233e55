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

    def __init__(
        self,
        intr: Intrinsics,
        params: Optional[KinFuParams] = None,
        relocalize: bool = False,
        streaming: bool = False,
        pose_graph: bool = False,
        loop_config=None,
    ):
        self.intr = intr
        self.params = params or KinFuParams()
        self.streaming = streaming
        if streaming and relocalize:
            raise ValueError("streaming + relocalize not supported together")
        if streaming:
            # camera-following moving volume (pipeline/streaming.py) — the
            # reference's grid is fixed in space (kinectfusion.cpp:181-184)
            from kinfu_tpu.pipeline.streaming import (
                init_streaming_state,
                make_streaming_step_fn,
            )

            self.state = init_streaming_state(self.params, intr)
            self._step = make_streaming_step_fn(self.params, intr)
        else:
            self.state = init_state(self.params, intr)
            # with relocalization on, tracking failure keeps the map (the
            # relocalizer owns recovery); otherwise reference-parity auto-reset
            self._step = make_step_fn(self.params, intr, auto_reset=not relocalize)
        self.relocalizer = None
        self.keyframes = None
        if relocalize:
            from kinfu_tpu.mapping.keyframes import KeyframeStore
            from kinfu_tpu.mapping.relocalize import Relocalizer

            self.relocalizer = Relocalizer(num_pixels=intr.width * intr.height)
            self.keyframes = KeyframeStore()

            from kinfu_tpu.pipeline.kinfu import relocalize_step

            self._reloc_step = jax.jit(
                functools.partial(
                    relocalize_step, params=self.params, intr=intr
                )
            )
        # ---- pose graph / loop closure (mapping/loop_closure.py) ----
        self.pose_graph = pose_graph and not streaming
        self.loop_closures: List[dict] = []
        if self.pose_graph:
            from kinfu_tpu.mapping.keyframes import KeyframeStore
            from kinfu_tpu.mapping.loop_closure import LoopClosureConfig
            from kinfu_tpu.frontend.maps import build_measurement_pyramid
            from kinfu_tpu.tracking.icp import rigid_icp
            from kinfu_tpu.geometry.se3 import pose_matrix as _pm

            self.loop_config = loop_config or LoopClosureConfig()
            self.pg_keyframes = KeyframeStore(
                min_translation=self.loop_config.kf_min_translation,
                min_rotation_deg=self.loop_config.kf_min_rotation_deg,
            )
            self._pg_cooldown = 0
            p = self.params

            @jax.jit
            def _measurement_pyr(depth):
                _, vm, nm = build_measurement_pyramid(
                    depth,
                    intr,
                    pyramid_height=p.pyramid_height,
                    bfilter_kernel_size=p.bfilter_kernel_size,
                    bfilter_color_sigma=p.bfilter_color_sigma,
                    bfilter_spatial_sigma=p.bfilter_spatial_sigma,
                    depth_scale=p.depth_scale,
                    max_dist=p.dfilter_dist,
                    normal_disc_threshold=p.normal_disc_threshold,
                )
                return tuple(vm), tuple(nm)

            @jax.jit
            def _closure_icp(cur_v, cur_n, kf_v, kf_n, z0):
                # seed with the drifted relative estimate z0 = T_kf^-1 T_cur
                # (ICP's 15 mm gate cannot associate across the raw revisit
                # offset): pre-transform the current maps by z0, estimate
                # the residual increment, compose Z = inc @ z0. Zero-normal
                # (invalid) pixels stay masked under the rotation.
                R0, t0 = z0[:3, :3], z0[:3, 3]
                cv = tuple(
                    jnp.einsum("ij,hwj->hwi", R0, v) + t0 for v in cur_v
                )
                cn = tuple(jnp.einsum("ij,hwj->hwi", R0, n) for n in cur_n)
                res = rigid_icp(cv, cn, kf_v, kf_n, intr, p)
                return _pm(res.pose) @ z0, res.ok, res.num_inliers

            self._measurement_pyr = _measurement_pyr
            self._closure_icp = _closure_icp

            # ---- post-closure map rebuild (map consistency) ----
            # close_loop corrects the TRAJECTORY; without re-integration the
            # TSDF keeps the drifted geometry, so raycast tracking,
            # extraction and PLY export would disagree with the corrected
            # poses. These jitted helpers re-fuse the stored keyframe
            # frames into a reset volume at their corrected poses.
            from kinfu_tpu.geometry.se3 import compose, inverse
            from kinfu_tpu.pipeline.kinfu import _model_pyramid
            from kinfu_tpu.volume.integrate import integrate as _integrate_fn
            from kinfu_tpu.volume.raycast import raycast as _raycast_fn
            from kinfu_tpu.volume.tsdf import reset_volume

            vol_pose = _volume_pose(p)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def _kf_integrate(vol, depth, color, pose_m):
                dmaps, _, _ = build_measurement_pyramid(
                    depth,
                    intr,
                    pyramid_height=p.pyramid_height,
                    bfilter_kernel_size=p.bfilter_kernel_size,
                    bfilter_color_sigma=p.bfilter_color_sigma,
                    bfilter_spatial_sigma=p.bfilter_spatial_sigma,
                    depth_scale=p.depth_scale,
                    max_dist=p.dfilter_dist,
                    normal_disc_threshold=p.normal_disc_threshold,
                )
                pose = pose_from_matrix(pose_m)
                vol2cam = compose(inverse(pose), vol_pose)
                return _integrate_fn(vol, dmaps[0], color, vol2cam, intr, p)

            @jax.jit
            def _model_from_vol(vol, pose_m):
                pose = pose_from_matrix(pose_m)
                cam2vol = compose(inverse(vol_pose), pose)
                rv, rn = _raycast_fn(vol, cam2vol, intr, p)
                return _model_pyramid(rv, rn, p.pyramid_height)

            self._kf_integrate = _kf_integrate
            self._model_from_vol = _model_from_vol
            self._reset_vol = jax.jit(reset_volume, donate_argnums=(0,))

        self.pose_record: List[np.ndarray] = [np.eye(4, dtype=np.float32)]
        self.frame_count = 1
        self.frame_times_ms: List[float] = []
        self.last_icp_inliers = 0
        self._points_cache: Optional[np.ndarray] = None

        @functools.partial(jax.jit, static_argnames=("mode",))
        def _render(state, mode):
            ks = state.kinfu if streaming else state
            if mode == self.NORMAL:
                return render_normals(ks.model_nmaps[0])
            return render_phong(ks.pose.t, ks.model_vmaps[0], ks.model_nmaps[0])

        self._render = _render

        @jax.jit
        def _extract(state):
            if streaming:
                from kinfu_tpu.pipeline.streaming import _vol_pose_dyn

                return extract_points(
                    state.kinfu.vol,
                    _vol_pose_dyn(self.params, state.origin_vox),
                    self.params,
                )
            return extract_points(state.vol, _volume_pose(self.params), self.params)

        self._extract = _extract

        @jax.jit
        def _extract_colored(state):
            from kinfu_tpu.volume.extract import extract_points_colored

            if streaming:
                from kinfu_tpu.pipeline.streaming import _vol_pose_dyn

                return extract_points_colored(
                    state.kinfu.vol,
                    _vol_pose_dyn(self.params, state.origin_vox),
                    self.params,
                )
            return extract_points_colored(
                state.vol, _volume_pose(self.params), self.params
            )

        self._extract_colored = _extract_colored

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

        if not ok and self.relocalizer is not None:
            ok, pose_m = self._try_relocalize(depth, color)

        if ok:
            if self.frame_count >= 2:
                self.pose_record.append(pose_m)
            self.frame_count += 1
            if self.keyframes is not None:
                self.keyframes.maybe_add(self.frame_count, pose_m)
            if self.pose_graph:
                pose_m = self._pose_graph_update(depth, color, pose_m)
        elif self.relocalizer is None:
            # reference-parity: the jitted step already reset device state
            self.pose_record = [np.eye(4, dtype=np.float32)]
            self.frame_count = 1
            self._clear_pose_graph()
        ms = (time.perf_counter() - t0) * 1e3
        self.frame_times_ms.append(ms)
        return ok

    def _clear_pose_graph(self) -> None:
        """A map wipe invalidates every keyframe (their poses live in the
        discarded coordinate frame) — clear them or a later closure would
        'correct' the fresh trajectory against stale geometry."""
        if self.pose_graph:
            self.pg_keyframes.keyframes.clear()
            self._pg_cooldown = 0

    def _pose_graph_update(self, depth, color, pose_m: np.ndarray) -> np.ndarray:
        """Keyframe bookkeeping + loop-closure detection/correction for one
        tracked frame. Returns the (possibly corrected) current pose."""
        from kinfu_tpu.geometry.se3 import pose_from_matrix
        from kinfu_tpu.mapping.loop_closure import close_loop, find_candidate

        ks = self.state.kinfu if self.streaming else self.state
        cur_index = len(self.pose_record) - 1
        if self._pg_cooldown > 0:
            self._pg_cooldown -= 1
        else:
            cand = find_candidate(self.pg_keyframes, pose_m, self.loop_config)
            if cand is not None:
                kf = self.pg_keyframes.keyframes[cand]
                cur_v, cur_n = self._measurement_pyr(depth)
                z0 = np.linalg.inv(
                    kf.pose.astype(np.float64)
                ) @ pose_m.astype(np.float64)
                z, ok, ninl = self._closure_icp(
                    cur_v,
                    cur_n,
                    tuple(jnp.asarray(v) for v in kf.vmaps),
                    tuple(jnp.asarray(n) for n in kf.nmaps),
                    jnp.asarray(z0, jnp.float32),
                )
                thresh = self.loop_config.min_inlier_frac * (
                    self.intr.width * self.intr.height
                )
                if bool(ok) and int(ninl) >= thresh:
                    corrected, new_cur, rms = close_loop(
                        self.pg_keyframes,
                        self.pose_record,
                        cand,
                        pose_m,
                        np.asarray(z),
                        self.loop_config,
                    )
                    self.pose_record = corrected
                    pose_m = new_cur
                    self.pose_record[cur_index] = new_cur
                    if self.loop_config.reintegrate_on_closure:
                        # the MAP adopts the correction too: re-fuse the
                        # stored keyframe frames at their optimized poses
                        # (close_loop already updated kf.pose in place)
                        self._rebuild_map(depth, color, new_cur)
                    else:
                        self.state = (
                            self.state._replace(
                                kinfu=ks._replace(
                                    pose=pose_from_matrix(jnp.asarray(new_cur))
                                )
                            )
                            if self.streaming
                            else self.state._replace(
                                pose=pose_from_matrix(jnp.asarray(new_cur))
                            )
                        )
                    self.loop_closures.append(
                        {
                            "frame": cur_index,
                            "keyframe": int(kf.index),
                            "inliers": int(ninl),
                            "rms": rms,
                        }
                    )
                    self._pg_cooldown = self.loop_config.cooldown_frames

        self.pg_keyframes.maybe_add(
            cur_index,
            pose_m,
            vmaps=tuple(np.asarray(v) for v in ks.model_vmaps),
            nmaps=tuple(np.asarray(n) for n in ks.model_nmaps),
            depth=np.asarray(depth),
            color=np.asarray(color),
        )
        return pose_m

    def _rebuild_map(self, depth, color, new_cur: np.ndarray) -> None:
        """Re-integrate the stored keyframe frames (plus the current frame)
        into a reset volume at their corrected poses, then rebuild the model
        prediction maps by raycasting from the corrected current pose — so
        post-closure tracking, extraction and PLY export are consistent with
        the corrected trajectory. pose_graph excludes streaming, so
        self.state is a plain KinFuState."""
        ks = self.state
        vol = self._reset_vol(ks.vol)
        cur = jnp.asarray(new_cur, jnp.float32)
        for kf in self.pg_keyframes.keyframes:
            if kf.depth is None:
                continue
            vol = self._kf_integrate(
                vol,
                jnp.asarray(kf.depth, jnp.float32),
                jnp.asarray(kf.color, jnp.uint8),
                jnp.asarray(kf.pose, jnp.float32),
            )
        vol = self._kf_integrate(
            vol,
            jnp.asarray(depth, jnp.float32),
            jnp.asarray(color, jnp.uint8),
            cur,
        )
        mv, mn = self._model_from_vol(vol, cur)
        self.state = ks._replace(
            vol=vol,
            model_vmaps=mv,
            model_nmaps=mn,
            pose=pose_from_matrix(cur),
        )

    def _try_relocalize(self, depth, color):
        """Attempt to re-acquire the kept map from keyframe seed poses;
        wipe everything only after the relocalizer gives up (contrast with
        the reference's immediate wipe, kinectfusion.cpp:97-102)."""
        from kinfu_tpu.mapping.relocalize import TrackingStatus

        status = self.relocalizer.on_frame(False, self.last_icp_inliers)
        if status is TrackingStatus.LOST and len(self.keyframes or []) > 0:
            seed = self.keyframes.nearest(self.pose_record[-1]).pose
            self.state, out = self._reloc_step(self.state, depth, color, seed)
            ok = bool(out.tracking_ok)
            self.last_icp_inliers = int(out.icp_inliers)
            if ok:
                status = self.relocalizer.on_frame(True, self.last_icp_inliers)
                if status is TrackingStatus.OK:
                    return True, np.asarray(out.pose_matrix)
            return False, np.asarray(out.pose_matrix)
        if status is TrackingStatus.RESET:
            self.reset()
        return False, np.eye(4, dtype=np.float32)

    def reset(self) -> None:
        if self.streaming:
            from kinfu_tpu.pipeline.streaming import init_streaming_state

            self.state = init_streaming_state(self.params, self.intr)
        else:
            self.state = init_state(self.params, self.intr)
        self.pose_record = [np.eye(4, dtype=np.float32)]
        self.frame_count = 1
        self._clear_pose_graph()

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

    def extract_pointcloud_colored(self):
        """(points [n,3], colors u8 [n,3]) — coloured variant of
        extract_pointcloud (reference extracts xyz only)."""
        pts, cols, count = self._extract_colored(self.state)
        n = int(count)
        return np.asarray(pts[:n]), np.asarray(cols[:n])

    def render_3d(self, **kwargs) -> np.ndarray:
        """Offline 3D overview (cloud + cube + trajectory + frustum) — the
        headless analogue of the reference's cv::viz window
        (main.cpp:82-86, doc/3D.png). kwargs pass through to
        viz3d.render_3d_view (eye, target, width, height, ...)."""
        from kinfu_tpu.pipeline.viz3d import render_3d_view

        pts, cols = self.extract_pointcloud_colored()
        if self.streaming:
            from kinfu_tpu.pipeline.streaming import _vol_pose_dyn
            from kinfu_tpu.geometry.se3 import pose_matrix

            vol_pose_m = np.asarray(
                pose_matrix(_vol_pose_dyn(self.params, self.state.origin_vox))
            )
        else:
            vol_pose_m = np.asarray(self.params.volume_pose)
        return render_3d_view(
            pts,
            colors=cols if len(cols) else None,
            trajectory=self.pose_record,
            cur_pose=self.pose_record[-1],
            volume_pose=vol_pose_m,
            volume_extent=self.params.volume_range,
            **kwargs,
        )

    def save_3d(self, path: str, **kwargs) -> None:
        from kinfu_tpu.io.images import write_color_png

        write_color_png(path, self.render_3d(**kwargs))

    def save_poses(self, path: str) -> None:
        """Write the trajectory in the reference's poses.txt format
        (main.cpp:95-98 / doc/poses.txt)."""
        from kinfu_tpu.io.poses import write_poses_reference_format

        write_poses_reference_format(path, self.pose_record)
