"""The per-session state pytree and step outputs.

The reference mutates two `Frame` objects, a TSDF volume, and a pose vector
in place (kinectfusion.h:59-73). Here all of it is one immutable pytree that
a jitted step consumes and returns (with buffer donation, so the volume
updates in place at the XLA level without reallocating the ~1 GiB state).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from kinfu_tpu.geometry.se3 import Pose
from kinfu_tpu.volume.tsdf import TSDFVolume


class KinFuState(NamedTuple):
    vol: TSDFVolume
    #: world-from-camera pose (pose_record.back() in the reference)
    pose: Pose
    #: raycast-predicted model pyramids in the camera frame of `pose`
    #: (the reference's pframe vmap/nmap, types.hpp:30-80)
    model_vmaps: Tuple[jnp.ndarray, ...]
    model_nmaps: Tuple[jnp.ndarray, ...]
    #: 1 before the first frame is fused (bootstrap), like
    #: kinectfusion.cpp:84-93
    frame_count: jnp.ndarray  # int32 scalar


class StepOutput(NamedTuple):
    #: world-from-camera pose after this frame, 4x4
    pose_matrix: jnp.ndarray
    #: False when ICP failed this frame (the engine auto-reset, matching
    #: kinectfusion.cpp:97-102)
    tracking_ok: jnp.ndarray
    #: ICP inlier count at the finest level (diagnostics; no reference
    #: equivalent — the reference has no metrics at all, SURVEY.md section 5)
    icp_inliers: jnp.ndarray
