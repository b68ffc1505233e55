"""Checkpoint / resume for a fusion session.

The reference never serialises the volume; its only artifacts are the pose
dump at exit and on-demand PLY export (main.cpp:95-98, kinectfusion.cpp:
148-166), so a crash loses the whole map. Here the full session state —
TSDF/weight/color arrays, model maps, pose history, frame index, and the
exact config — round-trips through one compressed npz, enabling resume and
the multi-host restart story (SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Tuple

import numpy as np

from kinfu_tpu.config import KinFuParams
from kinfu_tpu.geometry.intrinsics import Intrinsics

_FORMAT_VERSION = 1


def save_checkpoint(path: str, session) -> None:
    """Serialise a KinFuSession (pipeline/session.py) to `path` (.npz)."""
    state = session.state
    streaming = bool(getattr(session, "streaming", False))
    extra = {}
    if streaming:
        extra["origin_vox"] = np.asarray(state.origin_vox)
        state = state.kinfu
    arrays = {
        **extra,
        "tsdf": np.asarray(state.vol.tsdf),
        "weight": np.asarray(state.vol.weight),
        "color": np.asarray(state.vol.color),
        "pose_R": np.asarray(state.pose.R),
        "pose_t": np.asarray(state.pose.t),
        "frame_count_dev": np.asarray(state.frame_count),
        "pose_record": np.stack(session.pose_record, axis=0),
    }
    for i, (v, n) in enumerate(zip(state.model_vmaps, state.model_nmaps)):
        arrays[f"model_v{i}"] = np.asarray(v)
        arrays[f"model_n{i}"] = np.asarray(n)
    meta = {
        "version": _FORMAT_VERSION,
        "frame_count": session.frame_count,
        "levels": len(state.model_vmaps),
        "params": dataclasses.asdict(session.params),
        "intrinsics": dataclasses.asdict(session.intr),
        "streaming": streaming,
    }
    tmp = path + ".tmp"
    np.savez_compressed(tmp, meta=json.dumps(meta), **arrays)
    # numpy appends .npz to the temp name
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path: str):
    """Rebuild a KinFuSession from a checkpoint written by save_checkpoint."""
    import jax.numpy as jnp

    from kinfu_tpu.geometry.se3 import Pose
    from kinfu_tpu.pipeline.session import KinFuSession
    from kinfu_tpu.pipeline.state import KinFuState

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        params = KinFuParams(**meta["params"])
        intr = Intrinsics(**meta["intrinsics"])
        from kinfu_tpu.volume.tsdf import TSDFVolume

        vol = TSDFVolume(
            tsdf=jnp.asarray(z["tsdf"]),
            weight=jnp.asarray(z["weight"]),
            # int32 since r5 (volume/tsdf.py); older checkpoints stored
            # uint32 — packed RGB <= 0x00FFFFFF, so the cast is lossless
            color=jnp.asarray(np.asarray(z["color"]).astype(np.int32)),
        )
        levels = meta["levels"]
        vmaps = tuple(jnp.asarray(z[f"model_v{i}"]) for i in range(levels))
        nmaps = tuple(jnp.asarray(z[f"model_n{i}"]) for i in range(levels))
        state = KinFuState(
            vol=vol,
            pose=Pose(jnp.asarray(z["pose_R"]), jnp.asarray(z["pose_t"])),
            model_vmaps=vmaps,
            model_nmaps=nmaps,
            frame_count=jnp.asarray(z["frame_count_dev"]),
        )
        pose_record = [T for T in z["pose_record"]]
        frame_count = int(meta["frame_count"])
        streaming = bool(meta.get("streaming", False))
        origin_vox = z["origin_vox"] if streaming else None

    session = KinFuSession(intr, params, streaming=streaming)
    if streaming:
        from kinfu_tpu.pipeline.streaming import StreamingState

        session.state = StreamingState(kinfu=state, origin_vox=jnp.asarray(origin_vox))
    else:
        session.state = state
    session.pose_record = pose_record
    session.frame_count = frame_count
    return session
