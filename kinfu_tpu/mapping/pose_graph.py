"""Pose-graph optimization over keyframe poses.

No reference equivalent: the reference keeps every pose in an unbounded
vector with no drift correction (kinectfusion.h:59; SURVEY.md section 5
"long-context" call-out names the keyframe pose-graph layer as the new
framework's counterpart).

Model: nodes are world-from-keyframe poses; an edge (i, j, Z_ij) constrains
the relative pose with measurement Z_ij ~ T_i^-1 T_j. The residual is the
right-invariant error  r_ij = log(Z_ij^-1 (T_i^-1 T_j))  in R^6
(rotation-vector ++ translation). Gauss-Newton with node-0 gauge fixing;
the Jacobian comes from jax.jacfwd over per-node local increments
(T_k <- T_k * Exp(dx_k)), and the normal equations solve densely — exact
and plenty fast for the few-hundred-keyframe graphs a room-scale session
produces (dense 6N x 6N solve; a sparse backend can slot in later without
changing the interface).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kinfu_tpu.geometry.se3 import rodrigues, rotvec_from_matrix


class PoseGraphEdge(NamedTuple):
    i: int
    j: int
    #: measured T_i^-1 T_j, [4,4]
    z: np.ndarray
    #: scalar information weight (rotation block also scaled by this)
    weight: float = 1.0


def _exp6(x: jnp.ndarray) -> jnp.ndarray:
    """[...,6] (rotvec ++ t) -> [...,4,4]; the cv::Affine increment
    convention used everywhere in this codebase (se3.py::se3_increment)."""
    R = rodrigues(x[..., :3])
    T = jnp.zeros(x.shape[:-1] + (4, 4), x.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(x[..., 3:])
    T = T.at[..., 3, 3].set(1.0)
    return T


def _log6(T: jnp.ndarray) -> jnp.ndarray:
    """[...,4,4] -> [...,6] inverse of _exp6."""
    return jnp.concatenate(
        [rotvec_from_matrix(T[..., :3, :3]), T[..., :3, 3]], axis=-1
    )


def _residuals(dx: jnp.ndarray, poses: jnp.ndarray, ii, jj, zinv, w) -> jnp.ndarray:
    """Stacked weighted residuals [E, 6] at local increments dx [N, 6]."""
    T = poses @ _exp6(dx)
    Ti = T[ii]
    Tj = T[jj]
    # T_i^-1 T_j without forming inverses explicitly
    Ri = jnp.swapaxes(Ti[..., :3, :3], -1, -2)
    rel_R = Ri @ Tj[..., :3, :3]
    rel_t = jnp.einsum("eab,eb->ea", Ri, Tj[..., :3, 3] - Ti[..., :3, 3])
    rel = jnp.zeros_like(Ti)
    rel = rel.at[..., :3, :3].set(rel_R)
    rel = rel.at[..., :3, 3].set(rel_t)
    rel = rel.at[..., 3, 3].set(1.0)
    r = _log6(zinv @ rel)
    return r * w[:, None]


def optimize_pose_graph(
    poses: Sequence[np.ndarray],
    edges: Sequence[PoseGraphEdge],
    iterations: int = 10,
    damping: float = 1e-6,
) -> Tuple[List[np.ndarray], float]:
    """Gauss-Newton pose-graph optimization.

    Node 0 is held fixed (gauge). Returns (optimized poses, final RMS
    residual)."""
    N = len(poses)
    if N == 0:
        return [], 0.0
    P = jnp.asarray(np.stack([np.asarray(p, np.float32) for p in poses]))
    ii = jnp.asarray([e.i for e in edges], jnp.int32)
    jj = jnp.asarray([e.j for e in edges], jnp.int32)
    zinv = jnp.asarray(
        np.stack([np.linalg.inv(np.asarray(e.z, np.float64)).astype(np.float32)
                  for e in edges])
    )
    w = jnp.asarray([np.sqrt(e.weight) for e in edges], jnp.float32)

    res_fn = functools.partial(_residuals, ii=ii, jj=jj, zinv=zinv, w=w)
    jac_fn = jax.jit(jax.jacfwd(lambda dx, P: res_fn(dx, P).reshape(-1)))
    val_fn = jax.jit(lambda dx, P: res_fn(dx, P).reshape(-1))

    zero = jnp.zeros((N, 6), jnp.float32)
    for _ in range(iterations):
        r = val_fn(zero, P)
        J = jac_fn(zero, P).reshape(-1, N * 6)
        # gauge: drop node 0's columns
        Jf = J[:, 6:]
        H = Jf.T @ Jf + damping * jnp.eye(6 * (N - 1))
        g = Jf.T @ r
        dx = jnp.linalg.solve(H, -g)
        dx_full = jnp.concatenate([jnp.zeros(6), dx]).reshape(N, 6)
        P = P @ _exp6(dx_full)
        if float(jnp.max(jnp.abs(dx))) < 1e-9:
            break
    r = val_fn(zero, P)
    rms = float(jnp.sqrt(jnp.mean(r * r)))
    return [np.asarray(P[k]) for k in range(N)], rms


def odometry_edges(poses: Sequence[np.ndarray], weight: float = 1.0) -> List[PoseGraphEdge]:
    """Consecutive-pose edges from a tracked trajectory."""
    out = []
    for k in range(len(poses) - 1):
        z = np.linalg.inv(np.asarray(poses[k], np.float64)) @ np.asarray(
            poses[k + 1], np.float64
        )
        out.append(PoseGraphEdge(k, k + 1, z.astype(np.float32), weight))
    return out
