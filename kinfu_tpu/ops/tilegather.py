"""In-kernel 2D gather primitives for Mosaic (Pallas TPU) kernels.

TPU has no general gather: XLA lowers `jnp.take` to a ~7-13 ns/element
serial path (measured, tools/PERF_NOTES.md), which made the reference's three
gather-bound stages (depth lookup in TSDF integrate, TSDF sampling in
raycast, projective map lookup in ICP — tsdf_volume.cu:59-68,
tsdf_volume.cu:166-177, rigid_icp.cu:58-63) 50-100x slower than the CUDA
originals. Mosaic *does* lower `jnp.take_along_axis` to `tpu.dynamic_gather`,
a VPU register shuffle, but only when the gathered dimension fits a single
vreg: <=8 sublanes for axis 0, <=128 lanes for axis 1 (discovered
empirically; see tools/mosaic_probe*.py).

This module composes those constrained shuffles into an arbitrary 2D lookup
`out[i,j] = src[v[i,j], u[i,j]]` for an [8,128] tile of indices against a
VMEM-resident image/slab. Measured costs on v5e (tools/mosaic_probe4.py)
drive the structure:

  - straight-line dynamic_gathers cost ~2-4 ns each; masks ~1 ns;
  - scalar lax.cond / dynamic fori_loop control flow costs ~100-500 ns per
    construct — a fully dynamic window/chunk/d loop nest runs ~2 us/tile
    while the identical straight-line computation runs ~0.3 us;
  - vector->scalar reductions cost ~30-60 ns each.

Hence: a STRAIGHT-LINE fast path (static window count, static chunk set,
static per-row span bound, selection by masks) guarded by ONE lax.cond that
falls back to a fully general dynamic path when the tile's index spans
exceed the static bounds. For smooth projective index fields (camera
projections, ray/slab intersections) the fast path covers ~all tiles.

Decomposition (both paths): the v-range is covered by 8-aligned 8-row
windows (dynamic sublane slices must be provably 8-aligned); within a
window, rows are picked by the *vrow + d* trick — per sublane row i,
v[i,:] = min_j v[i,j] + dvr[i,j] with small dvr, so for each offset d one
axis-0 dynamic_gather with a lane-constant index picks row vrow[i]+d and
one axis-1 dynamic_gather picks the column, keeping lanes where dvr==d.
The u-range is covered by static 128-lane chunks. The general path also
has a flat "broadcast-8" mode (8 lane-gathers per window-chunk, any span).

Everything is shape-static and runs both compiled and under interpret=True.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE = (8, 128)

# In the general path, above this per-tile max row-span the flat broadcast-8
# mode beats the d-loop (which costs one gather pair per span step).
_D_SWITCH = 3


class TileIndices:
    """Per-tile index decomposition, shared across gathers at the same (v,u).

    Only cheap vector ops + 3 scalar reductions (vmin, vmax, dmax); u bounds
    are computed lazily (only needed by chunk-subset fast paths and the
    general path's chunk skipping).
    """

    def __init__(self, vi: jnp.ndarray, ui: jnp.ndarray, n_chunks: int):
        self.vi = vi
        self.ui = ui
        self.n_chunks = n_chunks
        self.vmin = jnp.min(vi)
        self.vmax = jnp.max(vi)
        self.w0 = (self.vmin // 8) * 8
        self.nwin = (self.vmax - self.w0) // 8 + 1
        # vrow + d decomposition (window-independent)
        self.vrow_min = jnp.min(vi, axis=1, keepdims=True)  # [8,1]
        self.dvr = vi - self.vrow_min  # [8,128] >= 0
        self.dmax = jnp.max(self.dvr)  # scalar; 0-2 for smooth fields
        # u chunk decomposition
        self.uchunk = ui // 128
        self.uloc = ui - self.uchunk * 128
        self._ubounds = None

    @property
    def ubounds(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self._ubounds is None:
            self._ubounds = (jnp.min(self.ui), jnp.max(self.ui))
        return self._ubounds


def _window(src_refs, ws, out_dtype):
    wins = []
    for r in src_refs:
        w = r[pl.ds(ws, 8), :]
        if w.dtype != out_dtype:
            w = w.astype(out_dtype)
        wins.append(w)
    return wins


def _cell_vrowd(colwins, idx, vrow_u, d, accs):
    """One (window, chunk, d) cell of the vrow decomposition: gather row
    vrow[i]+d / column u for every channel, keep lanes with dvr==d that
    fall inside this window. `cmask` folded into accs' selection."""
    ridx_row = vrow_u + d  # [8,1]
    inrow = (ridx_row >= 0) & (ridx_row < 8)
    ridx = jnp.broadcast_to(jnp.clip(ridx_row, 0, 7), TILE)
    sel = (idx.dvr == d) & jnp.broadcast_to(inrow, TILE)
    out = []
    for (colwin, cmask), acc in accs:
        rowsel = jnp.take_along_axis(colwin, ridx, axis=0)
        lane = jnp.take_along_axis(rowsel, idx.uloc, axis=1)
        out.append(((colwin, cmask), jnp.where(sel & cmask, lane, acc)))
    return out


def _fast_gather(src_refs, idx: TileIndices, out_dtype, n_windows, n_d, chunks):
    """Straight-line gather: static windows x chunks x d, masks only.

    Exact when vmax < w0 + 8*n_windows, dmax < n_d, and all uchunk values
    are in `chunks` — the caller guards with exactly that predicate.
    Window starts are clamped to the array (duplicate windows select
    identical values, so clamping stays exact).
    """
    h = src_refs[0].shape[0]
    accs = [jnp.zeros(TILE, out_dtype) for _ in src_refs]
    for k in range(n_windows):
        ws_raw = jnp.minimum(idx.w0 + k * 8, h - 8)
        ws = pl.multiple_of(ws_raw, 8)
        wins = _window(src_refs, ws, out_dtype)
        vrow_u = idx.vrow_min - ws
        for c in chunks:
            c_eff = min(max(c, 0), idx.n_chunks - 1)
            colwins = [w[:, c_eff * 128 : (c_eff + 1) * 128] for w in wins]
            cmask = idx.uchunk == c
            cell = [((cw, cmask), acc) for cw, acc in zip(colwins, accs)]
            for d in range(n_d):
                cell = _cell_vrowd(colwins, idx, vrow_u, d, cell)
            accs = [acc for (_, acc) in cell]
    return accs


def _general_gather(src_refs, idx: TileIndices, out_dtype):
    """Fully dynamic gather: correct for any index spans. ~2 us/tile due to
    control-flow cost — only used when the fast-path predicate fails."""
    umin, umax = idx.ubounds

    def win_body(k, accs):
        h = src_refs[0].shape[0]
        ws_raw = jnp.minimum(idx.w0 + k * 8, h - 8)
        ws = pl.multiple_of(ws_raw, 8)
        wins = _window(src_refs, ws, out_dtype)
        vrow_u = idx.vrow_min - ws
        vloc = idx.vi - ws

        def chunk_take(c, accs):
            colwins = [w[:, c * 128 : (c + 1) * 128] for w in wins]
            cmask = idx.uchunk == c

            def vrow_path(accs):
                def d_body(d, accs):
                    cell = [((cw, cmask), acc) for cw, acc in zip(colwins, accs)]
                    cell = _cell_vrowd(colwins, idx, vrow_u, d, cell)
                    return tuple(acc for (_, acc) in cell)

                return jax.lax.fori_loop(0, idx.dmax + 1, d_body, accs)

            def bcast_path(accs):
                for r in range(8):
                    sel = cmask & (vloc == r)
                    out = []
                    for cw, acc in zip(colwins, accs):
                        row = jnp.broadcast_to(cw[r : r + 1, :], TILE)
                        lane = jnp.take_along_axis(row, idx.uloc, axis=1)
                        out.append(jnp.where(sel, lane, acc))
                    accs = tuple(out)
                return accs

            return jax.lax.cond(idx.dmax <= _D_SWITCH, vrow_path, bcast_path, accs)

        for c in range(idx.n_chunks):
            lo, hi = c * 128, (c + 1) * 128
            accs = jax.lax.cond(
                (umin < hi) & (umax >= lo),
                lambda a, c=c: chunk_take(c, a),
                lambda a: a,
                accs,
            )
        return accs

    accs = tuple(jnp.zeros(TILE, out_dtype) for _ in src_refs)
    return list(jax.lax.fori_loop(0, idx.nwin, win_body, accs))


def gather2d_multi(
    src_refs: Sequence,
    idx: TileIndices,
    out_dtype=jnp.float32,
    *,
    n_windows: int = 2,
    n_d: int = 3,
    chunks: Sequence[int] | None = None,
):
    """out_k[i,j] = src_k[v[i,j], u[i,j]] for each channel k of an [8,128]
    tile. Sources are same-shape [H, W] VMEM refs (H a multiple of 8);
    int16/int8 sources are upcast per-window. Indices must be pre-clipped
    to bounds; validity masking is the caller's job.

    `n_windows`, `n_d`, `chunks` size the straight-line fast path; a tile
    whose actual spans exceed them falls back (one lax.cond) to the exact
    general path, so any values are SAFE — the statics only tune speed.
    `chunks=None` means all `idx.n_chunks` chunks (no u-bound reductions).
    """
    if chunks is None:
        chunk_list = list(range(idx.n_chunks))
        u_covered = True
    else:
        chunk_list = list(chunks)
        umin, umax = idx.ubounds
        lo = min(chunk_list) * 128
        hi = (max(chunk_list) + 1) * 128
        u_covered = (umin >= lo) & (umax < hi)
        # non-contiguous chunk sets would need per-chunk coverage tests
        assert chunk_list == list(range(min(chunk_list), max(chunk_list) + 1))

    fits_v = idx.vmax < idx.w0 + 8 * n_windows
    fast_ok = fits_v & (idx.dmax < n_d) & u_covered

    return jax.lax.cond(
        fast_ok,
        lambda: tuple(
            _fast_gather(src_refs, idx, out_dtype, n_windows, n_d, chunk_list)
        ),
        lambda: tuple(_general_gather(src_refs, idx, out_dtype)),
    )


def gather2d(
    src_ref,
    idx: TileIndices,
    out_dtype=jnp.float32,
    *,
    n_windows: int = 2,
    n_d: int = 3,
    chunks: Sequence[int] | None = None,
) -> jnp.ndarray:
    """Single-channel `gather2d_multi`."""
    return gather2d_multi(
        (src_ref,), idx, out_dtype, n_windows=n_windows, n_d=n_d, chunks=chunks
    )[0]


def clip_indices(
    v: jnp.ndarray, u: jnp.ndarray, h: int, w: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clip float/int pixel indices into bounds; returns (vi, ui, inb)."""
    if jnp.issubdtype(v.dtype, jnp.floating):
        v = jnp.rint(v).astype(jnp.int32)
        u = jnp.rint(u).astype(jnp.int32)
    inb = (v >= 0) & (v < h) & (u >= 0) & (u < w)
    return jnp.clip(v, 0, h - 1), jnp.clip(u, 0, w - 1), inb
