"""Round-4: isolate control-flow overhead in the tile gather.

Variants, all computing the same integrate-z-tile lookup per iteration:
  V0 bounds only          — TileIndices reductions, no gather
  V1 straight-line        — 2 static windows x 3 static chunks x 2 static d,
                            no lax.cond, no fori (correct for this tile)
  V2 straight-line 5chunk — same but all 5 chunks (no u-span assumption)
  V3 full gather2d        — dynamic windows + chunk conds + d fori + hybrid
  V4 V1 without bounds    — straight-line with HARDCODED w0 (no reductions)
"""

from __future__ import annotations

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kinfu_tpu.ops.tilegather import TileIndices, gather2d  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/kinfu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def straightline(img_ref, vi, ui, w0, nchunks, nd, with_bounds=True):
    if with_bounds:
        vmin = jnp.min(vi)
        w0 = (vmin // 8) * 8
    vrow_min = jnp.min(vi, axis=1, keepdims=True)
    dvr = vi - vrow_min
    uchunk = ui // 128
    uloc = ui - uchunk * 128
    acc = jnp.zeros((8, 128), jnp.float32)
    for k in range(2):
        ws = pl.multiple_of(w0 + k * 8, 8)
        win = img_ref[pl.ds(ws, 8), :]
        vrow_u = vrow_min - ws
        for c in range(nchunks):
            colwin = win[:, c * 128 : (c + 1) * 128]
            cmask = uchunk == c
            for d in range(nd):
                ridx_row = vrow_u + d
                inrow = (ridx_row >= 0) & (ridx_row < 8)
                ridx = jnp.broadcast_to(jnp.clip(ridx_row, 0, 7), (8, 128))
                rowsel = jnp.take_along_axis(colwin, ridx, axis=0)
                lane = jnp.take_along_axis(rowsel, uloc, axis=1)
                sel = cmask & (dvr == d) & jnp.broadcast_to(inrow, (8, 128))
                acc = jnp.where(sel, lane, acc)
    return acc


def make_variant(tag):
    def kern(n_ref, img_ref, v_ref, u_ref, out_ref):
        def body(it, acc):
            vi = v_ref[:] + (it & 1)
            ui = u_ref[:]
            if tag == "V0":
                idx = TileIndices(vi, ui, 5)
                g = (
                    idx.vmin + idx.vmax + idx.umin + idx.umax + idx.dmax + idx.w0
                ).astype(jnp.float32) + idx.dvr.astype(jnp.float32)
            elif tag == "V1":
                g = straightline(img_ref, vi, ui, 0, 3, 2)
            elif tag == "V2":
                g = straightline(img_ref, vi, ui, 0, 5, 2)
            elif tag == "V3":
                idx = TileIndices(vi, ui, 5)
                g = gather2d(img_ref, idx)
            elif tag == "V4":
                g = straightline(img_ref, vi, ui, 96, 3, 2, with_bounds=False)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, n_ref[0], body, jnp.zeros((8, 128), jnp.float32)
        )

    return kern


def measure(tag, img, v, u):
    f = jax.jit(
        lambda n, a, b, c: pl.pallas_call(
            make_variant(tag),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * 3,
            out_specs=vmem(),
        )(n, a, b, c)
    )
    n1, n2 = jnp.array([500], jnp.int32), jnp.array([20500], jnp.int32)
    np.asarray(f(n1, img, v, u))
    np.asarray(f(n2, img, v, u))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(n1, img, v, u))
        t1 = time.perf_counter()
        np.asarray(f(n2, img, v, u))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 20000)
    return best * 1e9


def correctness_check(img, v, u):
    """V1 must equal numpy for the integrate z-tile (checked once)."""

    def kern(img_ref, v_ref, u_ref, out_ref):
        out_ref[:] = straightline(img_ref, v_ref[:], u_ref[:], 0, 5, 2)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[vmem()] * 3,
        out_specs=vmem(),
    )(img, v, u)
    ref = np.asarray(img)[np.asarray(v), np.asarray(u)]
    print("V2 straight-line:", "EXACT" if np.array_equal(np.asarray(out), ref) else "MISMATCH")


if __name__ == "__main__":
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((480, 640)), jnp.float32)
    i = np.arange(8)[:, None]
    j = np.arange(128)[None, :]
    v = jnp.asarray(np.clip(100 + 0.95 * i + 0.01 * j, 0, 478).astype(np.int32))
    u = jnp.asarray(np.clip(37 + 2.05 * j + 0.1 * i, 0, 639).astype(np.int32))
    correctness_check(img, v, u)
    for tag in ["V0", "V1", "V2", "V3", "V4"]:
        print(f"{tag}: {measure(tag, img, v, u):.0f} ns/tile")
