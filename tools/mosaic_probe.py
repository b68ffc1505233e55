"""Probe Mosaic (Pallas TPU) capabilities needed by the kinfu kernels.

Run on the TPU: python tools/mosaic_probe.py
Each probe compiles a tiny kernel inside try/except and reports OK/FAIL, so
one run answers all feasibility questions:

  1. take_along_axis axis=1 on [8,128] f32      (lane dynamic_gather)
  2. take_along_axis axis=0 on [8,128] f32      (sublane dynamic_gather)
  3. take_along_axis axis=1 on [8,512] f32      (expect FAIL: >1 vreg)
  4. dynamic sublane slice ref[pl.ds(s,8), :]
  5. dynamic lane slice    ref[:, pl.ds(s,128)]
  6. gather from int16 source
  7. scalar any-reduction driving @pl.when
  8. throughput of the axis-1 gather (chained fori_loop)

Findings from the retired round-2/3/4 probe variants (mosaic_probe2-4,
folded here r5; measured numbers live in tools/PERF_NOTES.md):

  - r2 (windowed 2D lookup): only 2D refs slice dynamically on both axes;
    pl.ds sublane starts must be 8-aligned multiples (pl.multiple_of) or
    Mosaic pays an unaligned-copy penalty; dynamic trip counts via SMEM
    scalars + fori_loop work and are the only way to amortize the remote
    dispatch round-trip in measurements.
  - r3 (micro-costs): dynamic fori iteration ~30 ns floor; a straight-line
    [8,128] gather (take_along_axis) ~40 ns; lax.cond inside the kernel
    costs MORE than the skipped gather for tile-sized work — predicate at
    slab/strip granularity only; scalar any-reductions (for alive flags)
    are cheap (~10 ns).
  - r4 (control flow in gather2d): straight-line 2-window x n-chunk x 2-d
    unrolled gathers beat the dynamic-window + chunk-cond + d-fori hybrid
    ~3x; TileIndices bounds reductions are ~25% of the straight-line cost —
    which is why ops/tilegather.py generates static-count unrolled windows.
"""

from __future__ import annotations

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/kinfu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def report(name, fn):
    try:
        out = fn()
        print(f"OK   {name}: {out}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


# ---------------------------------------------------------------- 1. axis-1
def probe_axis1():
    def kern(src, idx, out):
        out[:] = jnp.take_along_axis(src[:], idx[:], axis=1)

    src = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.broadcast_to((jnp.arange(128, dtype=jnp.int32)[::-1])[None, :], (8, 128))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[vmem(), vmem()],
        out_specs=vmem(),
    )(src, idx)
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    assert np.array_equal(np.asarray(out), ref)
    return "exact"


# ---------------------------------------------------------------- 2. axis-0
def probe_axis0():
    def kern(src, idx, out):
        out[:] = jnp.take_along_axis(src[:], idx[:], axis=0)

    src = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 3) % 8
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[vmem(), vmem()],
        out_specs=vmem(),
    )(src, idx)
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
    assert np.array_equal(np.asarray(out), ref)
    return "exact"


# ------------------------------------------------------- 3. axis-1 width 512
def probe_axis1_wide():
    def kern(src, idx, out):
        out[:] = jnp.take_along_axis(src[:], idx[:], axis=1)

    src = jnp.arange(8 * 512, dtype=jnp.float32).reshape(8, 512)
    idx = (jnp.arange(8 * 512, dtype=jnp.int32).reshape(8, 512) * 7) % 512
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        in_specs=[vmem(), vmem()],
        out_specs=vmem(),
    )(src, idx)
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    assert np.array_equal(np.asarray(out), ref)
    return "exact"


# ----------------------------------------------------- 4. dyn sublane slice
def probe_dyn_sublane():
    def kern(s_ref, src, out):
        s = s_ref[0]
        out[:] = src[pl.ds(s, 8), :]

    src = jnp.arange(480 * 128, dtype=jnp.float32).reshape(480, 128)
    s = jnp.array([37], dtype=jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem()],
        out_specs=vmem(),
    )(s, src)
    assert np.array_equal(np.asarray(out), np.asarray(src)[37:45])
    return "exact"


# -------------------------------------------------------- 5. dyn lane slice
def probe_dyn_lane():
    def kern(s_ref, src, out):
        s = s_ref[0]
        out[:] = src[:, pl.ds(s, 128)]

    src = jnp.arange(8 * 640, dtype=jnp.float32).reshape(8, 640)
    s = jnp.array([139], dtype=jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem()],
        out_specs=vmem(),
    )(s, src)
    assert np.array_equal(np.asarray(out), np.asarray(src)[:, 139:267])
    return "exact"


# ------------------------------------------------------------ 6. i16 gather
def probe_i16_gather():
    def kern(src, idx, out):
        out[:] = jnp.take_along_axis(src[:], idx[:], axis=1)

    src = (jnp.arange(8 * 128, dtype=jnp.int16) * 7) % 1001
    src = src.reshape(8, 128)
    idx = jnp.broadcast_to((jnp.arange(128, dtype=jnp.int32)[::-1])[None, :], (8, 128))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16),
        in_specs=[vmem(), vmem()],
        out_specs=vmem(),
    )(src, idx)
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    assert np.array_equal(np.asarray(out), ref)
    return "exact"


# ---------------------------------------------- 7. scalar any() + pl.when
def probe_scalar_when():
    def kern(src, out):
        out[:] = jnp.zeros_like(out)
        flag = jnp.any(src[:] > 0.5)

        @pl.when(flag)
        def _():
            out[:] = src[:] * 2.0

    src = jnp.full((8, 128), 0.75, jnp.float32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[vmem()],
        out_specs=vmem(),
    )(src)
    assert np.allclose(np.asarray(out), 1.5)
    return "exact"


# -------------------------------------------------- 8. gather throughput
def probe_gather_speed():
    N = 20000

    def kern(src, idx, out):
        def body(i, acc):
            g = jnp.take_along_axis(src[:], idx[:] ^ (i & 1), axis=1)
            return acc + g

        out[:] = jax.lax.fori_loop(0, N, body, jnp.zeros((8, 128), jnp.float32))

    src = jnp.ones((8, 128), jnp.float32)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 5) % 128
    f = jax.jit(
        lambda s, i: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[vmem(), vmem()],
            out_specs=vmem(),
        )(s, i)
    )
    r = f(src, idx)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = f(src, idx)
    np.asarray(r)
    dt = time.perf_counter() - t0
    ns_per_gather = dt / N * 1e9
    return f"{ns_per_gather:.1f} ns per [8,128] gather ({ns_per_gather/1024:.3f} ns/elem)"


# ------------------------------------------- 9. dyn sublane slice + gather
def probe_windowed_2d():
    """The integrate/raycast inner primitive: dynamic row window + per-row
    lane gather + row select, all fused — full 2D lookup for an [8,128]
    tile of (v,u) indices from a [480,640] image in VMEM."""

    def kern(img, vidx, uidx, out):
        vmin = jnp.min(vidx[:])
        win = img[pl.ds(vmin, 8), :]  # [8, 640]
        acc = jnp.zeros((8, 128), jnp.float32)
        vloc = vidx[:] - vmin
        for r in range(8):
            row_match = vloc == r
            got = jnp.zeros((8, 128), jnp.float32)
            for c in range(5):
                chunk = win[r, c * 128 : (c + 1) * 128]  # [128]
                bc = jnp.broadcast_to(chunk[None, :], (8, 128))
                uloc = jnp.clip(uidx[:] - c * 128, 0, 127)
                g = jnp.take_along_axis(bc, uloc, axis=1)
                got = jnp.where((uidx[:] // 128) == c, g, got)
            acc = jnp.where(row_match, got, acc)
        out[:] = acc

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((480, 640)), jnp.float32)
    v = jnp.asarray(rng.integers(100, 107, (8, 128)), jnp.int32)
    u = jnp.asarray(rng.integers(0, 640, (8, 128)), jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[vmem(), vmem(), vmem()],
        out_specs=vmem(),
    )(img, v, u)
    ref = np.asarray(img)[np.asarray(v), np.asarray(u)]
    assert np.allclose(np.asarray(out), ref), "mismatch"
    return "exact"


# --------------------------------------------- 10. windowed 2d throughput
def probe_windowed_2d_speed():
    N = 2000

    def kern(img, vidx, uidx, out):
        def lookup(vi, ui):
            vmin = jnp.min(vi)
            win = img[pl.ds(vmin, 8), :]
            acc = jnp.zeros((8, 128), jnp.float32)
            vloc = vi - vmin
            for r in range(8):
                got = jnp.zeros((8, 128), jnp.float32)
                for c in range(5):
                    bc = jnp.broadcast_to(win[r, c * 128 : (c + 1) * 128][None, :], (8, 128))
                    uloc = jnp.clip(ui - c * 128, 0, 127)
                    g = jnp.take_along_axis(bc, uloc, axis=1)
                    got = jnp.where((ui // 128) == c, g, got)
                acc = jnp.where(vloc == r, got, acc)
            return acc

        def body(i, acc):
            return acc + lookup(vidx[:], uidx[:] ^ (i & 1))

        out[:] = jax.lax.fori_loop(0, N, body, jnp.zeros((8, 128), jnp.float32))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((480, 640)), jnp.float32)
    v = jnp.asarray(rng.integers(100, 107, (8, 128)), jnp.int32)
    u = jnp.asarray(rng.integers(0, 638, (8, 128)), jnp.int32)
    f = jax.jit(
        lambda a, b, c: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[vmem(), vmem(), vmem()],
            out_specs=vmem(),
        )(a, b, c)
    )
    r = f(img, v, u)
    r.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(f(img, v, u))
    dt = time.perf_counter() - t0
    ns = dt / N * 1e9
    return f"{ns:.0f} ns per [8,128] 2D windowed lookup ({ns/1024:.3f} ns/elem)"


if __name__ == "__main__":
    print("devices:", jax.devices())
    report("1 axis1 gather [8,128] f32", probe_axis1)
    report("2 axis0 gather [8,128] f32", probe_axis0)
    report("3 axis1 gather [8,512] f32", probe_axis1_wide)
    report("4 dyn sublane slice", probe_dyn_sublane)
    report("5 dyn lane slice", probe_dyn_lane)
    report("6 i16 axis1 gather", probe_i16_gather)
    report("7 scalar any + pl.when", probe_scalar_when)
    report("8 gather throughput", probe_gather_speed)
    report("9 windowed 2D lookup", probe_windowed_2d)
    report("10 windowed 2D throughput", probe_windowed_2d_speed)
