"""Round-2 Mosaic probes: fixed 2D windowed lookup (2D slices only), dynamic
trip counts, and dispatch-cancelling throughput measurement."""

from __future__ import annotations

import time
import traceback
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/kinfu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def report(name, fn, full=False):
    try:
        print(f"OK   {name}: {fn()}")
    except Exception as e:  # noqa: BLE001
        if full:
            print(f"FAIL {name}:")
            traceback.print_exc()
        else:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def lookup_2d(img_ref, vi, ui, wh=8, img_w=640):
    """out[i,j] = img[vi[i,j], ui[i,j]] for an [8,128] tile; img in VMEM.

    Assumes max(vi)-min(vi) < wh. 2D slices only (Mosaic requirement)."""
    vmin = jnp.min(vi)
    win = img_ref[pl.ds(vmin, wh), :]  # [wh, W]
    vloc = vi - vmin
    acc = jnp.zeros(vi.shape, jnp.float32)
    nchunks = img_w // 128
    for r in range(wh):
        got = jnp.zeros(vi.shape, jnp.float32)
        for c in range(nchunks):
            bc = jnp.broadcast_to(win[r : r + 1, c * 128 : (c + 1) * 128], vi.shape)
            uloc = jnp.clip(ui - c * 128, 0, 127)
            g = jnp.take_along_axis(bc, uloc, axis=1)
            got = jnp.where((ui // 128) == c, g, got)
        acc = jnp.where(vloc == r, got, acc)
    return acc


def probe_windowed_2d():
    def kern(img, vidx, uidx, out):
        out[:] = lookup_2d(img, vidx[:], uidx[:])

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


def _timed_loop_kernel(inner, n_ref, *refs):
    """fori_loop with dynamic trip count from SMEM."""
    out = refs[-1]

    def body(i, acc):
        return acc + inner(i, *refs[:-1])

    out[:] = jax.lax.fori_loop(0, n_ref[0], body, jnp.zeros(out.shape, jnp.float32))


def _measure(build, args_small, args_big, n_small, n_big):
    f = jax.jit(build)
    np.asarray(f(*args_small))
    np.asarray(f(*args_big))  # both compiled (same program: dynamic n)
    reps = 3
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args_small))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f(*args_big))
        tb.append(time.perf_counter() - t0)
    dt = (min(tb) - min(ts)) / (n_big - n_small)
    return dt


def probe_gather_speed():
    def inner(i, src, idx):
        return jnp.take_along_axis(src[:], idx[:] ^ (i & 1), axis=1)

    def build(n, src, idx):
        return pl.pallas_call(
            lambda n_ref, s, ix, o: _timed_loop_kernel(inner, n_ref, s, ix, o),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem(), vmem()],
            out_specs=vmem(),
        )(n, src, idx)

    src = jnp.ones((8, 128), jnp.float32)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 5) % 128
    n1 = jnp.array([1000], jnp.int32)
    n2 = jnp.array([101000], jnp.int32)
    dt = _measure(build, (n1, src, idx), (n2, src, idx), 1000, 101000)
    return f"{dt*1e9:.1f} ns per [8,128] gather iter ({dt*1e9/1024:.4f} ns/elem)"


def probe_windowed_2d_speed():
    def inner(i, img, vidx, uidx):
        return lookup_2d(img, vidx[:], uidx[:] ^ (i & 1))

    def build(n, img, v, u):
        return pl.pallas_call(
            lambda n_ref, im, vi, ui, o: _timed_loop_kernel(inner, n_ref, im, vi, ui, o),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem(), vmem(), vmem()],
            out_specs=vmem(),
        )(n, img, v, u)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((480, 640)), jnp.float32)
    v = jnp.asarray(rng.integers(100, 107, (8, 128)), jnp.int32)
    u = jnp.asarray(rng.integers(0, 638, (8, 128)), jnp.int32)
    n1 = jnp.array([200], jnp.int32)
    n2 = jnp.array([10200], jnp.int32)
    dt = _measure(build, (n1, img, v, u), (n2, img, v, u), 200, 10200)
    return f"{dt*1e9:.0f} ns per [8,128] 2D lookup ({dt*1e9/1024:.3f} ns/elem)"


def probe_i32_gather():
    def kern(src, idx, out):
        out[:] = jnp.take_along_axis(src[:], idx[:], axis=1)

    src = (jnp.arange(8 * 128, dtype=jnp.int32) * 7) % 100001
    src = src.reshape(8, 128)
    idx = jnp.broadcast_to((jnp.arange(128, dtype=jnp.int32)[::-1])[None, :], (8, 128))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[vmem(), vmem()],
        out_specs=vmem(),
    )(src, idx)
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
    assert np.array_equal(np.asarray(out), ref)
    return "exact"


def probe_i16_upcast_in_kernel():
    """i16 slab in VMEM, upcast to f32 inside the kernel, then gather."""

    def kern(src, idx, out):
        f = src[:].astype(jnp.float32)
        out[:] = jnp.take_along_axis(f, idx[:], axis=1)

    src = ((jnp.arange(8 * 128, dtype=jnp.int16) * 7) % 1001).reshape(8, 128)
    idx = jnp.broadcast_to((jnp.arange(128, dtype=jnp.int32)[::-1])[None, :], (8, 128))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[vmem(), vmem()],
        out_specs=vmem(),
    )(src, idx)
    ref = np.take_along_axis(np.asarray(src).astype(np.float32), np.asarray(idx), axis=1)
    assert np.array_equal(np.asarray(out), ref)
    return "exact"


def probe_dyn_sublane_wide():
    """Dynamic sublane window on a [512,512] slab (volume-sized)."""

    def kern(s_ref, src, out):
        out[:] = src[pl.ds(s_ref[0], 8), :][:, 128:256]

    src = jnp.arange(512 * 512, dtype=jnp.float32).reshape(512, 512)
    s = jnp.array([301], jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vmem()],
        out_specs=vmem(),
    )(s, src)
    assert np.array_equal(np.asarray(out), np.asarray(src)[301:309, 128:256])
    return "exact"


if __name__ == "__main__":
    print("devices:", jax.devices())
    report("9  windowed 2D lookup (2D slices)", probe_windowed_2d, full=True)
    report("11 i32 axis1 gather", probe_i32_gather)
    report("12 i16 upcast-in-kernel gather", probe_i16_upcast_in_kernel)
    report("13 dyn sublane window on [512,512]", probe_dyn_sublane_wide)
    report("8b gather throughput (diff method)", probe_gather_speed)
    report("10b windowed 2D throughput (diff)", probe_windowed_2d_speed)
