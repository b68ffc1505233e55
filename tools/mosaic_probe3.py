"""Round-3 Mosaic probes: micro-costs of the primitives the kinfu kernels
compose — dynamic fori overhead, straight-line gather cost, cond-skip cost,
scalar-reduction cost, aligned dynamic sublane windows, and the full
windowed 2D lookup with the vrow/dvr decomposition."""

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
    except Exception:  # noqa: BLE001
        print(f"FAIL {name}:")
        tb = traceback.format_exc()
        lines = [l for l in tb.split("\n") if "Mosaic" in l or "Error" in l or "NotImplemented" in l]
        print("  " + "\n  ".join(lines[:6]))


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def smem():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _measure(f, args_small, args_big, n_small, n_big, reps=3):
    np.asarray(f(*args_small))
    np.asarray(f(*args_big))
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args_small))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f(*args_big))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (n_big - n_small)


def _loop_probe(body_fn, extra_inputs=(), n1=2000, n2=102000):
    """Time one iteration of `body_fn(i, acc, *refs)` in a dynamic fori."""

    def kern(n_ref, *refs):
        out = refs[-1]
        ins = refs[:-1]

        def body(i, acc):
            return body_fn(i, acc, *ins)

        out[:] = jax.lax.fori_loop(0, n_ref[0], body, jnp.zeros(out.shape, jnp.float32))

    specs = [smem()] + [vmem()] * len(extra_inputs)
    f = jax.jit(
        lambda n, *a: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=specs,
            out_specs=vmem(),
        )(n, *a)
    )
    na = jnp.array([n1], jnp.int32)
    nb = jnp.array([n2], jnp.int32)
    dt = _measure(f, (na, *extra_inputs), (nb, *extra_inputs), n1, n2)
    return dt * 1e9


def probe_empty_loop():
    ns = _loop_probe(lambda i, acc: acc + jnp.float32(1.0))
    return f"{ns:.1f} ns/iter (add-only body)"


def probe_gather_chain():
    """8 gathers per iteration -> isolate per-gather cost."""
    src = jnp.ones((8, 128), jnp.float32)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 5) % 128

    def body(i, acc, src_ref, idx_ref):
        ix = idx_ref[:] ^ (i & 1)
        for k in range(8):
            acc = acc + jnp.take_along_axis(src_ref[:], ix ^ k, axis=1)
        return acc

    ns = _loop_probe(body, (src, idx), n1=500, n2=20500)
    return f"{ns:.1f} ns/iter of 8 gathers -> {ns/8:.1f} ns/gather"


def probe_cond_skip():
    """8 never-taken lax.conds per iteration."""
    src = jnp.ones((8, 128), jnp.float32)

    def body(i, acc, src_ref):
        p = i < -1  # never true, not provably false
        for k in range(8):
            acc = jax.lax.cond(p, lambda a: a + src_ref[:] * 2.0, lambda a: a, acc)
        return acc

    ns = _loop_probe(body, (src,), n1=500, n2=50500)
    return f"{ns:.1f} ns/iter of 8 skipped conds -> {ns/8:.1f} ns/skip"


def probe_scalar_reduce():
    """4 vector->scalar min/max reductions per iteration."""
    src = jnp.ones((8, 128), jnp.float32)

    def body(i, acc, src_ref):
        x = src_ref[:] + jnp.float32(i)
        a = jnp.min(x)
        b = jnp.max(x)
        c = jnp.min(x + 1)
        d = jnp.max(x + 1)
        return acc + (a + b + c + d)

    ns = _loop_probe(body, (src,), n1=500, n2=20500)
    return f"{ns:.1f} ns/iter of 4 scalar reductions -> {ns/4:.1f} ns/reduce"


def probe_aligned_window():
    """Dynamic 8-aligned sublane window on [480, 640] + use."""

    def kern(s_ref, src, out):
        s8 = pl.multiple_of((s_ref[0] // 8) * 8, 8)
        win = src[pl.ds(s8, 8), :]  # [8, 640]
        out[:] = win[:, 128:256] * 2.0

    src = jnp.arange(480 * 640, dtype=jnp.float32).reshape(480, 640)
    s = jnp.array([37], jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[smem(), vmem()],
        out_specs=vmem(),
    )(s, src)
    assert np.array_equal(np.asarray(out), np.asarray(src)[32:40, 128:256] * 2.0)
    return "exact"


def make_lookup2d(img_w: int, dmax: int = 8):
    """Windowed 2D gather with the vrow+dvr decomposition.

    out[i,j] = img[vi[i,j], ui[i,j]]  (assumes indices in range).
    Per aligned 8-row window: per chunk, per d in [0, dvr_max]:
      rowsel_d[i,j] = win[vrow[i]+d, cj]   (axis-0 gather, lane-constant idx)
      lane_d[i,j]   = rowsel_d[i, uloc[i,j]]
      out where (dvr==d & chunk matches & in-window)
    """
    nchunks = (img_w + 127) // 128

    def lookup(img_ref, vi, ui):
        vmin = jnp.min(vi)
        vmax = jnp.max(vi)
        umin = jnp.min(ui)
        umax = jnp.max(ui)
        w0 = (vmin // 8) * 8
        nwin = (vmax - w0) // 8 + 1

        uchunk = ui // 128
        uloc = ui - uchunk * 128

        def win_body(k, acc):
            ws = pl.multiple_of(w0 + k * 8, 8)
            win = img_ref[pl.ds(ws, 8), :]  # [8, img_w]
            vloc = vi - ws
            inwin = (vloc >= 0) & (vloc < 8)
            vloc_c = jnp.clip(vloc, 0, 7)
            vrow = jnp.min(vloc_c, axis=1, keepdims=True)  # [8,1]
            dvr = vloc_c - vrow
            dmax_t = jnp.max(dvr)

            def chunk_take(c, acc):
                colwin = win[:, c * 128 : (c + 1) * 128]  # [8,128]

                def d_body(d, acc):
                    def take(acc):
                        ridx = jnp.broadcast_to(jnp.clip(vrow + d, 0, 7), vi.shape)
                        rowsel = jnp.take_along_axis(colwin, ridx, axis=0)
                        lane = jnp.take_along_axis(rowsel, uloc, axis=1)
                        sel = inwin & (dvr == d) & (uchunk == c)
                        return jnp.where(sel, lane, acc)

                    return jax.lax.cond(d <= dmax_t, take, lambda a: a, acc)

                for d in range(dmax):
                    acc = d_body(d, acc)
                return acc

            for c in range(nchunks):
                lo, hi = c * 128, (c + 1) * 128
                acc = jax.lax.cond(
                    (umin < hi) & (umax >= lo),
                    lambda a, c=c: chunk_take(c, a),
                    lambda a: a,
                    acc,
                )
            return acc

        acc = jnp.zeros(vi.shape, jnp.float32)
        return jax.lax.fori_loop(0, nwin, win_body, acc)

    return lookup


def probe_lookup2d_exact():
    lookup = make_lookup2d(640)

    def kern(img, vidx, uidx, out):
        out[:] = lookup(img, vidx[:], uidx[:])

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((480, 640)), jnp.float32)
    v = jnp.asarray(rng.integers(93, 140, (8, 128)), jnp.int32)
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


def probe_lookup2d_speed():
    lookup = make_lookup2d(640)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((480, 640)), jnp.float32)
    # realistic integrate-tile indices: ~16-row v-span, ~2-chunk u-span
    v = jnp.asarray(100 + rng.integers(0, 16, (8, 128)), jnp.int32)
    u = jnp.asarray(200 + rng.integers(0, 200, (8, 128)), jnp.int32)

    def body(i, acc, img_ref, v_ref, u_ref):
        return acc + lookup(img_ref, v_ref[:], u_ref[:] ^ (i & 1))

    ns = _loop_probe(body, (img, v, u), n1=200, n2=10200)
    return f"{ns:.0f} ns per 2D lookup [16-row span] ({ns/1024:.3f} ns/elem)"


def probe_lookup2d_speed_tight():
    lookup = make_lookup2d(640)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((480, 640)), jnp.float32)
    # ICP-like: 2-row v-span, <=2 chunk u-span
    v = jnp.asarray(100 + rng.integers(0, 2, (8, 128)), jnp.int32)
    u = jnp.asarray(200 + rng.integers(0, 130, (8, 128)), jnp.int32)

    def body(i, acc, img_ref, v_ref, u_ref):
        return acc + lookup(img_ref, v_ref[:], u_ref[:] ^ (i & 1))

    ns = _loop_probe(body, (img, v, u), n1=200, n2=10200)
    return f"{ns:.0f} ns per 2D lookup [2-row span] ({ns/1024:.3f} ns/elem)"


if __name__ == "__main__":
    print("devices:", jax.devices())
    report("A empty dyn fori", probe_empty_loop)
    report("B gather chain", probe_gather_chain)
    report("C cond skip", probe_cond_skip)
    report("D scalar reduce", probe_scalar_reduce)
    report("E aligned dyn window", probe_aligned_window)
    report("F lookup2d exact", probe_lookup2d_exact)
    report("G lookup2d speed (16-row)", probe_lookup2d_speed)
    report("H lookup2d speed (2-row)", probe_lookup2d_speed_tight)
