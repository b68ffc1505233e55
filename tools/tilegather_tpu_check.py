"""Validate + time kinfu_tpu.ops.tilegather.gather2d on the real TPU."""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kinfu_tpu.ops.tilegather import TileIndices, gather2d

jax.config.update("jax_compilation_cache_dir", "/tmp/kinfu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def exactness():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((480, 640)).astype(np.float32)
    cases = {
        "tiny": (rng.integers(100, 102, (8, 128)), rng.integers(200, 330, (8, 128))),
        "wide": (rng.integers(93, 140, (8, 128)), rng.integers(0, 640, (8, 128))),
        "rand": (rng.integers(0, 480, (8, 128)), rng.integers(0, 640, (8, 128))),
    }

    def kern(img_ref, v_ref, u_ref, out_ref):
        idx = TileIndices(v_ref[:], u_ref[:], 5)
        out_ref[:] = gather2d(img_ref, idx)

    f = jax.jit(
        lambda a, b, c: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[vmem()] * 3,
            out_specs=vmem(),
        )(a, b, c)
    )
    for name, (v, u) in cases.items():
        v = v.astype(np.int32)
        u = u.astype(np.int32)
        out = np.asarray(f(jnp.asarray(img), jnp.asarray(v), jnp.asarray(u)))
        ok = np.array_equal(out, img[v, u])
        print(f"{name}: {'EXACT' if ok else 'MISMATCH'}")


def speed():
    for name, v, u in speed_cases():
        ns = time_case(v, u)
        print(f"{name}: {ns:.0f} ns/tile ({ns/1024:.3f} ns/elem)")


def speed_cases():
    i = np.arange(8)[:, None]
    j = np.arange(128)[None, :]
    cases = []
    # integrate tile, z-on-sublane, near-identity pose: v-span ~8, dvr~1
    v = np.clip(100 + 0.95 * i + 0.01 * j, 0, 479).astype(np.int32)
    u = np.clip(37 + 2.05 * j + 0.1 * i, 0, 639).astype(np.int32)
    cases.append(("integrate z-tile (dvr~1)", v, u))
    # rotated pose: big per-row lane span -> bcast path
    v = np.clip(100 + 2.1 * i + 0.35 * j, 0, 479).astype(np.int32)
    u = np.clip(37 + 1.9 * j + 0.4 * i, 0, 639).astype(np.int32)
    cases.append(("rotated tile (dvr~45)", v, u))
    # ICP: near-identity projective association
    v = np.clip(200 + 1.0 * i + 0.005 * j, 0, 479).astype(np.int32)
    u = np.clip(300 + 1.0 * j + 0.01 * i, 0, 639).astype(np.int32)
    cases.append(("icp tile (dvr~0)", v, u))
    return cases


def time_case(v, u):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((480, 640)), jnp.float32)

    def kern(n_ref, img_ref, v_ref, u_ref, out_ref):
        def body(it, acc):
            idx = TileIndices(v_ref[:] + (it & 1), u_ref[:], 5)
            return acc + gather2d(img_ref, idx)

        out_ref[:] = jax.lax.fori_loop(
            0, n_ref[0], body, jnp.zeros((8, 128), jnp.float32)
        )

    f = jax.jit(
        lambda n, a, b, c: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem()] * 3,
            out_specs=vmem(),
        )(n, a, b, c)
    )
    va, ua = jnp.asarray(v), jnp.asarray(u)
    n1, n2 = jnp.array([500], jnp.int32), jnp.array([20500], jnp.int32)
    np.asarray(f(n1, img, va, ua))
    np.asarray(f(n2, img, va, ua))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(n1, img, va, ua))
        t1 = time.perf_counter()
        np.asarray(f(n2, img, va, ua))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 20000)
    return best * 1e9


if __name__ == "__main__":
    print("devices:", jax.devices())
    exactness()
    speed()
