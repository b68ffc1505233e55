"""tilegather: the Mosaic 2D gather primitive vs numpy fancy indexing.

Runs every case through a pl.pallas_call with interpret=True (CPU), which
exercises the same trace the TPU compiles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kinfu_tpu.ops.tilegather import TileIndices, clip_indices, gather2d, gather2d_multi


def run_gather(img, v, u, out_dtype=jnp.float32):
    h, w = img.shape
    n_chunks = (w + 127) // 128

    def kern(img_ref, v_ref, u_ref, out_ref):
        idx = TileIndices(v_ref[:], u_ref[:], n_chunks)
        out_ref[:] = gather2d(img_ref, idx, out_dtype)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        interpret=True,
    )(jnp.asarray(img), jnp.asarray(v), jnp.asarray(u))


CASES = [
    # (v range lo, hi), (u range lo, hi) — spans exercised
    ((100, 101), (5, 6)),  # single pixel
    ((100, 102), (200, 330)),  # ICP-like: tiny v span, 2-chunk u span
    ((93, 140), (0, 640)),  # integrate-like: wide v span, all chunks
    ((0, 8), (0, 129)),  # top edge
    ((472, 480), (510, 640)),  # bottom/right edge
    ((0, 480), (0, 640)),  # fully random
]


@pytest.mark.parametrize("vr,ur", CASES)
def test_gather2d_matches_numpy(rng, vr, ur):
    img = rng.standard_normal((480, 640)).astype(np.float32)
    v = rng.integers(vr[0], vr[1], (8, 128)).astype(np.int32)
    u = rng.integers(ur[0], ur[1], (8, 128)).astype(np.int32)
    out = np.asarray(run_gather(img, v, u))
    np.testing.assert_array_equal(out, img[v, u])


def test_gather2d_structured_projective(rng):
    """Index fields shaped like a real projection: smooth ramps + noise."""
    img = rng.standard_normal((480, 640)).astype(np.float32)
    i = np.arange(8)[:, None]
    j = np.arange(128)[None, :]
    v = (100 + 2.1 * i + 0.05 * j + rng.normal(0, 0.5, (8, 128))).astype(np.int32)
    u = (37 + 2.05 * j + 0.1 * i).astype(np.int32)
    v = np.clip(v, 0, 479).astype(np.int32)
    u = np.clip(u, 0, 639).astype(np.int32)
    out = np.asarray(run_gather(img, v, u))
    np.testing.assert_array_equal(out, img[v, u])


def test_gather2d_int16_source(rng):
    img = rng.integers(-32000, 32000, (512, 512)).astype(np.int16)
    v = rng.integers(0, 512, (8, 128)).astype(np.int32)
    u = rng.integers(0, 512, (8, 128)).astype(np.int32)
    out = np.asarray(run_gather(img, v, u, jnp.float32))
    np.testing.assert_array_equal(out, img[v, u].astype(np.float32))


def test_gather2d_int32_source(rng):
    img = rng.integers(0, 2**24, (480, 640)).astype(np.int32)
    v = rng.integers(0, 480, (8, 128)).astype(np.int32)
    u = rng.integers(0, 640, (8, 128)).astype(np.int32)
    out = np.asarray(run_gather(img, v, u, jnp.int32))
    np.testing.assert_array_equal(out, img[v, u])


def test_gather2d_multi_channels(rng):
    a = rng.standard_normal((240, 384)).astype(np.float32)
    b = rng.standard_normal((240, 384)).astype(np.float32)
    c = rng.standard_normal((240, 384)).astype(np.float32)
    v = rng.integers(0, 240, (8, 128)).astype(np.int32)
    u = rng.integers(0, 384, (8, 128)).astype(np.int32)

    def kern(a_ref, b_ref, c_ref, v_ref, u_ref, oa, ob, oc):
        idx = TileIndices(v_ref[:], u_ref[:], 3)
        ra, rb, rc = gather2d_multi((a_ref, b_ref, c_ref), idx)
        oa[:] = ra
        ob[:] = rb
        oc[:] = rc

    outs = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * 3,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        interpret=True,
    )(*map(jnp.asarray, (a, b, c, v, u)))
    for out, src in zip(outs, (a, b, c)):
        np.testing.assert_array_equal(np.asarray(out), src[v, u])


def test_clip_indices():
    v = jnp.asarray(np.array([[-3.0, 10.6, 479.4, 480.0]] * 2))
    u = jnp.asarray(np.array([[5.2, -0.6, 639.4, 640.0]] * 2))
    vi, ui, inb = clip_indices(v, u, 480, 640)
    np.testing.assert_array_equal(np.asarray(vi)[0], [0, 11, 479, 479])
    np.testing.assert_array_equal(np.asarray(ui)[0], [5, 0, 639, 639])
    np.testing.assert_array_equal(np.asarray(inb)[0], [False, False, True, False])
