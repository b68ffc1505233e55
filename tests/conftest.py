"""Test configuration: force the CPU backend with 8 virtual devices so
mesh/shard_map/distributed tests run without TPU hardware.

jax may already be imported (a TPU plugin can register itself from
sitecustomize before this file runs), so setting JAX_PLATFORMS in
os.environ alone is not enough — use jax.config.update, which takes
effect as long as no backend has been initialised yet."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from kinfu_tpu.geometry.intrinsics import Intrinsics  # noqa: E402


@pytest.fixture
def small_intr() -> Intrinsics:
    """Small image for fast tests; principal point off-centre on purpose."""
    return Intrinsics(width=80, height=64, fx=70.0, fy=72.0, cx=39.2, cy=31.7)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
