"""Test configuration.

All tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
logic (mesh, shard_map, halo exchange, phase-state carry) is exercised without
TPU hardware — the standard JAX idiom for distributed-logic tests
(SURVEY.md SS4.4). This MUST run before the first `import jax` anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU platform plugin overrides JAX_PLATFORMS (config default is
# "axon,cpu"), so force CPU explicitly — tests must run on the virtual
# 8-device CPU mesh, never through the single-chip TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_test_signal(seconds: float = 1.0, sr: int = 16000, seed: int = 0) -> np.ndarray:
    """Deterministic chirp + tone + noise test signal, float64 in [-1, 1]."""
    g = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.3 * np.sin(2 * np.pi * (200.0 * t + 400.0 * t * t))  # chirp
        + 0.05 * g.standard_normal(len(t))
    )
    return (x / np.max(np.abs(x))).astype(np.float64)


@pytest.fixture(scope="session")
def signal_1s():
    return make_test_signal(1.0)


@pytest.fixture(scope="session")
def signal_4s():
    return make_test_signal(4.0)
