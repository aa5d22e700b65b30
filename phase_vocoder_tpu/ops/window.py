"""Window functions (reference component C4 — SURVEY.md SS2.1)."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _hann_f64(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * i / n)


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window: w[i] = 0.5 - 0.5*cos(2*pi*i/n), i in [0, n).

    Computed host-side in float64 then cast (a compile-time constant), so the
    near-zero edge taps keep full relative precision — 0.5 - 0.5*cos(eps) in
    f32 suffers catastrophic cancellation (~0.2% rel error at tap 1), which
    matters because OLA normalization divides by these values squared.
    """
    return jnp.asarray(_hann_f64(n), dtype=dtype)
