"""Linear-interpolation resampler (reference component C12 — pitch shift).

The reference resamples with a CUDA kernel (or host loop). TPU-native: one
vectorized gather of the two neighbor samples + lerp; XLA fuses the whole
thing. Output length is static (required for jit), computed by the caller
from the stretch factor.

Precision: sample positions j/factor are split per 1024-sample block into an
exact host-computed float64 integer part and a small float32 fractional
part, so position error stays ~1e-4 samples for arbitrarily long outputs
(naive float32 j/factor drifts past 2^23 samples).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_BLOCK = 1024


def resample_linear(x: jnp.ndarray, factor: float, out_len: int) -> jnp.ndarray:
    """Resample 1-D x by `factor` (>1 = more samples) to `out_len` samples.

    out[j] = x[j / factor], linear interpolation, edge-clamped. Matches
    golden/pv_ref.py::resample_linear.
    """
    if out_len <= 0:
        return jnp.zeros((0,), dtype=x.dtype)
    n = x.shape[-1]
    nblocks = -(-out_len // _BLOCK)
    # Host-side float64 block starts (compile-time constants — exact).
    starts = np.arange(nblocks, dtype=np.float64) * (_BLOCK / factor)
    start_int = jnp.asarray(np.floor(starts), dtype=jnp.int32)  # (nblocks,)
    start_frac = jnp.asarray(starts - np.floor(starts), dtype=jnp.float32)
    jo = jnp.asarray(
        np.arange(_BLOCK, dtype=np.float64) / factor, dtype=jnp.float32
    )  # (B,) values < B/factor: small, so f32 is plenty
    local = start_frac[:, None] + jo[None, :]  # (nblocks, B)
    local_int = jnp.floor(local)
    lo = (start_int[:, None] + local_int.astype(jnp.int32)).reshape(-1)[:out_len]
    frac = (local - local_int).reshape(-1)[:out_len].astype(x.dtype)
    lo = jnp.clip(lo, 0, n - 1)
    hi = jnp.minimum(lo + 1, n - 1)
    return x[lo] * (1.0 - frac) + x[hi] * frac
