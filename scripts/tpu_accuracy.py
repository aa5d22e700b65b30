"""Measure fused-path accuracy vs the f64 golden model ON THE REAL CHIP.

The CPU interpreter and Mosaic can round differently (the round-1 bench
showed 1.278e-4 on TPU where CPU said ~1e-4), so the gate must be checked
on hardware. Prints one JSON line per (stretch, fast) combination.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from golden import pv_ref
from phase_vocoder_tpu import PvocConfig
from phase_vocoder_tpu.ops.pallas.fused import fused_time_stretch

N, RA, SR = 1024, 256, 16000


def make_test_signal(seconds=2.0, sr=SR, seed=0):
    g = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.3 * np.sin(2 * np.pi * (200.0 * t + 400.0 * t * t))
        + 0.05 * g.standard_normal(len(t))
    )
    return (x / np.max(np.abs(x))).astype(np.float64)


def rel_err(a, b, edge=N):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    sl = slice(edge, len(a) - edge)
    return float(np.max(np.abs(a[sl] - b[sl])) / np.max(np.abs(b[sl])))


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    x = make_test_signal(seconds).astype(np.float32)
    print(json.dumps({"device": str(jax.devices()[0]), "seconds": seconds}))
    for stretch in (0.5, 1.0, 2.0):
        rs = PvocConfig().synthesis_hop(stretch)
        ref = pv_ref.phase_vocoder(np.asarray(x, np.float64), stretch, N, RA)
        for fast in (True, False):
            y = np.asarray(fused_time_stretch(jnp.asarray(x), N, RA, rs, fast=fast))
            e = rel_err(y, ref)
            print(
                json.dumps(
                    {
                        "stretch": stretch,
                        "fast": fast,
                        "rel_err": e,
                        "pass": e < 1e-4,
                    }
                )
            )


if __name__ == "__main__":
    main()
