"""Metrics / observability (SURVEY.md SS5).

Emits the judge metric — audio-seconds processed per wall-clock second per
chip — as JSON lines, plus per-stage timings and an analytic HBM roofline
estimate so measured throughput can be reported as %-of-speed-of-light.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from dataclasses import dataclass, field

logger = logging.getLogger("phase_vocoder_tpu")


@dataclass
class Timer:
    """Wall-clock stage timer: with Timer() as t: ... ; t.seconds."""

    seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        return False


def audio_seconds_per_second(
    n_samples: int, sample_rate: int, wall_seconds: float
) -> float:
    return (n_samples / sample_rate) / max(wall_seconds, 1e-12)


def hbm_roofline_audio_s(
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    stretch: float = 2.0,
    hbm_gbps: float = 819.0,
    dtype_bytes: int = 4,
) -> float:
    """Analytic speed-of-light upper bound in audio-seconds/s for one chip.

    Minimal HBM traffic for the fused pipeline per audio-second:
      read input once, write output once, plus one spectral round trip
      (frames x n_bins x 2 (re,im) read+written once between the analysis
      and synthesis halves when the pipeline doesn't fuse end-to-end).
    """
    frames_per_s = sample_rate / hop
    n_bins = n_fft // 2 + 1
    in_bytes = sample_rate * dtype_bytes
    out_bytes = sample_rate * stretch * dtype_bytes
    spectral_bytes = 2 * frames_per_s * n_bins * 2 * dtype_bytes  # rw of (re,im)
    bytes_per_audio_s = in_bytes + out_bytes + spectral_bytes
    return hbm_gbps * 1e9 / bytes_per_audio_s


def emit_metric(metric: str, value: float, unit: str, vs_baseline: float | None = None,
                stream=None, **extra) -> dict:
    """Print one JSON metrics line (the bench.py contract) and return it."""
    rec = {"metric": metric, "value": value, "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = vs_baseline
    rec.update(extra)
    print(json.dumps(rec), file=stream or sys.stdout, flush=True)
    return rec
