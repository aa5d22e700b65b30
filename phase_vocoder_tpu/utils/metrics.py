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


def mxu_roofline_audio_s(
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    fold: bool = True,
    mxu_tflops_bf16: float = 197.0,
) -> float:
    """Analytic MXU (compute) speed-of-light in audio-seconds/s for one chip.

    The fused kernel's FLOPs are dominated by its DFT matmuls; everything
    else (phasor terms, prefix scan, fold-OLA) is VPU elementwise work that
    overlaps with or is small next to the MXU passes. Counting MXU passes in
    bf16-issue equivalents (the unit the 197 TFLOP/s v5e peak is quoted in;
    an f32 matmul at Precision.HIGHEST issues ~6 bf16 passes, the 3-pass
    bf16-split inverse issues 3, an exact bf16 permutation matmul issues 3):

      fold path (n_fft=1024 -> half-length L=512, ops/pallas/fused.py):
        3 (fwd lane reversal) + 2x6 (E@fch, O@fsh at HIGHEST)
        + 2x3 (3-pass bf16 inverse) + 2 (unfold reversal, 2-pass since
        round 3) = 23 passes of (frames, L) @ (L, L)
        ->  23 * L^2 MACs/frame
      packed non-fold path: 2x6 passes of (frames, N)@(N, L) forward
        + 2x3 of (frames, L)@(L, N) inverse = 18 * N*L MACs/frame

    At 1024/256 that is ~12.1 MFLOP/frame (fold), 62.5 frames per audio
    second -> ~754 MFLOP/audio-s -> ~261k audio-s/s on a 197 TFLOP/s chip.
    This is 4.4x BELOW the HBM bound (hbm_roofline_audio_s ~ 1.16M), so the
    fused pipeline is compute-bound and min(mxu, hbm) is the binding
    roofline for vs_baseline (VERDICT.md round-1 weak #2). NOTE this is an
    implementation-specific bound — see binding_roofline_audio_s.
    """
    L = n_fft // 2
    if fold:
        macs_per_frame = 23 * L * L
    else:
        macs_per_frame = 18 * n_fft * L
    frames_per_s = sample_rate / hop
    flops_per_audio_s = 2.0 * macs_per_frame * frames_per_s
    return mxu_tflops_bf16 * 1e12 / flops_per_audio_s


def fft_flop_roofline_audio_s(
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    mxu_tflops_bf16: float = 197.0,
) -> float:
    """Algorithmic-lower-bound roofline: an FFT-based kernel's FLOPs.

    ~5*N*log2(N) real FLOPs per rfft/irfft (the textbook split-radix
    count), two transforms per frame. Under this count the pipeline would
    be HBM-bound again (~30.8M audio-s/s = 197e12 / (2*5*1024*10 * 62.5),
    far above the 1.16M HBM bound), so the
    true hardware speed-of-light for ANY DFT algorithm is min(FFT, HBM) =
    HBM. Reported alongside the matmul-DFT MXU bound so vs_baseline is not
    inflated by the choice of DFT algorithm (ADVICE.md round 2)."""
    import math

    flops_per_frame = 2 * 5.0 * n_fft * math.log2(n_fft)
    frames_per_s = sample_rate / hop
    return mxu_tflops_bf16 * 1e12 / (flops_per_frame * frames_per_s)


def binding_roofline_audio_s(
    sample_rate: int = 16000,
    n_fft: int = 1024,
    hop: int = 256,
    stretch: float = 2.0,
    fold: bool = True,
) -> dict:
    """Both rooflines plus the binding (min) one — the vs_baseline anchor.

    NOTE (ADVICE.md round 2): the MXU bound is IMPLEMENTATION-SPECIFIC — it
    normalizes by the FLOPs of this implementation's matmul-DFT (24 L^2
    MACs/frame on the fold path), not an algorithmic lower bound. Under an
    FFT-FLOP count (fft_audio_s_per_s) the binding hardware bound is HBM
    (hw_audio_s_per_s = min(FFT, HBM)); both are emitted so a reader can
    normalize either way. vs_baseline == 1.0 therefore means "the chosen
    matmul-DFT runs at MXU peak", not "no faster algorithm exists" —
    docs/fft_note.md records why matmul-DFT is the right algorithm for
    Mosaic at N=1024 anyway.
    """
    hbm = hbm_roofline_audio_s(sample_rate, n_fft, hop, stretch)
    mxu = mxu_roofline_audio_s(sample_rate, n_fft, hop, fold)
    fft = fft_flop_roofline_audio_s(sample_rate, n_fft, hop)
    return {
        "hbm_audio_s_per_s": hbm,
        "mxu_audio_s_per_s": mxu,
        "mxu_note": "implementation-specific (matmul-DFT FLOPs, fold path)",
        "fft_audio_s_per_s": fft,
        "hw_audio_s_per_s": min(fft, hbm),
        "binding": "mxu" if mxu < hbm else "hbm",
        "audio_s_per_s": min(hbm, mxu),
    }


def emit_metric(metric: str, value: float, unit: str, vs_baseline: float | None = None,
                stream=None, **extra) -> dict:
    """Print one JSON metrics line (the bench.py contract) and return it."""
    rec = {"metric": metric, "value": value, "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = vs_baseline
    rec.update(extra)
    print(json.dumps(rec), file=stream or sys.stdout, flush=True)
    return rec
