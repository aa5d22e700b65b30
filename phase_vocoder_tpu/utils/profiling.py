"""Tracing/profiling hooks (SURVEY.md SS5 "Tracing / profiling").

The reference's instrumentation ceiling is cudaEvent wall-clock timing.
TPU-native equivalent: every pipeline stage already runs under
jax.named_scope (pvoc_analyze / pvoc_tsm / pvoc_synthesize), so a
jax.profiler trace attributes device time per stage; this module adds the
entry points and an analytic HBM roofline report.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """Capture a profiler trace (view with TensorBoard / Perfetto).

    No-op when trace_dir is None so call sites can pass the CLI flag
    straight through.
    """
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def stage_timer(results: dict, name: str):
    """Wall-clock a host-side stage into `results` (blocks on device)."""
    t0 = time.perf_counter()
    yield
    results[name] = time.perf_counter() - t0


def roofline_report(sr: int, n_fft: int, hop: int, stretch: float,
                    measured_audio_s_per_s: float) -> dict:
    """Analytic bytes-per-audio-second vs measured throughput (SURVEY.md SS6)."""
    from .metrics import hbm_roofline_audio_s

    roof = hbm_roofline_audio_s(sr, n_fft, hop, stretch)
    return {
        "roofline_audio_s_per_s": roof,
        "measured_audio_s_per_s": measured_audio_s_per_s,
        "fraction_of_roofline": measured_audio_s_per_s / roof if roof else 0.0,
    }


def emit(rec: dict) -> None:
    print(json.dumps(rec), flush=True)
