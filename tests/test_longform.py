"""Long-recording correctness gates (VERDICT.md round-1 missing #1).

The f32 risk at scale is NOT cumsum drift (the phasor product telescopes
for integer k and the wrapped scan is drift-free by construction) but
ANCHOR CONDITIONING: bin k's synthesis phase inherits its frame-0 analysis
phase, so a bin that is at the noise floor at t=0 and loud later carries an
O(arith_noise / |X_k(0)|) phase offset forever. On broadband content (every
bin anchored above the floor — the canonical test signal has a 5% noise
floor) all paths hold <1e-4 vs golden out to >=10 min; on pathological
content (pure chirp over a PCM16-quantization floor: anchor |X| ~ 1e-6 of
peak) EVERY f32 implementation — fused, polar, and the reference's CUDA
alike — lands ~1e-2 from the f64 oracle, and the oracle itself moves ~7e-3
under 1e-7 input perturbations (measured; see .claude/skills/verify).

Measured on TPU v5e (2026-08-19, fused fast path, 2.0x):
    2 s: 1.7e-5   60 s: 1.7e-5   600 s: 2.4e-5   (flat in length)

Streaming + chunked (compensated (hi, lo)-pair carry, round 3) measured on
the 8-device CPU mesh, 2.0x vs f64 golden — flat in length:
    60 s: 4.7e-6 (both)   600 s: see test docstrings below   3600 s: hour gate

The 600 s cases run only when PVOC_SLOW_TESTS=1 (golden f64 + interpreter
kernels at 37.5k frames take minutes on CPU); the 3600 s hour gate
(BASELINE config 5 "hour-long recording") only when PVOC_HOUR_TESTS=1
(~tens of minutes on CPU; the fused hour-scale run is measured on the TPU
chip by scripts/tpu_accuracy.py and recorded in README). The 60 s case
always runs.
"""

import os

import numpy as np
import pytest

from golden import pv_ref
from phase_vocoder_tpu import PvocConfig, time_stretch
from phase_vocoder_tpu.ops.pallas.fused import fused_time_stretch
from tests.conftest import make_test_signal

N, RA = 1024, 256

SLOW = os.environ.get("PVOC_SLOW_TESTS") == "1"
HOUR = os.environ.get("PVOC_HOUR_TESTS") == "1"


def rel_err(a, b, edge=N):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    sl = slice(edge, len(b) - edge)
    return np.max(np.abs(a[sl] - b[sl])) / np.max(np.abs(b[sl]))


def test_fused_golden_one_minute():
    """<1e-4 vs f64 golden at 60 s (3750 frames), fused fast path, 2x."""
    import jax.numpy as jnp

    x = make_test_signal(60.0).astype(np.float32)
    ref = pv_ref.phase_vocoder(np.asarray(x, np.float64), 2.0, N, RA)
    y = np.asarray(fused_time_stretch(jnp.asarray(x), N, RA, 512))
    e = rel_err(y, ref)
    assert e < 1e-4, e


@pytest.mark.skipif(not SLOW, reason="set PVOC_SLOW_TESTS=1 (minutes on CPU)")
def test_fused_golden_ten_minutes_2x():
    """<1e-4 vs f64 golden at 600 s (37.5k frames) — the >=10-min gate.

    Integer-k paths (closed-form phasors, no branch cuts) hold the gate at
    any length: measured flat on chip at 2.4-2.6e-5 out to 3600 s
    (ACCURACY_r04.json)."""
    import jax.numpy as jnp

    x = make_test_signal(600.0).astype(np.float32)
    ref = pv_ref.phase_vocoder(np.asarray(x, np.float64), 2.0, N, RA)
    y = np.asarray(fused_time_stretch(jnp.asarray(x), N, RA, 512))
    e = rel_err(y, ref)
    assert e < 1e-4, e


@pytest.mark.skipif(not SLOW, reason="set PVOC_SLOW_TESTS=1 (minutes on CPU)")
def test_fused_golden_ten_minutes_halfk():
    """k=1/2 at 600 s: the oracle's OWN conditioning bounds the gate.

    Measured (ACCURACY_r04.json conditioning_note_q2_paths): at
    (0.5x, >=600 s) the f64 oracle moves rel 0.244 on the aliasing sweep
    and rel 2.5e-2 even on benign tones+noise under a 1e-7 input
    perturbation — noise-floor bins random-walk across the principal
    branch point, and each crossing is a discrete choice that any rounding
    change reshuffles. A <1e-4 rel gate vs that oracle is therefore not an
    assertable property of ANY implementation past ~600 s (chip and CPU
    interpret land anywhere in 1e-5..3e-2 by lottery; round 3 happened to
    draw green). The assertable properties ARE gated here: waveform
    correlation through the isolated pi-flips, and rel error within the
    oracle's own measured perturbation envelope. The tight <1e-4 rel gate
    for k=1/2 lives at 60 s (test_fused_vs_golden, on-chip ACCURACY
    table), where the oracle is stable."""
    import jax.numpy as jnp

    x = make_test_signal(600.0).astype(np.float32)
    ref = pv_ref.phase_vocoder(np.asarray(x, np.float64), 0.5, N, RA)
    y = np.asarray(fused_time_stretch(jnp.asarray(x), N, RA, 128), np.float64)
    sl = slice(N, len(ref) - N)
    corr = np.corrcoef(y[sl], ref[sl])[0, 1]
    # Thresholds = the oracle's own 1e-7-perturbation envelope on this
    # signal (golden-vs-perturbed-golden: corr 0.99881, rel 0.244 —
    # ACCURACY_r04.json): an implementation cannot be asserted closer to
    # the oracle than the oracle is to itself.
    assert corr > 0.998, corr
    e = rel_err(y, ref)
    assert e < 0.3, e


@pytest.mark.skipif(not SLOW, reason="set PVOC_SLOW_TESTS=1 (minutes on CPU)")
def test_streaming_and_chunked_golden_ten_minutes():
    """The streaming executor and the 8-device chunked program hold the
    same >=10-min gate. Both carry the synthesis-phase residual as a
    compensated (hi, lo) f32 pair (ops/phase.py), so the error is flat in
    length (round 2's plain-f32 scan drifted to 2.84e-4 at just 60 s).
    Measured 2026-08-21 (8-device CPU mesh, 600 s / 2.0x vs f64 golden):
    streaming 4.73e-6, chunked 4.73e-6."""
    from phase_vocoder_tpu.parallel.chunked import chunked_time_stretch
    from phase_vocoder_tpu.parallel.mesh import make_mesh
    from phase_vocoder_tpu.streaming import stream_time_stretch

    x = make_test_signal(600.0)
    ref = pv_ref.phase_vocoder(x, 2.0, N, RA)
    cfg = PvocConfig()
    y_s = np.asarray(stream_time_stretch(x, 2.0, cfg))
    assert rel_err(y_s, ref) < 1e-4
    y_c = np.asarray(
        chunked_time_stretch(x, 2.0, cfg, mesh=make_mesh(8, axis="seq"))
    )
    assert rel_err(y_c, ref) < 1e-4


@pytest.mark.skipif(not HOUR, reason="set PVOC_HOUR_TESTS=1 (tens of minutes)")
def test_streaming_and_chunked_golden_one_hour():
    """BASELINE config 5: hour-long recording (3600 s, ~225k frames).

    The compensated pair carry keeps streaming and the 8-device chunked
    program under the 1e-4 gate at a full hour — the drift-vs-length table
    (60/600/3600 s) lives in README.md. Measured 2026-08-21: streaming
    9.75e-6, chunked 9.75e-6 (vs 4.7e-6 at 60/600 s — near-flat)."""
    from phase_vocoder_tpu.parallel.chunked import chunked_time_stretch
    from phase_vocoder_tpu.parallel.mesh import make_mesh
    from phase_vocoder_tpu.streaming import stream_time_stretch

    x = make_test_signal(3600.0)
    ref = pv_ref.phase_vocoder(x, 2.0, N, RA)
    cfg = PvocConfig()
    y_s = np.asarray(stream_time_stretch(x, 2.0, cfg))
    e_s = rel_err(y_s, ref)
    assert e_s < 1e-4, e_s
    y_c = np.asarray(
        chunked_time_stretch(x, 2.0, cfg, mesh=make_mesh(8, axis="seq"))
    )
    e_c = rel_err(y_c, ref)
    assert e_c < 1e-4, e_c


def _benign_tones_noise(seconds: float, sr: int = 16000) -> np.ndarray:
    """Tones + noise WITHOUT the aliasing chirp: the canonical signal's
    chirp wraps the Nyquist every ~10 s, making >=600 s slices maximally
    branch-dense (every bin crosses the princarg branch repeatedly). This
    is the benign long-form content the tight gates run on."""
    g = np.random.default_rng(7)
    t = np.arange(int(seconds * sr)) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.3 * np.sin(2 * np.pi * 1234.5 * t)
        + 0.05 * g.standard_normal(len(t))
    )
    return (x / np.max(np.abs(x))).astype(np.float64)


@pytest.mark.skipif(not SLOW, reason="set PVOC_SLOW_TESTS=1 (minutes)")
def test_fused_golden_ten_minutes_halfk_benign():
    """TIGHT <1e-4 gate for k=1/2 at 600 s on benign tones+noise content
    (ADVICE r04: the correlation gate on the aliasing sweep alone left
    long-form 0.5x only weakly gated; chip-measured 3.8e-5 in
    ACCURACY_r04, and branch-dense content auto-reroutes to the
    branch-faithful polar path — pipeline.BRANCH_FAITHFUL_FRAMES)."""
    import jax.numpy as jnp

    x = _benign_tones_noise(600.0).astype(np.float32)
    ref = pv_ref.phase_vocoder(np.asarray(x, np.float64), 0.5, N, RA)
    y = np.asarray(fused_time_stretch(jnp.asarray(x), N, RA, 128))
    e = rel_err(y, ref)
    assert e < 1e-4, e


def test_branch_faithful_routing():
    """branch_policy='faithful' reroutes q>=2 stretches to the polar
    streaming executor (the path measured at ~5e-7 vs golden on the 600 s
    sweep where the phasor kernels read ~0.24 — ACCURACY_r05); 'fast'
    keeps the fused kernel; integer k never reroutes."""
    from phase_vocoder_tpu import pipeline
    from phase_vocoder_tpu.streaming import stream_time_stretch

    x = make_test_signal(4.0).astype(np.float32)
    cfg = PvocConfig(fft_backend="pallas")
    ref = pv_ref.phase_vocoder(np.asarray(x, np.float64), 0.5, N, RA)

    y_faith = np.asarray(
        pipeline.time_stretch(x, 0.5, cfg, branch_policy="faithful")
    )
    y_stream = np.asarray(stream_time_stretch(x, 0.5, cfg))
    np.testing.assert_array_equal(y_faith, y_stream)
    assert rel_err(y_faith, ref) < 1e-4

    y_fast = np.asarray(
        pipeline.time_stretch(x, 0.5, cfg, branch_policy="fast")
    )
    assert rel_err(y_fast, ref) < 1e-4
    # integer k: 'faithful' is a no-op (closed form has no branch cuts)
    a = np.asarray(pipeline.time_stretch(x, 2.0, cfg, branch_policy="faithful"))
    b = np.asarray(pipeline.time_stretch(x, 2.0, cfg, branch_policy="fast"))
    np.testing.assert_array_equal(a, b)
