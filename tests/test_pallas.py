"""Pallas kernel parity vs the jnp/XLA twin (SURVEY.md SS4.3).

On CPU the kernels run in interpreter mode; the same code compiles via
Mosaic on TPU. The XLA matmul backend is the mock/reference implementation.
"""

import numpy as np
import pytest

from golden import pv_ref
from phase_vocoder_tpu import PvocConfig, time_stretch
from phase_vocoder_tpu.ops import fft as fft_ops
from phase_vocoder_tpu.ops import framing
from phase_vocoder_tpu.ops.pallas import istft_ola, stft_polar
from phase_vocoder_tpu.pipeline import pitch_shift
from phase_vocoder_tpu.streaming import stream_time_stretch
from tests.conftest import make_test_signal

N, RA = 1024, 256


def interior_rel_err(a, b, edge=N):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert len(a) == len(b), (len(a), len(b))
    sl = slice(edge, len(a) - edge)
    return np.max(np.abs(a[sl] - b[sl])) / np.max(np.abs(b[sl]))


@pytest.fixture(scope="module")
def x32k():
    return make_test_signal(2.0).astype(np.float32)


def test_stft_polar_matches_twin(x32k):
    import jax.numpy as jnp

    mag, phi = stft_polar(jnp.asarray(x32k), N, RA)
    frames = framing.frame_signal(jnp.asarray(x32k), N, RA)
    re, im = fft_ops.rfft(frames, backend="matmul", fused_window=True)
    mag2 = jnp.sqrt(re * re + im * im)
    phi2 = jnp.arctan2(im, re)
    assert mag.shape == mag2.shape == (framing.num_frames(len(x32k), N, RA), N // 2 + 1)
    assert float(jnp.max(jnp.abs(mag - mag2))) < 1e-3 * float(jnp.max(mag2))
    # Phase is compared where magnitude is non-negligible (phase of a
    # near-zero bin is ill-conditioned in any implementation).
    significant = mag2 > 1e-3 * float(jnp.max(mag2))
    perr = jnp.where(significant, jnp.abs(phi - phi2), 0.0)
    assert float(jnp.max(perr)) < 1e-3


@pytest.mark.parametrize("rs", [128, 256, 512])
def test_istft_ola_matches_twin(x32k, rs):
    import jax.numpy as jnp

    mag, phi = stft_polar(jnp.asarray(x32k), N, RA)
    y = istft_ola(mag, phi, N, rs)
    y_frames = fft_ops.irfft(
        mag * jnp.cos(phi), mag * jnp.sin(phi), N, backend="matmul",
        fused_window=True,
    )
    y2 = framing.overlap_add(y_frames, rs, method="fold")
    assert y.shape == y2.shape
    assert float(jnp.max(jnp.abs(y - y2))) < 1e-4 * float(jnp.max(jnp.abs(y2)))


@pytest.mark.parametrize("rs", [342, 192, 305])
def test_istft_frames_general_hop_matches_twin(x32k, rs):
    """The general-hop synthesis kernel (polar->cart + 3-pass bf16 inverse
    -> windowed frames) + the general fold OLA matches the matmul-HIGHEST
    twin within the bf16-inverse tolerance at non-dividing hops."""
    import jax.numpy as jnp

    from phase_vocoder_tpu.ops.pallas import istft_frames

    mag, phi = stft_polar(jnp.asarray(x32k), N, RA)
    yf = istft_frames(mag, phi, N)
    y = framing.overlap_add(yf, rs, method="fold")
    y_frames = fft_ops.irfft(
        mag * jnp.cos(phi), mag * jnp.sin(phi), N, backend="matmul",
        fused_window=True,
    )
    y2 = framing.overlap_add(y_frames, rs, method="fold")
    assert y.shape == y2.shape
    assert float(jnp.max(jnp.abs(y - y2))) < 1e-4 * float(jnp.max(jnp.abs(y2)))


def test_istft_frames_mask_matches_short(x32k):
    """frame_mask zeroes trailing frames exactly like a shorter input."""
    import jax.numpy as jnp

    from phase_vocoder_tpu.ops.pallas import istft_frames

    mag, phi = stft_polar(jnp.asarray(x32k), N, RA)
    keep = mag.shape[0] - 7
    mask = (jnp.arange(mag.shape[0]) < keep).astype(mag.dtype)
    a = istft_frames(mag, phi, N, frame_mask=mask)
    b = istft_frames(mag[:keep], phi[:keep], N)
    assert jnp.all(a[keep:] == 0.0)
    assert float(jnp.max(jnp.abs(a[:keep] - b))) == 0.0


def test_istft_ola_frame_mask(x32k):
    """Masked trailing frames contribute nothing, matching a shorter run."""
    import jax.numpy as jnp

    mag, phi = stft_polar(jnp.asarray(x32k), N, RA)
    nf = mag.shape[0]
    keep = nf - 7
    mask = (jnp.arange(nf) < keep).astype(jnp.float32)
    y_masked = istft_ola(mag, phi, N, 512, frame_mask=mask)
    y_short = istft_ola(mag[:keep], phi[:keep], N, 512)
    assert np.allclose(np.asarray(y_masked)[: len(y_short)], np.asarray(y_short),
                       atol=1e-6)
    assert np.allclose(np.asarray(y_masked)[len(y_short):], 0.0, atol=1e-6)


def test_istft_rejects_bad_geometry(x32k):
    import jax.numpy as jnp

    mag, phi = stft_polar(jnp.asarray(x32k), N, RA)
    with pytest.raises(ValueError):
        istft_ola(mag, phi, N, 333)  # rs does not divide n_fft
    with pytest.raises(ValueError):
        istft_ola(mag, phi, N, N)  # degenerate no-overlap case


@pytest.mark.parametrize("stretch", [0.5, 1.0, 2.0])
def test_pallas_backend_end_to_end(stretch, signal_4s):
    """cfg.fft_backend='pallas' matches the matmul backend end to end."""
    a = np.asarray(time_stretch(signal_4s, stretch, PvocConfig(fft_backend="pallas")))
    b = np.asarray(time_stretch(signal_4s, stretch, PvocConfig(fft_backend="matmul")))
    # 'pallas' routes through the fused phasor path: different (equally
    # valid) phase accumulation; each is <1e-5 from golden.
    assert interior_rel_err(a, b) < 5e-5


def test_pallas_backend_vs_golden(signal_1s):
    ref = pv_ref.phase_vocoder(signal_1s, 2.0, N, RA)
    y = np.asarray(time_stretch(signal_1s, 2.0, PvocConfig(fft_backend="pallas")))
    assert interior_rel_err(y, ref) < 1e-4


def test_pallas_fallback_fractional_ratio(signal_1s):
    """rs that doesn't divide n_fft takes the fused general-hop synthesis
    (istft_frames: in-VMEM cos/sin + 3-pass bf16 inverse + general fold
    OLA) — a genuinely different arithmetic path from matmul's HIGHEST
    inverse, so the two are compared against the GOLDEN contract, not each
    other (round 3: they differ by ~1.5e-5 from the bf16 inverse alone)."""
    ref = pv_ref.phase_vocoder(signal_1s, 1.3, N, RA)
    a = np.asarray(time_stretch(signal_1s, 1.3, PvocConfig(fft_backend="pallas")))
    b = np.asarray(time_stretch(signal_1s, 1.3, PvocConfig(fft_backend="matmul")))
    assert interior_rel_err(a, ref) < 1e-4
    assert interior_rel_err(b, ref) < 1e-4


def test_pallas_streaming(signal_4s):
    a = np.asarray(stream_time_stretch(
        signal_4s, 2.0, PvocConfig(fft_backend="pallas"), segment_frames=40))
    b = np.asarray(stream_time_stretch(
        signal_4s, 2.0, PvocConfig(fft_backend="matmul"), segment_frames=40))
    assert interior_rel_err(a, b) < 1e-5


def test_pallas_pitch_shift(signal_1s):
    """Non-octave pitch on the pallas backend (fused general-hop synthesis,
    see test_pallas_fallback_fractional_ratio) vs the golden contract."""
    ref = pv_ref.pitch_shift(signal_1s, -5.0, N, RA)
    a = np.asarray(pitch_shift(signal_1s, -5.0, PvocConfig(fft_backend="pallas")))
    b = np.asarray(pitch_shift(signal_1s, -5.0, PvocConfig(fft_backend="matmul")))
    assert len(a) == len(b)
    m = min(len(a), len(ref))
    assert interior_rel_err(a[:m], ref[:m]) < 1e-4
    assert interior_rel_err(b[:m], ref[:m]) < 1e-4


def test_pallas_inside_shard_map(signal_4s):
    """Fused kernels compose with the sequence-parallel shard_map program."""
    import jax
    from jax.sharding import Mesh

    from phase_vocoder_tpu.parallel.chunked import chunked_time_stretch

    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    a = np.asarray(chunked_time_stretch(
        signal_4s, 2.0, PvocConfig(fft_backend="pallas"), mesh=mesh))
    b = np.asarray(time_stretch(signal_4s, 2.0, PvocConfig(fft_backend="matmul")))
    # Fused phasor accumulation vs polar wrapped-angle scan: each is <1e-5
    # from golden; 1e-4 is the binding waveform gate.
    assert interior_rel_err(a, b) < 1e-4
