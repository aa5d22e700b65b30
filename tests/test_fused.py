"""Fused phasor-path tests (ops/pallas/fused.py) and blocked-scan tests.

The fused path is the TPU flagship: phasor-form TSM with zero
transcendentals, in-kernel prefix scan, in-kernel OLA normalization. On CPU
the kernels run in interpreter mode; the identical code compiles via Mosaic
on the chip (verified on TPU v5e).
"""

import numpy as np
import pytest

from golden import pv_ref
from phase_vocoder_tpu import PvocConfig, time_stretch
from phase_vocoder_tpu.ops import phase
from phase_vocoder_tpu.ops.pallas.fused import (
    fused_time_stretch,
    phasor_scan,
    phasor_supported,
    stft_phasor_terms,
)
from tests.conftest import make_test_signal

N, RA = 1024, 256


def rel_err(a, b, edge=N):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert len(a) == len(b), (len(a), len(b))
    sl = slice(edge, len(a) - edge)
    return np.max(np.abs(a[sl] - b[sl])) / np.max(np.abs(b[sl]))


@pytest.fixture(scope="module")
def x32k():
    return make_test_signal(2.0).astype(np.float32)


def test_phasor_supported_matrix():
    assert phasor_supported(1024, 256, 512)  # k=2 (stretch 2.0)
    assert phasor_supported(1024, 256, 256)  # k=1
    assert phasor_supported(1024, 256, 128)  # k=1/2 (stretch 0.5)
    assert phasor_supported(512, 64, 256)  # k=4
    assert not phasor_supported(1024, 256, 333)  # rs does not divide N
    assert not phasor_supported(1024, 256, 1024)  # no overlap
    assert not phasor_supported(1024, 256, 384)  # k=3/2 unsupported
    assert not phasor_supported(1024, 192, 256)  # Ra does not divide N


@pytest.mark.parametrize("stretch", [0.5, 1.0, 2.0])
def test_fused_vs_golden(stretch, x32k):
    """The headline gate: waveform allclose (<1e-4 rel) to the f64 golden
    model at every canonical stretch (BASELINE.json:5)."""
    ref = pv_ref.phase_vocoder(np.asarray(x32k, np.float64), stretch, N, RA)
    rs = PvocConfig().synthesis_hop(stretch)
    y = np.asarray(fused_time_stretch(x32k, N, RA, rs))
    assert rel_err(y, ref) < 1e-4


def test_fused_awkward_length():
    """Frame count far from a tile multiple, including the OLA spill rows
    (regression: the spill rows live in the main output when nf % tile != 0)."""
    x = make_test_signal(2.3141).astype(np.float32)
    ref = pv_ref.phase_vocoder(np.asarray(x, np.float64), 2.0, N, RA)
    y = np.asarray(fused_time_stretch(x, N, RA, 512))
    assert len(y) == len(ref)
    # interior strict, full range loose (edge normalization divides by
    # near-zero window energy — ill-conditioned in f32 for ANY backend)
    assert rel_err(y, ref) < 1e-4
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-2


def test_fused_integer_k4():
    """Integer hop ratios beyond 2 (k=4 at N=512, Ra=64)."""
    x = make_test_signal(1.0).astype(np.float32)
    ref = pv_ref.phase_vocoder(np.asarray(x, np.float64), 4.0, 512, 64)
    y = np.asarray(fused_time_stretch(x, 512, 64, 256))
    assert rel_err(y, ref, edge=512) < 1e-4


def test_time_stretch_routes_to_fused(x32k):
    """cfg.fft_backend='pallas' end to end == matmul backend."""
    a = np.asarray(time_stretch(x32k, 2.0, PvocConfig(fft_backend="pallas")))
    b = np.asarray(time_stretch(x32k, 2.0, PvocConfig(fft_backend="matmul")))
    # The two paths accumulate phase differently (phasor product vs wrapped
    # angle scan); each is <1e-5 from golden, so 5e-5 between them.
    assert rel_err(a, b) < 5e-5


def test_phasor_scan_matches_angle_scan(x32k):
    """Raw terms + phasor_scan == in-kernel scanned P (same math, two
    execution strategies — the scan=False path feeds the chunked program)."""
    import jax.numpy as jnp

    rs = 512
    mag, tre, tim, nf = stft_phasor_terms(x32k, N, RA, rs, scan=False)
    pre, pim = phasor_scan(tre, tim)
    mag2, qre, qim, _ = stft_phasor_terms(x32k, N, RA, rs, scan=True)
    assert np.allclose(np.asarray(mag), np.asarray(mag2), atol=1e-6)
    err = np.max(
        np.hypot(
            np.asarray(pre - qre, np.float64), np.asarray(pim - qim, np.float64)
        )[:nf]
    )
    assert err < 1e-4


def test_blocked_scan_matches_flat():
    """blocked_scan == associative_scan at awkward (non-power-of-two) sizes."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    for n in (1, 7, 129, 1000, 3001):
        t = jnp.asarray(rng.uniform(-3, 3, (n, 17)), jnp.float32)
        a = phase.blocked_scan(phase.wrap_add, t, block=128)
        b = jax.lax.associative_scan(phase.wrap_add, t, axis=0)
        d = np.abs(np.asarray(phase.princarg(a - b)))
        assert d.max() < 1e-5, (n, d.max())


@pytest.mark.parametrize("stretch", [0.5, 2.0])
def test_fused_chunked_matches_single_device(stretch):
    """Sequence-parallel fused program (phasor boundary exchange + U(1)
    prefix-product carry over the device axis) == single-device fused."""
    import jax
    from jax.sharding import Mesh

    from phase_vocoder_tpu.parallel.chunked import chunked_time_stretch

    x = make_test_signal(4.0)
    cfg = PvocConfig(fft_backend="pallas")
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    a = np.asarray(chunked_time_stretch(x, stretch, cfg, mesh=mesh))
    b = np.asarray(time_stretch(x, stretch, cfg))
    # XLA blocked scan (chunked) vs in-kernel scan (single device): same
    # math, different reduction trees; each <1e-5 from golden.
    assert rel_err(a, b) < 5e-5


def test_fused_unit_modulus():
    """Scanned P stays unit-modulus (renormalized combine)."""
    x = make_test_signal(1.0).astype(np.float32)
    mag, pre, pim, nf = stft_phasor_terms(x, N, RA, 512, scan=True)
    mod = np.hypot(np.asarray(pre), np.asarray(pim))[:nf, : N // 2 + 1]
    assert np.max(np.abs(mod - 1.0)) < 1e-5
