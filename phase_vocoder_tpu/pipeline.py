"""Single-device phase-vocoder pipeline (reference component C3, rebuilt).

The reference's host orchestrator launches a sequence of CUDA kernels with
two H2D/D2H crossings (SURVEY.md SS3.2). TPU-native equivalent: the whole
analysis->modify->synthesis chain is ONE jitted XLA program — a single
device computation with all intermediate tensors fused/resident on chip,
compiled once per (input length, config, stretch) and cached.

Stage map (reference CUDA kernel -> this program):
  frame+window kernel      -> framing.frame_signal (+ window fused into DFT)
  cufftExecR2C             -> ops.fft.rfft        (MXU matmul or XLA FFT)
  cart2polar kernel        -> jnp hypot/arctan2   (fused elementwise)
  unwrap+accumulate kernel -> ops.phase           (associative scan)
  polar2cart kernel        -> jnp cos/sin         (fused elementwise)
  cufftExecC2R             -> ops.fft.irfft
  atomicAdd OLA kernel     -> framing.overlap_add (segmented reduction)
  normalize kernel         -> elementwise divide by OLA'd window^2
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import PvocConfig
from .ops import fft as fft_ops
from .ops import framing, phase
from .ops.resample import resample_linear
from .ops.window import hann_window

__all__ = [
    "analyze",
    "synthesize",
    "synthesize_polar",
    "stretch_frames",
    "stretch_polar",
    "time_stretch",
    "pitch_shift",
    "stretch_output_length",
]


def stretch_output_length(in_len: int, cfg: PvocConfig, stretch: float) -> int:
    nf = framing.num_frames(in_len, cfg.n_fft, cfg.hop)
    return framing.output_length(nf, cfg.n_fft, cfg.synthesis_hop(stretch))


def fused_ok(cfg: PvocConfig, rs: int) -> bool:
    """True when the fully fused phasor path (ops/pallas/fused.py) applies."""
    from .ops.pallas.fused import phasor_supported

    return cfg.fft_backend == "pallas" and phasor_supported(
        cfg.n_fft, cfg.hop, rs
    )


def phasor_general_ok(cfg: PvocConfig, rs: int) -> bool:
    """True when the SEMI-fused phasor path applies: rational hop ratio
    k = p/q (q in {1, 2, 4}) but a synthesis hop the fold-OLA single kernel
    cannot take (rs does not divide n_fft — e.g. stretch 1.5 -> Rs=384, or
    the -5/+7 st pitch hops Rs=192/384). Analysis + phase propagation ride
    the phasor-term Pallas kernel (no arctan2, no compensated angle scan);
    synthesis is the cart inverse-DFT kernel + general scatter-free fold."""
    from .ops.pallas.fused import phasor_terms_supported

    return (
        cfg.fft_backend == "pallas"
        and not fused_ok(cfg, rs)
        and phasor_terms_supported(cfg.n_fft, cfg.hop, rs)
    )


def phasor_general_stretch(x: jnp.ndarray, cfg: PvocConfig, rs: int) -> jnp.ndarray:
    """Semi-fused TSM for general synthesis hops (see phasor_general_ok)."""
    from .ops.pallas import istft_frames_cart
    from .ops.pallas.fused import stft_phasor_terms

    n, ra = cfg.n_fft, cfg.hop
    with jax.named_scope("pvoc_phasor_general"):
        mag, pre, pim, nf = stft_phasor_terms(x, n, ra, rs, scan=True)
        n_bins = cfg.n_bins
        y_re = (mag * pre)[:nf, :n_bins]
        y_im = (mag * pim)[:nf, :n_bins]
        y_frames = istft_frames_cart(y_re, y_im, n)
        out = framing.overlap_add(y_frames, rs, method="fold")
        w = hann_window(n, dtype=mag.dtype)
        norm = framing.ola_window_norm(w, nf, rs, method="fold")
        return out / norm


def pallas_analysis_ok(cfg: PvocConfig) -> bool:
    return cfg.fft_backend == "pallas" and cfg.n_fft % cfg.hop == 0


def pallas_synthesis_ok(cfg: PvocConfig, rs: int) -> bool:
    return (
        cfg.fft_backend == "pallas"
        and cfg.n_fft % rs == 0
        and cfg.n_fft // rs >= 2
    )


def analyze(x: jnp.ndarray, cfg: PvocConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed STFT -> (mag, phi), each (nf, n_bins)."""
    with jax.named_scope("pvoc_analyze"):
        if pallas_analysis_ok(cfg):
            from .ops.pallas import stft_polar

            return stft_polar(x, cfg.n_fft, cfg.hop)
        frames = framing.frame_signal(x, cfg.n_fft, cfg.hop)
        if cfg.fft_backend == "xla":
            w = hann_window(cfg.n_fft, dtype=x.dtype)
            re, im = fft_ops.rfft(frames * w, backend="xla")
        else:  # "matmul", and the fallback for unsupported pallas geometries
            re, im = fft_ops.rfft(frames, backend="matmul", fused_window=True)
        mag = jnp.sqrt(re * re + im * im)
        phi = jnp.arctan2(im, re)
        return mag, phi


def stretch_polar(
    mag: jnp.ndarray, phi: jnp.ndarray, cfg: PvocConfig, rs: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Frequency-domain TSM in polar form: (mag, accumulated synthesis phase)."""
    with jax.named_scope("pvoc_tsm"):
        dphi = phase.heterodyne_increment(phi, cfg.hop, cfg.n_fft)
        psi = phase.accumulate_phase(
            phi, dphi, cfg.hop, rs, cfg.n_fft, method=cfg.phase_method
        )
        return mag, psi


def stretch_frames(
    mag: jnp.ndarray, phi: jnp.ndarray, cfg: PvocConfig, rs: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Frequency-domain TSM: rebuild (re, im) with accumulated synthesis phase."""
    mag, psi = stretch_polar(mag, phi, cfg, rs)
    return mag * jnp.cos(psi), mag * jnp.sin(psi)


def synthesize_polar(
    mag: jnp.ndarray,
    psi: jnp.ndarray,
    cfg: PvocConfig,
    rs: int,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Polar-form synthesis; routes to the fused Pallas iSTFT+OLA kernel
    when supported, else the (re, im) XLA path."""
    if pallas_synthesis_ok(cfg, rs):
        from .ops.pallas import istft_ola

        with jax.named_scope("pvoc_synthesize"):
            out = istft_ola(mag, psi, cfg.n_fft, rs, frame_mask=frame_mask)
            w = hann_window(cfg.n_fft, dtype=mag.dtype)
            norm = framing.ola_window_norm(
                w, mag.shape[0], rs, method="fold", frame_mask=frame_mask
            )
            return out / norm
    if cfg.fft_backend == "pallas":
        # General synthesis hop (rs does not divide n_fft — the non-octave
        # pitch path): polar->cart + inverse DFT fuse in one kernel, the
        # scatter-free general fold OLA runs on the windowed frames.
        from .ops.pallas import istft_frames

        with jax.named_scope("pvoc_synthesize"):
            y_frames = istft_frames(mag, psi, cfg.n_fft, frame_mask=frame_mask)
            out = framing.overlap_add(y_frames, rs, method="fold")
            w = hann_window(cfg.n_fft, dtype=mag.dtype)
            norm = framing.ola_window_norm(
                w, mag.shape[0], rs, method="fold", frame_mask=frame_mask
            )
            return out / norm
    return synthesize(
        mag * jnp.cos(psi), mag * jnp.sin(psi), cfg, rs, frame_mask=frame_mask
    )


def synthesize(
    re: jnp.ndarray,
    im: jnp.ndarray,
    cfg: PvocConfig,
    rs: int,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inverse FFT, synthesis window, overlap-add, COLA normalization.

    frame_mask: optional (nf,) 0/1 weights marking valid frames — padding
    frames (batched ragged utterances, sequence-parallel tail chunks) are
    zeroed in both the signal and the window-energy normalization so the
    result matches an unpadded run exactly.
    """
    with jax.named_scope("pvoc_synthesize"):
        if cfg.fft_backend == "xla":
            w = hann_window(cfg.n_fft, dtype=re.dtype)
            y_frames = fft_ops.irfft(re, im, cfg.n_fft, backend="xla") * w
        else:  # "matmul", and the fallback for unsupported pallas geometries
            y_frames = fft_ops.irfft(
                re, im, cfg.n_fft, backend="matmul", fused_window=True
            )
        if frame_mask is not None:
            y_frames = y_frames * frame_mask[:, None].astype(y_frames.dtype)
        out = framing.overlap_add(y_frames, rs, method=cfg.ola_method)
        w = hann_window(cfg.n_fft, dtype=re.dtype)
        norm = framing.ola_window_norm(
            w, y_frames.shape[0], rs, method=cfg.ola_method, frame_mask=frame_mask
        )
        return out / norm


@functools.partial(jax.jit, static_argnums=(1, 2))
def _time_stretch_jit(x: jnp.ndarray, cfg: PvocConfig, rs: int) -> jnp.ndarray:
    if fused_ok(cfg, rs):
        from .ops.pallas.fused import fused_time_stretch

        return fused_time_stretch(x, cfg.n_fft, cfg.hop, rs)
    if phasor_general_ok(cfg, rs):
        return phasor_general_stretch(x, cfg, rs)
    mag, phi = analyze(x, cfg)
    mag, psi = stretch_polar(mag, phi, cfg, rs)
    return synthesize_polar(mag, psi, cfg, rs)


# Frame count above which "auto" branch policy reroutes q >= 2 hop ratios
# to the branch-faithful polar path: ~600 s at 16 kHz / 256 hop — the
# shortest length at which the fused phasor paths have been measured over
# the 1e-4 gate on branch-dense content (ACCURACY_r05: fused 0.24 vs
# polar 5.4e-7 on the 600 s aliasing sweep; both ~1e-5 at 60 s).
BRANCH_FAITHFUL_FRAMES = 37_500


def _reduced_q(cfg: PvocConfig, rs: int) -> int:
    from .ops.pallas.fused import _rational_k

    return _rational_k(rs, cfg.hop)[1]


def time_stretch(
    x,
    stretch: float,
    cfg: PvocConfig = PvocConfig(),
    max_monolithic_frames: int = 4096,
    max_phasor_general_frames: int = 1 << 18,
    branch_policy: str = "auto",
) -> jnp.ndarray:
    """Time-scale-modify a 1-D waveform by `stretch` (duration multiplier).

    Pitch is preserved; output length ~= stretch * input length. Short
    inputs run as one jitted program; recordings beyond
    `max_monolithic_frames` (~65 s at 16 kHz/256 hop) route through the
    streaming segmented executor, whose compile cost is constant in length
    (XLA compile time grows superlinearly with the monolithic graph).

    The fused single-kernel path is exempt from the reroute: its compile
    cost AND live memory are length-independent (samples in, waveform out,
    VMEM intermediates only). The SEMI-fused phasor path is exempt only up
    to `max_phasor_general_frames` (~70 min at 16 kHz/256 hop): it
    materializes five (nf_pad, 640) f32 phasor-term tensors plus the
    (nf, n_fft) frames in HBM, so unbounded inputs would OOM where the
    streaming executor runs in bounded memory (ADVICE r04).

    branch_policy governs NON-integer hop ratios (q >= 2, e.g. stretch
    0.5 / 1.5 / non-octave pitch hops), whose princarg branch decisions
    the phasor-form kernels resolve in a different rounding pattern from
    the f64 golden — harmless on typical content, but on branch-dense
    signals (aliasing sweeps) isolated pi-flips accumulate past the 1e-4
    gate beyond ~10 min (ACCURACY_r05 experiment: fused 0.24 vs golden at
    600 s where the angle-domain polar path reads 5.4e-7 — the polar
    formula mirrors the golden's branch choices op-for-op). "auto"
    (default) reroutes q >= 2 inputs longer than BRANCH_FAITHFUL_FRAMES
    to the branch-faithful polar streaming executor (~3x the fused path's
    wall on those inputs — measured in PROFILE_r05); "faithful" always
    routes q >= 2 there; "fast" never reroutes (bounded-drift phasor
    kernels at full speed). Integer k is exempt: the closed form has no
    branch cuts and is gate-clean at every measured length.
    """
    dtype = jnp.dtype(cfg.dtype)
    x = jnp.asarray(x, dtype=dtype)
    rs = cfg.synthesis_hop(stretch)
    nf = framing.num_frames(x.shape[-1], cfg.n_fft, cfg.hop)
    if nf <= 0:
        return jnp.zeros((0,), dtype=dtype)
    if branch_policy not in ("auto", "fast", "faithful"):
        raise ValueError(f"unknown branch_policy {branch_policy!r}")
    if _reduced_q(cfg, rs) > 1 and (
        branch_policy == "faithful"
        or (branch_policy == "auto" and nf > BRANCH_FAITHFUL_FRAMES)
    ):
        from . import streaming

        return streaming.stream_time_stretch(x, stretch, cfg)
    if not fused_ok(cfg, rs) and nf > max_monolithic_frames:
        general_ok = (
            phasor_general_ok(cfg, rs) and nf <= max_phasor_general_frames
        )
        if not general_ok:
            from . import streaming

            return streaming.stream_time_stretch(x, stretch, cfg)
    return _time_stretch_jit(x, cfg, rs)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _pitch_shift_jit(x, cfg: PvocConfig, rs: int, factor: float, out_len: int):
    if fused_ok(cfg, rs):
        # Octave shifts (+-12 st -> k in {1/2, 2}) and any other geometry
        # phasor_supported covers ride the single fused kernel; the linear
        # resampler fuses into the same jitted program.
        from .ops.pallas.fused import fused_time_stretch

        y = fused_time_stretch(x, cfg.n_fft, cfg.hop, rs)
    elif phasor_general_ok(cfg, rs):
        # Rational k with rs ∤ n_fft (e.g. -5 st -> Rs=192, k=3/4; +7 st
        # -> Rs=384, k=3/2): the semi-fused phasor path — phasor-term
        # analysis kernel + cart inverse-DFT kernel + general fold OLA.
        y = phasor_general_stretch(x, cfg, rs)
    else:
        # Irreducible hop ratios (e.g. -7 st -> rs=171, +5 st -> rs=342 at
        # Ra=256, both with q > 4): the polar path with the general
        # scatter-free fold OLA runs instead (measured and documented in
        # README / bench --pitch).
        mag, phi = analyze(x, cfg)
        mag, psi = stretch_polar(mag, phi, cfg, rs)
        y = synthesize_polar(mag, psi, cfg, rs)
    return resample_linear(y, 1.0 / factor, out_len)


def pitch_shift(
    x,
    semitones: float,
    cfg: PvocConfig = PvocConfig(),
    branch_policy: str = "auto",
) -> jnp.ndarray:
    """Pitch-shift by `semitones` via time-stretch + resample (C12 parity).

    Duration is preserved; pitch moves by 2^(semitones/12). branch_policy
    as in time_stretch: long q >= 2 inputs reroute the stretch stage to
    the branch-faithful polar streaming executor.
    """
    dtype = jnp.dtype(cfg.dtype)
    x = jnp.asarray(x, dtype=dtype)
    factor = 2.0 ** (semitones / 12.0)
    rs = cfg.synthesis_hop(factor)
    stretched_len = stretch_output_length(x.shape[-1], cfg, factor)
    if stretched_len <= 0:
        return jnp.zeros((0,), dtype=dtype)
    out_len = int(round(stretched_len / factor))
    nf = framing.num_frames(x.shape[-1], cfg.n_fft, cfg.hop)
    if _reduced_q(cfg, rs) > 1 and (
        branch_policy == "faithful"
        or (branch_policy == "auto" and nf > BRANCH_FAITHFUL_FRAMES)
    ):
        from . import streaming

        y = streaming.stream_time_stretch(x, factor, cfg)
        return _resample_jit(y, factor, out_len)
    return _pitch_shift_jit(x, cfg, rs, factor, out_len)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _resample_jit(y, factor: float, out_len: int):
    return resample_linear(y, 1.0 / factor, out_len)
