"""Phase unwrapping and synthesis-phase accumulation (components C7-C9).

The reference implements phase unwrap + accumulation as ONE THREAD PER BIN
with a serial loop over frames (SURVEY.md SS2.1 C8) — only ~513 live threads.
TPU-native design: the psi recurrence is a plain prefix sum
(psi = phi[0] + cumsum(Rs * IF), proven in tests/test_golden.py), so it
becomes a log-depth associative scan over the frame axis, fully parallel
over bins.

Two accumulation methods:

  * "cumsum" — the literal prefix sum. Bit-matches the golden recurrence but
    the running phase grows linearly with audio length (up to ~Rs*pi rad per
    frame), so float32 loses absolute precision beyond ~1e5 frames.

  * "wrapped_scan" — numerically exact for arbitrary length. Only
    psi mod 2*pi matters (psi feeds e^{i*psi}), and addition mod 2*pi is
    associative, so:
      psi_i mod 2pi = wrap( phi_0                                 (small)
                          + 2pi * ((i * (Rs*k mod N)) mod N) / N   (exact int)
                          + wrap(sum_{j<i} (Rs/Ra) * dphi_j) )     (assoc scan
                                                                    of wrapped
                                                                    partials)
    The linear term i*Rs*omega_k is evaluated in integer arithmetic modulo N
    (exact — no float drift ever), and the scan's partial sums stay in
    (-pi, pi] so f32 precision is independent of audio length. This is the
    foundation for the cross-device phase-state carry in parallel/chunked.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 6.283185307179586


def princarg(x: jnp.ndarray) -> jnp.ndarray:
    """Principal argument: wrap phase to (-pi, pi]. Matches golden princarg."""
    pi = jnp.asarray(jnp.pi, dtype=x.dtype)
    return pi - jnp.mod(pi - x, 2.0 * pi)


def wrap_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Associative addition modulo 2*pi, result in (-pi, pi]."""
    return princarg(a + b)


def heterodyne_increment(phi: jnp.ndarray, ra: int, n_fft: int) -> jnp.ndarray:
    """Wrapped heterodyned phase increment dphi (nf-1, n_bins).

    dphi[i,k] = princarg(phi[i+1,k] - phi[i,k] - Ra*omega_k). The expected
    advance Ra*omega_k is pre-reduced mod 2*pi via exact integer arithmetic
    ((k*Ra) mod N) so no precision is lost for large Ra*k.
    """
    n_bins = phi.shape[-1]
    k = jnp.arange(n_bins, dtype=jnp.int32)
    het = (TWO_PI / n_fft) * ((k * ra) % n_fft).astype(phi.dtype)
    return princarg(phi[1:] - phi[:-1] - het)


def instantaneous_frequency(dphi: jnp.ndarray, ra: int, n_fft: int) -> jnp.ndarray:
    """IF[i,k] = omega_k + dphi[i,k]/Ra, rad/sample (diagnostic/API parity)."""
    n_bins = dphi.shape[-1]
    k = jnp.arange(n_bins, dtype=dphi.dtype)
    omega = (TWO_PI / n_fft) * k
    return omega + dphi / ra


def accumulate_phase(
    phi: jnp.ndarray,
    dphi: jnp.ndarray,
    ra: int,
    rs: int,
    n_fft: int,
    method: str = "wrapped_scan",
    frame_offset: int = 0,
) -> jnp.ndarray:
    """Synthesis phase psi (nf, n_bins) for spectrum rebuild Y = mag*e^{i psi}.

    psi[0] = phi[0]; psi[i] = psi[i-1] + Rs*(omega + dphi[i-1]/Ra).
    Returned wrapped to (-pi, pi] for "wrapped_scan", unwrapped for "cumsum"
    (only e^{i psi} is consumed downstream, so both are equivalent).

    frame_offset: global index of frame 0 (used by the sequence-parallel
    path so the exact integer linear term stays globally consistent).
    """
    nf, n_bins = phi.shape
    dtype = phi.dtype
    if method == "cumsum":
        k = jnp.arange(n_bins, dtype=dtype)
        omega = (TWO_PI / n_fft) * k
        steps = rs * (omega + dphi / ra)  # (nf-1, n_bins)
        zero = jnp.zeros((1, n_bins), dtype=dtype)
        psi = phi[0] + jnp.concatenate([zero, jnp.cumsum(steps, axis=0)])
    elif method == "wrapped_scan":
        residual = accumulate_phase_residual(dphi, ra, rs)
        psi = finalize_phase(phi[0], residual, rs, n_fft, frame_offset)
    else:
        raise ValueError(f"unknown phase method {method!r}")
    return pin_real_bins(psi, phi, rs, n_fft, frame_offset)


def pin_real_bins(
    psi: jnp.ndarray, phi: jnp.ndarray, rs: int, n_fft: int, frame_offset: int = 0
) -> jnp.ndarray:
    """Deterministic convention for the forced-real DC/Nyquist bins.

    Their spectrum phase is exactly 0 or pi, so the heterodyned increment
    sits exactly on the princarg branch point every frame — accumulating it
    is chaotic under any precision change. Instead: per-frame analysis-phase
    pass-through plus the exact integer-arithmetic linear rotation
    i*Rs*omega_k (an integer multiple of pi at these bins). Keeps identity
    resynthesis exact; mirrors golden/pv_ref.py.
    """
    nf, n_bins = psi.shape
    psi = psi.at[:, 0].set(phi[:, 0])
    if n_fft % 2 == 0 and n_bins == n_fft // 2 + 1:
        off = jnp.asarray(frame_offset, jnp.int32) % n_fft
        i = (jnp.arange(nf, dtype=jnp.int32) + off) % n_fft
        kr = jnp.int32((rs * (n_fft // 2)) % n_fft)
        lin = (TWO_PI / n_fft) * ((i * kr) % n_fft).astype(psi.dtype)
        psi = psi.at[:, -1].set(phi[:, -1] + lin)
    return psi


def blocked_scan(fn, terms: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Inclusive associative scan over axis 0 with bounded compile cost.

    jax.lax.associative_scan at non-power-of-two lengths makes XLA's TPU
    pipeline pathological (measured: 186 s compile at 3749 rows vs 1.1 s at
    4096). This pads to B full power-of-two blocks of `block` rows, scans
    within blocks, scans the B block totals, and broadcasts the exclusive
    block prefix back — same O(log) depth, compile cost independent of
    length. `fn` must be associative with 0 as identity under padding
    (wrap_add and plain add both qualify: padded rows are zeros and their
    results are sliced off).
    """
    nf = terms.shape[0]
    if nf <= block:
        # Pad to the next power of two; tiny lengths stay single-level.
        p = 1
        while p < nf:
            p *= 2
        tp = jnp.pad(terms, ((0, p - nf),) + ((0, 0),) * (terms.ndim - 1))
        return jax.lax.associative_scan(fn, tp, axis=0)[:nf]
    nb = -(-nf // block)
    tp = jnp.pad(terms, ((0, nb * block - nf),) + ((0, 0),) * (terms.ndim - 1))
    tp = tp.reshape((nb, block) + terms.shape[1:])
    incl = jax.lax.associative_scan(fn, tp, axis=1)
    totals = incl[:, -1]
    prefix = jax.lax.associative_scan(fn, totals, axis=0)
    excl = jnp.concatenate([jnp.zeros_like(prefix[:1]), prefix[:-1]])
    out = fn(jnp.expand_dims(excl, 1), incl)
    return out.reshape((nb * block,) + terms.shape[1:])[:nf]


def accumulate_phase_residual(dphi: jnp.ndarray, ra: int, rs: int) -> jnp.ndarray:
    """Wrapped exclusive prefix sum of the residual terms (Rs/Ra)*dphi.

    Returns (nf, n_bins): residual[i] = wrap(sum_{j<i} (Rs/Ra)*dphi[j]).
    Split out so the chunked/sequence-parallel path can compute per-chunk
    residuals locally and combine cross-chunk carries with wrap_add.
    """
    scale = jnp.asarray(rs / ra, dtype=dphi.dtype)
    terms = princarg(scale * dphi)  # pre-wrap each term: mod is homomorphic
    zero = jnp.zeros((1, terms.shape[-1]), dtype=terms.dtype)
    inclusive = blocked_scan(wrap_add, terms)
    return jnp.concatenate([zero, inclusive])


def linear_phase_term(
    nf: int, n_bins: int, rs: int, n_fft: int, frame_offset: int = 0, dtype=jnp.float32
) -> jnp.ndarray:
    """Exact (mod 2*pi) linear phase i*Rs*omega_k, via integer arithmetic.

    i*Rs*2pi*k/N mod 2pi == 2pi * ((i mod N) * ((Rs*k) mod N) mod N) / N.
    All intermediates fit int32 for any audio length.
    """
    off = jnp.asarray(frame_offset, jnp.int32) % n_fft  # python int or traced
    i = (jnp.arange(nf, dtype=jnp.int32) + off) % n_fft
    k = jnp.arange(n_bins, dtype=jnp.int32)
    kr = (k * jnp.int32(rs % n_fft)) % n_fft  # (n_bins,)
    grid = (i[:, None] * kr[None, :]) % n_fft  # (nf, n_bins), < N^2 < 2^31
    return (TWO_PI / n_fft) * grid.astype(dtype)


def finalize_phase(
    phi0: jnp.ndarray,
    residual: jnp.ndarray,
    rs: int,
    n_fft: int,
    frame_offset: int = 0,
) -> jnp.ndarray:
    """psi (wrapped) = wrap(phi0 + exact linear term + wrapped residual)."""
    nf, n_bins = residual.shape
    linear = linear_phase_term(
        nf, n_bins, rs, n_fft, frame_offset=frame_offset, dtype=residual.dtype
    )
    return princarg(phi0[None, :] + linear + residual)
