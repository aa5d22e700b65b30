"""Fused phasor-form TSM — the TPU speed-of-light path.

Replaces the polar round trip (arctan2 -> wrapped-angle scan -> cos/sin)
of reference components C7-C9 with pure complex arithmetic. For rational
synthesis/analysis hop ratios k = Rs/Ra in {1/2, 1, 2, 3, ...} the entire
phase propagation is phasor algebra, with NO transcendentals anywhere:

  u_i        = X_i / |X_i|                       (unit analysis phasor)
  z_i        = u_i * conj(u_{i-1}) * e^{-i Ra w} (heterodyned step phasor,
                                                  = e^{i princarg(dphi_i)})
  term_i     = e^{i Rs w} * z_i^k                (synthesis step phasor;
                                                  exact for integer k since
                                                  e^{i k princarg(d)} =
                                                  (e^{i d})^k mod 2pi; for
                                                  k = 1/2 the principal
                                                  square root, Re >= 0,
                                                  equals e^{i princarg(d)/2})
  term_0     = u_0                               (absolute phase anchor)
  P_i        = prod_{j<=i} term_j = e^{i psi_i}  (renormalized prefix prod)
  Y_i        = |X_i| * P_i

For INTEGER k the prefix product TELESCOPES to a closed form (round 3):
e^{ik princarg(d)} = (e^{id})^k for integer k, and the u_j conj(u_{j-1})
chain collapses, so P_i = u_0 (u_i conj(u_0))^k with NO recurrence at all —
no scan, no cross-tile carry, no cross-device carry collectives (validated
vs the f64 golden at 1e-10 for k=1..4; see _pvoc_tile). k = 1/2 does not
telescope (principal square roots do not commute with the product across
branch cuts) and keeps the log-depth associative scan (the same
factorization as ops/phase.py, in the group U(1) instead of (R mod 2pi,
+)); its combine renormalizes so magnitude drift never accumulates.
DC/Nyquist bins use the
pinned convention of phase.pin_real_bins, expressed in phasor form via a
lane mask (term = u_i conj(u_{i-1}) * (-1)^{Rs [k=N/2]}, which telescopes
to per-frame phase pass-through plus the exact linear rotation).

Three stages, two Pallas kernels:

  1. `stft_phasor_terms` (Pallas) — framing (in-VMEM via pltpu.roll of a
     two-tile rows block; the (nf, N) frames tensor never exists in HBM)
     + Hann-windowed DFT (MXU matmuls) + phasor-term computation.
     Cross-tile state (previous frame's unit phasor) is carried in VMEM
     scratch across the sequential TPU grid.
  2. `phasor_scan` (XLA) — blocked associative scan (ops/phase.blocked_scan)
     of the complex terms; power-of-two blocks keep XLA compile O(1) in
     recording length.
  3. `phasor_istft_ola` (Pallas) — Y = mag * P, inverse windowed DFT (MXU),
     deterministic fold overlap-add with the tail carried in VMEM scratch
     (the reference's atomicAdd C11, race-free).

The Pallas kernels double as XLA fusion barriers: the monolithic all-XLA
program triggers pathological fusion/scheduling at large nf (measured 195 s
compile for 600 s of audio), while this path compiles in seconds at any
length.

The single-kernel path (`fused_time_stretch`/`_pvoc_kernel`) additionally
PACKS the bin axis (_packed_mats): the two forced-real bins (DC, Nyquist)
share lane 0 — DC in the re channel, Nyquist in the im channel, riding the
identically-zero DC-sine column — so the matmul lane count is exactly
n_fft//2 (512 at N=1024) instead of pad(n_fft//2+1) (640): 20% off every
MXU pass. The split kernels below keep the unpacked pad(n_bins) layout the
sequence-parallel path shares across devices.

Reference parity: davispolito/Phase-Vocoder kernel.cu implements C7-C9 as a
serial per-bin loop over frames (SURVEY.md SS2.1); this module is its
TPU-native replacement, waveform-allclose to the float64 golden model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..framing import num_frames
from ..phase import blocked_scan
from .stft import (
    _PRECISION,
    _TILE_F,
    _interpret,
    _out_struct,
    _pad_bins,
    _dft_mats_padded,
    _idft_mats_padded,
)

__all__ = [
    "phasor_supported",
    "phasor_terms_supported",
    "stft_phasor_terms",
    "phasor_scan",
    "phasor_istft_ola",
    "fused_time_stretch",
    "fused_time_stretch_batch",
    "fused_stream_segment",
]

# Numerical notes:
#  * k = Rs/Ra integer: exact modulo 2*pi (integer powers commute with the
#    principal branch), error ~1e-5 rel vs the f64 golden out to >=1 hour.
#  * k = 1/2: the half-angle of princarg(delta) is DISCONTINUOUS at
#    delta = pi. When a bin's heterodyned increment lands within f32 noise
#    (~1e-6 rad) of the branch point, any f32 implementation (this one and
#    the polar paths alike — measured) can pick the opposite branch from
#    the f64 golden, flipping that bin's synthesis phase by pi from that
#    frame on. For typical audio this is rare; pathological content
#    (aliased chirps sweeping every bin) makes it likely after minutes.
#    All canonical gates (stretch 0.5/1/2 on normal-length material, 2x on
#    hour-long material) pass at <1e-4.

_TINY = 1e-30

# Framing construction inside the kernels: "roll" = pltpu.roll of the
# two-tile rows block (sublane rotate, always aligned); "slice" = static
# sublane-offset slices block[s : s + tile] (Mosaic inserts a relayout for
# non-multiple-of-8 offsets — may beat the full rotate since only `tile`
# of the 2*tile rows are kept). Measured A/B on chip in PROFILE_r04;
# trace-time knob — jax.clear_caches() after flipping.
_FRAMING = "roll"


def set_framing_mode(mode: str) -> None:
    """EXPERIMENTAL profiler A/B knob — 'slice' re-enables the framing
    variant CLAUDE.md records as measured-and-rejected (Mosaic HTTP-500s at
    some geometries). Trace-time global: caches are cleared here so stale
    kernels cannot survive the flip (ADVICE r04)."""
    global _FRAMING
    assert mode in ("roll", "slice"), mode
    if mode != _FRAMING:
        _FRAMING = mode
        jax.clear_caches()


def _build_frames(rows_a, rows_b, tile: int, overlap: int):
    """(tile, overlap*hop) frame tile from two consecutive rows tiles."""
    block = jnp.concatenate([rows_a, rows_b], axis=0)  # (2*tile, hop)
    if _FRAMING == "slice":
        parts = [block[s : s + tile] for s in range(overlap)]
    else:
        nb2 = 2 * tile  # pltpu.roll needs non-negative shifts: -s == nb2-s
        parts = [
            (pltpu.roll(block, nb2 - s, 0) if s else block)[:tile]
            for s in range(overlap)
        ]
    return jnp.concatenate(parts, axis=-1)

def _compiler_params(n_fft: int):
    """Mosaic params for the single-kernel pallas_calls — raises the
    scoped-VMEM stack limit for large geometries only.

    At N=2048 the DFT matrix operands alone are ~18 MB (2 f32 + 5 bf16
    half-size (N/2)^2 matrices after the even/odd fold), over Mosaic's
    default 16 MB scoped limit at ANY frame tile (measured r05 GEOM:
    18.75-19.11M stack at tiles 16-64). v5e has 128 MB VMEM; raising the
    per-kernel limit is the intended escape hatch. None at the canonical
    N<=1024 so the measured headline configuration stays byte-identical.
    """
    if n_fft <= 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pick_tile(n_fft: int, rs: int, nf: int) -> int:
    """Frames per grid step for the single-kernel path.

    256 at the canonical N<=1024: the r04 re-sweep (PROFILE_r04.json)
    showed 256 is the robust optimum — 320/384/448/512 measured within or
    below one session's noise band of it, and cross-session deltas up to
    7% of a 94 ms call turned out to be remote-tunnel dispatch variance,
    not kernel speed (see PROFILE_r04 `dispatch_overhead`; bench.py
    amortizes it by chaining invocations per dispatch). 384 additionally
    trips Mosaic's grid-count-dependent scoped-VMEM limit at some lengths
    (r03). Larger N scales the tile down to hold the VMEM working set
    (~tile x n_fft frame block + DFT matrices) constant: tile 256 at
    N=2048 exceeds the 16 MB scoped-VMEM stack limit (measured r05, GEOM
    runs). The split kernels keep stft._TILE_F=128 (layouts shared with
    the chunk programs)."""
    if n_fft <= 1024:
        return 256
    # Scoped-VMEM stack use grows faster than linearly in n_fft (the frame
    # block, fold operands, reversal splits, and the m-segment OLA buffers
    # all widen): tile 128 at N=2048 still measured 19.4M > the 16M limit
    # (r05 GEOM), tile 64 compiles at rs=1024 (overlap 2).
    tile = max(16, (256 * 1024 * 1024 // (n_fft * n_fft)) // 8 * 8)
    # Deep overlaps widen the per-tile OLA working set further: at
    # N=2048/rs=256 (overlap 8) tile 64 still stacked 18.75M > 16M
    # (r05 GEOM, 60 s gate), so scale by overlap/2 beyond overlap 2.
    m = -(-n_fft // rs)
    if m > 2:
        tile = max(16, (tile // (m // 2)) // 8 * 8)
    return tile


def phasor_supported(n_fft: int, ra: int, rs: int, max_int_k: int = 8) -> bool:
    """True when the fully fused single-kernel phasor path covers this
    geometry.

    Needs the fold framing layout (Ra | N, even N) and overlap >= 2
    (2*Rs <= N). Since round 5 the synthesis hop is UNRESTRICTED below
    N/2: rs | n_fft rides the exact roll fold OLA as before, and general
    hops (e.g. the -7/+5 st pitch hops Rs=171/342, or stretch 1.5 ->
    Rs=384) use the ceil-segment fold with a zero-padded last segment —
    same kernel, same closed-form/scan phase machinery, with q-general
    hop ratios handled by the angle-domain term path (_pow_k). Covers
    every BASELINE operating point plus all +-12 st pitch hops.
    """
    if n_fft % ra != 0 or n_fft % 2 != 0 or rs <= 0 or 2 * rs > n_fft:
        return False
    p, q = _rational_k(rs, ra)
    if q in (1, 2, 4) and p > max_int_k:
        # Huge integer multiples would unroll _int_pow excessively; the
        # angle-domain path covers them, so still supported.
        return True
    return True


def fold_ola_supported(n_fft: int, rs: int) -> bool:
    """True when rs | n_fft with overlap >= 2 — the layouts the SPLIT
    synthesis kernel (phasor_istft_ola) and the chunked fused body share."""
    return n_fft % rs == 0 and n_fft // rs >= 2


def phasor_terms_supported(n_fft: int, ra: int, rs: int, max_p: int = 8) -> bool:
    """True when the SPLIT phasor path (stft_phasor_terms + general-hop
    synthesis) covers this geometry — no constraint on rs at all beyond
    positivity: rational hops ride the algebraic root/power path (q in
    {1, 2, 4}) and everything else the angle-domain path (_pow_k general
    branch), instead of the polar arctan2 + compensated-scan path.
    """
    return n_fft % ra == 0 and rs > 0


def _rational_k(rs: int, ra: int) -> tuple[int, int]:
    """Reduced (p, q) with k = Rs/Ra = p/q."""
    import math

    g = math.gcd(rs, ra)
    return rs // g, ra // g


def _int_pow(zre, zim, k: int):
    """z^k for non-negative integer k — squaring, statically unrolled."""
    rre = jnp.ones_like(zre)
    rim = jnp.zeros_like(zim)
    base_re, base_im = zre, zim
    e = k
    while e > 0:
        if e & 1:
            rre, rim = (
                rre * base_re - rim * base_im,
                rre * base_im + rim * base_re,
            )
        e >>= 1
        if e:
            base_re, base_im = (
                base_re * base_re - base_im * base_im,
                2.0 * base_re * base_im,
            )
    return rre, rim


def _principal_sqrt(zre, zim):
    """Principal square root (Re >= 0) of unit-modulus z, elementwise.

    Half-angle of princarg(d) lands in (-pi/2, pi/2]; the zim >= 0 branch
    at zre = -1 picks +i, matching princarg(pi) = pi -> pi/2. Branch on
    sign(zre) so neither sqrt suffers cancellation (1+zre near zre=-1
    loses half the mantissa, which would random-walk into the prefix
    product over long audio).
    """
    re_pos = jnp.sqrt(jnp.maximum(0.5 * (1.0 + zre), 0.25))  # zre >= 0
    im_pos = zim / (2.0 * re_pos)
    t_neg = jnp.sqrt(jnp.maximum(0.5 * (1.0 - zre), 0.25))  # zre < 0
    im_neg = jnp.where(zim >= 0, t_neg, -t_neg)
    re_neg = jnp.abs(zim) / (2.0 * t_neg)
    pos = zre >= 0
    return (
        jnp.where(pos, re_pos, re_neg),
        jnp.where(pos, im_pos, im_neg),
    )


_PI_F32 = 3.14159265358979
_PIO2_F32 = 1.5707963267948966
_PIO4_F32 = 0.7853981633974483
_TAN_PIO8 = 0.41421356237309503


def _atan2(y, x):
    """Principal-branch atan2 with the kernel-safe polynomial lowering.

    Mosaic has no atan/atan2 lowering (ops/pallas/stft.py note, re-verified
    round 5), so this is the Cephes-style f32 atan: reduce |y/x| into
    [0, tan(pi/8)] with at most one (t-1)/(t+1) fold, a degree-9 odd
    minimax polynomial (~1 ulp on the reduced range), then quadrant
    reconstruction. Matches princarg's (-pi, pi] convention: y == +-0 with
    x < 0 returns +pi (golden/pv_ref.py princarg(pi) = pi). Absolute angle
    error measured < 4e-7 rad vs f64 (tests/test_fused.py), inside the
    phasor paths' per-term rounding budget.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(jnp.maximum(ax, ay), _TINY)
    t = num / den
    big = t > _TAN_PIO8
    z = jnp.where(big, (t - 1.0) / (t + 1.0), t)
    s = z * z
    p = jnp.float32(8.05374449538e-2)
    p = p * s - jnp.float32(1.38776856032e-1)
    p = p * s + jnp.float32(1.99777106478e-1)
    p = p * s - jnp.float32(3.33329491539e-1)
    r = p * s * z + z
    r = jnp.where(big, r + jnp.float32(_PIO4_F32), r)
    r = jnp.where(swap, jnp.float32(_PIO2_F32) - r, r)
    r = jnp.where(x < 0, jnp.float32(_PI_F32) - r, r)
    return jnp.where(y < 0, -r, r)


def _pow_k(zre, zim, rs: int, ra: int):
    """z^k for rational k = rs/ra, unit z, elementwise.

    e^{i k princarg(d)}. Two regimes:

      * q in {1, 2, 4}, small p (every BASELINE hop): principal q-th root
        FIRST (for q = 2^j, j nested principal square roots — arg lands in
        (-pi/q, pi/q], exactly princarg(d)/q), then the integer p-th power
        (angles < pi so no wrap). Pure algebra, no transcendentals. q = 1
        is the exact integer path; q > 1 inherits the k = 1/2 branch-cut
        caveat (see the numerical notes at the top of this module).
      * general q (irreducible hops — e.g. the -7/+5 st pitch hops
        k = 171/256, 171/128; round 5): angle domain. theta =
        atan2(zim, zre) = princarg(d) exactly as the golden computes it,
        then e^{i k theta} via cos/sin. Nested principal roots were
        REJECTED for this regime: the p-th power amplifies the root
        chain's ~1e-7 rad error by p (~3.4e-5 rad/term at p=171), a
        random walk over frames that breaches the 1e-4 gate within
        minutes; the trig path keeps per-term error at the f32 atan/cos
        floor (~3e-7 rad).
    """
    p, q = _rational_k(rs, ra)
    if q in (1, 2, 4) and p <= 8 and (q == 1 or _Q_ALGEBRAIC):
        wre, wim = zre, zim
        for _ in range(q.bit_length() - 1):
            wre, wim = _principal_sqrt(wre, wim)
        if p == 1:
            return wre, wim
        return _int_pow(wre, wim, p)
    k = jnp.float32(p / q)  # dyadic-exact for power-of-two analysis hops
    ang = _atan2(zim, zre) * k
    return jnp.cos(ang), jnp.sin(ang)


# q in {2, 4} term path: True = principal-root algebra (no
# transcendentals), False = the angle-domain (atan2 + cos/sin) path the
# general-q hops use. A/B knob for the branch-tracking accuracy experiment
# (VERDICT r04 #2); the two differ only in rounding pattern near the
# princarg branch point. Integer q = 1 always stays algebraic (exact).
_Q_ALGEBRAIC = True


def set_q_algebraic(enabled: bool) -> None:
    global _Q_ALGEBRAIC
    if enabled != _Q_ALGEBRAIC:
        _Q_ALGEBRAIC = enabled
        jax.clear_caches()


def _split32(x):
    """Split f32 into (hi, lo) bf16 whose sum reconstructs ~16 mantissa bits.

    Integer bitmask split (truncate low 16 bits) — immune to the
    --xla_allow_excess_precision rewrite that folds the arithmetic
    round-trip split (a - f32(bf16(a))) into zero on this platform.
    """
    xi = pltpu.bitcast(x, jnp.uint32)
    hi = pltpu.bitcast(xi & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = x - hi
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _dot_bf16(a, bh, bl, passes: int):
    """bf16-split emulation of an f32 matmul in `passes` MXU passes.

    `a` is bitmask-split in-kernel (exact: bf16 IS the top 16 bits of f32);
    bh/bl hold the host-side hi/lo bf16 split. passes=3 drops the
    al*bl cross term (~1e-5 rel error at K=1024); passes=4 keeps it
    (~1e-6 — the residual is only the bf16 rounding of the lo halves).
    Precision.HIGHEST costs 6 passes on this Mosaic by comparison."""
    ah, al = _split32(a)
    r = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
    r = r + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
    r = r + jnp.dot(al, bh, preferred_element_type=jnp.float32)
    if passes >= 4:
        r = r + jnp.dot(al, bl, preferred_element_type=jnp.float32)
    return r


def _bitsplit_host(m: np.ndarray):
    """Host-side bitmask hi/lo bf16 split (hi exact, lo rounds to bf16)."""
    import ml_dtypes

    hi = (m.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)
    lo = m - hi
    return hi.astype(ml_dtypes.bfloat16), lo.astype(ml_dtypes.bfloat16)


@functools.lru_cache(maxsize=16)
def _packed_mats(n_fft: int):
    """PACKED forward/inverse windowed DFT matrices (f32).

    Lane k holds bin k for k in [1, n_fft//2); lane 0 packs BOTH forced-real
    bins — DC in the cos/re channel and Nyquist in the sin/im channel, whose
    DC column (-sin(0)=0) / Nyquist column (-sin(pi t)=0) are identically
    zero anyway. The bin axis shrinks from pad(n_fft//2+1) lanes to
    pad(n_fft//2): at N=1024 that is 640 -> 512, i.e. 20% off every DFT
    matmul in the monolithic kernel.
    """
    n_bins = n_fft // 2 + 1
    nh = n_fft // 2
    nbq = _pad_bins(nh)
    fc, fs = _dft_mats_padded(n_fft)
    ic, is_ = _idft_mats_padded(n_fft)
    fcq = np.zeros((n_fft, nbq), np.float32)
    fsq = np.zeros((n_fft, nbq), np.float32)
    fcq[:, :nh] = fc[:, :nh]
    fsq[:, :nh] = fs[:, :nh]
    fsq[:, 0] = fc[:, n_bins - 1]  # Nyquist rides the zero DC-sine lane
    icq = np.zeros((nbq, n_fft), np.float32)
    isq = np.zeros((nbq, n_fft), np.float32)
    icq[:nh] = ic[:nh]
    isq[:nh] = is_[:nh]
    isq[0] = ic[n_bins - 1]
    return fcq, fsq, icq, isq


@functools.lru_cache(maxsize=16)
def _packed_split(n_fft: int):
    """Bitmask hi/lo bf16 split of the packed matrices (8 arrays)."""
    out = []
    for m in _packed_mats(n_fft):
        out += list(_bitsplit_host(m))
    return tuple(out)


@functools.lru_cache(maxsize=16)
def _fold_consts(n_fft: int):
    """Even/odd-fold constants: (Mc, Ms, Ic2, Is2, rows8, R).

    The real-input DFT splits over t <-> N-t symmetry: with e[t] =
    w[t](x[t]+x[N-t]) and o[t] = w[t](x[t]-x[N-t]) (t in [1, N/2)),
    re = E @ Mc and im = O @ Ms with HALF-length (N/2 x N/2) matrices —
    half the MXU volume of the direct windowed DFT. Lane 0 of E carries
    the self-paired sample x[N/2] (w[N/2] = 1; w[0] = 0 kills t=0), via
    Mc row 0 = (-1)^k. The inverse uses the same symmetry backwards:
    E' = y_re @ Ic2 (even part), Q' = y_im @ Is2 (odd part), lower half
    y[t] = E'+Q', upper half y[N-t] = E'-Q' (reversed), y[N/2] and the
    packed-Nyquist contributions via VPU lane reductions.

    rows8 rows: 0 wE (w, lane0=0) | 1 wR (w, lane0=1) | 2 wO (w, lane0=0)
    | 3 snyq ((-1)^t, lane0=(-1)^{N/2}) | 4 cnyq ((1/N)(-1)^t) | 5 v512
    ((wk/N)(-1)^k) | 6 w_lo (w[:N/2]) | 7 w_hi (w[N/2:]).

    R is the bf16 permutation with R[i,t] = [ (i+t) % L == 0 ]: x @ R is
    the reversed-and-rolled view x[:, (L-t) mod L] used by both folds.
    """
    import ml_dtypes

    N = n_fft
    L = N // 2
    assert L % 2 == 0, "fold requires n_fft % 4 == 0"
    tpair = np.arange(1, L, dtype=np.float64)
    k = np.arange(L, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(N, dtype=np.float64) / N)
    ang = 2.0 * np.pi * np.outer(tpair, k) / N
    Mc = np.zeros((L, L), np.float64)
    Ms = np.zeros((L, L), np.float64)
    Mc[1:] = np.cos(ang)
    Mc[0] = (-1.0) ** k
    Ms[1:] = -np.sin(ang)
    wk = np.full(L, 2.0)
    wk[0] = 1.0
    angi = 2.0 * np.pi * np.outer(k, np.arange(L, dtype=np.float64)) / N
    Ic2 = (wk[:, None] / N) * np.cos(angi)
    Is2 = -(wk[:, None] / N) * np.sin(angi)
    alt = (-1.0) ** np.arange(L, dtype=np.float64)
    rows = np.zeros((8, L), np.float64)
    rows[0, 1:] = w[1:L]
    rows[1, 1:] = w[1:L]
    rows[1, 0] = 1.0
    rows[2, 1:] = w[1:L]
    rows[3] = alt
    rows[3, 0] = (-1.0) ** L
    rows[4] = alt / N
    rows[5] = (wk / N) * alt
    rows[6] = w[:L]
    rows[7] = w[L:]
    R = np.zeros((L, L), np.float32)
    idx = (L - np.arange(L)) % L
    R[idx, np.arange(L)] = 1.0
    return (
        Mc.astype(np.float32),
        Ms.astype(np.float32),
        Ic2.astype(np.float32),
        Is2.astype(np.float32),
        rows.astype(np.float32),
        R.astype(ml_dtypes.bfloat16),
    )


@functools.lru_cache(maxsize=16)
def _fold_inv_split(n_fft: int):
    """Bitmask hi/lo bf16 split of the folded inverse matrices."""
    _, _, Ic2, Is2, _, _ = _fold_consts(n_fft)
    return _bitsplit_host(Ic2) + _bitsplit_host(Is2)


def _split32_3(x):
    """Split f32 into THREE bf16 parts whose sum is exactly x.

    Bitmask splits: hi = top 16 encoding bits (bf16-exact by construction),
    mid = top 16 bits of the residual (<= 8 significand bits -> bf16-exact),
    lo = what remains (<= 8 significand bits -> bf16-exact). Each residual
    subtraction is exact in f32 (<= 24 significand bits throughout), so
    hi + mid + lo == x bit-for-bit. This is what makes a bf16 permutation
    matmul EXACT: 3 passes, each product value*1.0.
    """
    xi = pltpu.bitcast(x, jnp.uint32)
    hi = pltpu.bitcast(xi & jnp.uint32(0xFFFF0000), jnp.float32)
    r = x - hi
    ri = pltpu.bitcast(r, jnp.uint32)
    mid = pltpu.bitcast(ri & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = r - mid
    return (
        hi.astype(jnp.bfloat16),
        mid.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


def _rev_lanes(x, rev_ref, passes: int = 3):
    """x[:, (L-t) mod L] as a bf16 permutation matmul (3 passes = EXACT).

    The 3-way bitmask split (_split32_3) makes every pass a value*1.0
    product of a bf16-exact part, and the f32 accumulation of the three
    permuted parts reconstructs x exactly (parts are disjoint mantissa
    fields of one f32). A 2-pass hi/lo split is NOT exact — the lo residual
    needs up to 16 mantissa bits but bf16 keeps 8, perturbing values by
    ~2^-17. On the FORWARD side (samples feeding the phasor u) that broke
    the 1e-4 golden gate (ADVICE.md round 1), so the forward reversal is
    always 3-pass. On the INVERSE side the operand is an amplitude-domain
    output frame where 2^-17 is harmless (same argument as the 3-pass bf16
    inverse DFT): passes=2 saves one L x L pass per tile — measured on chip
    at no accuracy cost (PROFILE_r03.json). Mosaic has no native
    lane-reversal lowering.
    """
    if passes == 2:
        xh, xl = _split32(x)
        r = jnp.dot(xh, rev_ref[:], preferred_element_type=jnp.float32)
        return r + jnp.dot(xl, rev_ref[:], preferred_element_type=jnp.float32)
    xh, xm, xl = _split32_3(x)
    r = jnp.dot(xh, rev_ref[:], preferred_element_type=jnp.float32)
    r = r + jnp.dot(xm, rev_ref[:], preferred_element_type=jnp.float32)
    return r + jnp.dot(xl, rev_ref[:], preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=16)
def _phasor_consts(n_fft: int, ra: int, rs: int):
    """(hre, him, cre, cim, pin, spin): per-bin constants, lane-padded.

    h = e^{-i Ra w_k} (heterodyne), c = e^{+i Rs w_k} (synthesis-hop
    rotation), both from exact integer angle reduction mod N. pin is 1 at
    the forced-real DC/Nyquist lanes; spin is their per-frame sign factor
    ((-1)^Rs at Nyquist -- the exact linear rotation is an integer multiple
    of pi there).
    """
    n_bins = n_fft // 2 + 1
    nbp = _pad_bins(n_bins)
    k = np.arange(n_bins, dtype=np.int64)
    ang_h = -2.0 * np.pi * ((k * ra) % n_fft) / n_fft
    ang_c = 2.0 * np.pi * ((k * rs) % n_fft) / n_fft

    def pad(v):
        out = np.zeros((1, nbp), np.float32)
        out[0, :n_bins] = v
        return out

    hre, him = pad(np.cos(ang_h)), pad(np.sin(ang_h))
    cre, cim = pad(np.cos(ang_c)), pad(np.sin(ang_c))
    pin = np.zeros((1, nbp), np.float32)
    pin[0, 0] = 1.0
    spin = np.ones((1, nbp), np.float32)
    if n_fft % 2 == 0:
        pin[0, n_bins - 1] = 1.0
        spin[0, n_bins - 1] = -1.0 if rs % 2 else 1.0
    return hre, him, cre, cim, pin, spin


@functools.lru_cache(maxsize=16)
def _phasor_consts_packed(n_fft: int, ra: int, rs: int):
    """(hre, him, cre, cim) for the PACKED lane layout (width pad(n_fft//2)).

    No pin/spin masks: in the packed layout the forced-real bins share lane
    0, which the monolithic kernel handles by direct pass-through (the
    pinned convention telescopes to Y_i = X_i * spin^i) instead of running
    them through the phasor-term machinery. Lane 0 values here are unused.
    """
    nh = n_fft // 2
    nbq = _pad_bins(nh)
    k = np.arange(nh, dtype=np.int64)
    ang_h = -2.0 * np.pi * ((k * ra) % n_fft) / n_fft
    ang_c = 2.0 * np.pi * ((k * rs) % n_fft) / n_fft

    def pad(v):
        out = np.zeros((1, nbq), np.float32)
        out[0, :nh] = v
        return out

    return pad(np.cos(ang_h)), pad(np.sin(ang_h)), pad(np.cos(ang_c)), pad(
        np.sin(ang_c)
    )


def _terms_tile(
    i, rows_a, rows_b, fc, fs, hre, him, cre, cim, pin, spin, prev_ref,
    *, overlap: int, rs: int, ra: int, scan: bool, tile: int,
):
    """Shared tile body for the phasor-terms kernels (values in, refs only
    for the cross-tile scratch). Returns (mag, tre, tim, ure, uim). `i` is
    the tile index within the current recording — program_id(0) in the 1-D
    kernel, program_id(1) in the batched (batch, tile) grid."""
    # Framing: frame j of this tile = rows[j .. j+overlap) of the two-tile
    # block, concatenated along lanes (_build_frames: roll/slice A-B knob).
    frames = _build_frames(rows_a, rows_b, tile, overlap)  # (tile, n_fft)

    re = jnp.dot(frames, fc, preferred_element_type=jnp.float32,
                 precision=_PRECISION)
    im = jnp.dot(frames, fs, preferred_element_type=jnp.float32,
                 precision=_PRECISION)
    mag = jnp.sqrt(re * re + im * im)
    safe = mag > _TINY
    inv = jax.lax.rsqrt(jnp.maximum(re * re + im * im, _TINY))
    ure = jnp.where(safe, re * inv, 1.0)
    uim = jnp.where(safe, im * inv, 0.0)

    # Previous frame's phasor, rolled down one row; row 0 comes from the
    # cross-tile scratch carry (identity before the first frame).
    pre = pltpu.roll(ure, 1, 0)
    pim = pltpu.roll(uim, 1, 0)
    row0 = (jax.lax.broadcasted_iota(jnp.int32, ure.shape, 0) == 0)
    pre = jnp.where(row0, prev_ref[0:1, :], pre)
    pim = jnp.where(row0, prev_ref[1:2, :], pim)

    # z = u * conj(u_prev) * h
    dre = ure * pre + uim * pim
    dim = uim * pre - ure * pim
    zre = dre * hre - dim * him
    zim = dre * him + dim * hre

    # General bins: term = c * z^k.
    wre, wim = _pow_k(zre, zim, rs, ra)
    gre = wre * cre - wim * cim
    gim = wre * cim + wim * cre
    # Pinned (forced-real) bins: term = u conj(u_prev) * spin.
    qre = dre * spin
    qim = dim * spin
    tre = jnp.where(pin > 0, qre, gre)
    tim = jnp.where(pin > 0, qim, gim)

    # Global frame 0: the term IS the anchor phasor u_0.
    first = row0 & (i == 0)
    tre = jnp.where(first, ure, tre)
    tim = jnp.where(first, uim, tim)

    if scan:
        # In-VMEM Hillis-Steele prefix product over the tile's frame axis
        # (log2(tile) levels, zero HBM traffic), then the cross-tile carry
        # multiply. The TPU grid is sequential, so prev_ref rows 2:4 hold
        # the running product P through the previous tile.
        rows_idx = jax.lax.broadcasted_iota(jnp.int32, tre.shape, 0)
        d = 1
        while d < tile:
            sre = pltpu.roll(tre, d, 0)
            sim = pltpu.roll(tim, d, 0)
            keep = rows_idx < d
            sre = jnp.where(keep, 1.0, sre)
            sim = jnp.where(keep, 0.0, sim)
            tre, tim = tre * sre - tim * sim, tre * sim + tim * sre
            d *= 2
        carry_re = jnp.where(i == 0, 1.0, prev_ref[2:3, :])
        carry_im = jnp.where(i == 0, 0.0, prev_ref[3:4, :])
        tre, tim = (
            tre * carry_re - tim * carry_im,
            tre * carry_im + tim * carry_re,
        )
        # One renormalization per tile bounds magnitude drift at ~tile
        # unit-modulus multiplies' worth of f32 roundoff — harmless.
        inv_p = jax.lax.rsqrt(jnp.maximum(tre * tre + tim * tim, _TINY))
        tre = tre * inv_p
        tim = tim * inv_p
        prev_ref[2, :] = tre[tile - 1, :]
        prev_ref[3, :] = tim[tile - 1, :]

    prev_ref[0, :] = ure[tile - 1, :]
    prev_ref[1, :] = uim[tile - 1, :]
    return mag, tre, tim, ure, uim


def _terms_kernel(
    rows_a, rows_b, fc, fs, hre, him, cre, cim, pin, spin,
    mag_ref, tre_ref, tim_ref, ure_ref, uim_ref, prev_ref,
    *, overlap: int, rs: int, ra: int, scan: bool,
):
    """1-D-grid wrapper over _terms_tile (single recording)."""
    i = pl.program_id(0)
    tile = mag_ref.shape[0]
    mag, tre, tim, ure, uim = _terms_tile(
        i, rows_a[:], rows_b[:], fc[:], fs[:], hre[:], him[:], cre[:],
        cim[:], pin[:], spin[:], prev_ref,
        overlap=overlap, rs=rs, ra=ra, scan=scan, tile=tile,
    )
    mag_ref[:] = mag
    tre_ref[:] = tre
    tim_ref[:] = tim
    ure_ref[:] = ure
    uim_ref[:] = uim


def _terms_kernel_batched(
    rows_a, rows_b, fc, fs, hre, him, cre, cim, pin, spin,
    mag_ref, tre_ref, tim_ref, ure_ref, uim_ref, prev_ref,
    *, overlap: int, rs: int, ra: int, scan: bool,
):
    """2-D (batch, tile)-grid wrapper over _terms_tile: the per-recording
    scratch resets fire at tile 0 of each batch row (i = program_id(1))."""
    i = pl.program_id(1)
    tile = mag_ref.shape[1]
    mag, tre, tim, ure, uim = _terms_tile(
        i, rows_a[0], rows_b[0], fc[:], fs[:], hre[:], him[:], cre[:],
        cim[:], pin[:], spin[:], prev_ref,
        overlap=overlap, rs=rs, ra=ra, scan=scan, tile=tile,
    )
    mag_ref[0] = mag
    tre_ref[0] = tre
    tim_ref[0] = tim
    ure_ref[0] = ure
    uim_ref[0] = uim


def stft_phasor_terms(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    rs: int,
    scan: bool = True,
    return_u: bool = False,
) -> tuple:
    """Fused framing + windowed DFT + phasor terms (+ in-kernel prefix scan).

    With scan=True (default) the returned (pre, pim) are the fully scanned
    synthesis phasors P = e^{i psi} — the prefix product runs inside the
    kernel in VMEM across the sequential grid. With scan=False the raw step
    terms are returned for callers that combine across devices
    (parallel/chunked.py) via phasor_scan.

    Returns (mag, pre, pim, nf) — or (mag, pre, pim, ure, uim, nf) with
    return_u=True (the unit analysis phasors, used by the sequence-parallel
    path's cross-device boundary term). All LANE-PADDED (nf_pad, nbp)
    arrays plus the true frame count. Rows >= nf and lanes >= n_bins carry
    garbage that downstream masking removes (mag there is 0 for rows,
    0-weighted for lanes in the inverse DFT matrices).
    """
    if n_fft % hop != 0:
        raise ValueError("fused stft requires hop | n_fft")
    nf = num_frames(x.shape[-1], n_fft, hop)
    if nf <= 0:
        raise ValueError("input shorter than one frame")
    overlap = n_fft // hop
    n_bins = n_fft // 2 + 1
    nbp = _pad_bins(n_bins)
    tile = _TILE_F  # fixed tile: alignment-safe, tiny nf just pads
    # Pad so the synthesis kernel's OLA spill rows (nf .. nf+m-2, m = N/rs)
    # always land inside the main output — one shared layout for K1/K2.
    nf_pad = -(-(nf + -(-n_fft // rs) - 1) // tile) * tile
    grid = nf_pad // tile

    # rows view of the padded signal; one extra tile so the i+1 block of the
    # last grid step is in range. jnp.pad + reshape (not .at[].set: the
    # dynamic-update-slice costs a full extra HBM pass at scale).
    n_rows = (grid + 1) * tile
    span = n_rows * hop
    if x.shape[-1] >= span:
        x_pad = x[:span]
    else:
        x_pad = jnp.pad(x, (0, span - x.shape[-1]))
    rows = x_pad.reshape(n_rows, hop)

    fc, fs = _dft_mats_padded(n_fft)
    consts = tuple(jnp.asarray(c) for c in _phasor_consts(n_fft, hop, rs))

    mag, tre, tim, ure, uim = pl.pallas_call(
        functools.partial(
            _terms_kernel, overlap=overlap, rs=rs, ra=hop, scan=scan
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, hop), lambda i: (i, 0)),
            pl.BlockSpec((tile, hop), lambda i: (i + 1, 0)),
            pl.BlockSpec((n_fft, nbp), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, nbp), lambda i: (0, 0)),
        ]
        + [pl.BlockSpec((1, nbp), lambda i: (0, 0))] * 6,
        out_specs=[pl.BlockSpec((tile, nbp), lambda i: (i, 0))] * 5,
        out_shape=[_out_struct((nf_pad, nbp), jnp.float32, x)] * 5,
        scratch_shapes=[pltpu.VMEM((4, nbp), jnp.float32)],
        compiler_params=_compiler_params(n_fft),
        interpret=_interpret(),
    )(rows, rows, jnp.asarray(fc), jnp.asarray(fs), *consts)
    if return_u:
        return mag, tre, tim, ure, uim, nf
    return mag, tre, tim, nf


def stft_phasor_terms_batch(
    xs: jnp.ndarray,
    n_fft: int,
    hop: int,
    rs: int,
    scan: bool = True,
    return_u: bool = False,
) -> tuple:
    """Batched stft_phasor_terms: (B, T) rows through ONE 2-D-grid kernel.

    Same contract per row as stft_phasor_terms with (B, nf_pad, nbp)
    outputs; the per-recording scratch carry resets at tile 0 of each batch
    row. Feeds the DP x SP chunked program (parallel/chunked.py), where the
    batch axis is the local shard of the mesh 'data' axis.
    """
    if xs.ndim != 2:
        raise ValueError(f"expected (B, T) batch, got shape {xs.shape}")
    if n_fft % hop != 0:
        raise ValueError("fused stft requires hop | n_fft")
    B = xs.shape[0]
    nf = num_frames(xs.shape[-1], n_fft, hop)
    if nf <= 0:
        raise ValueError("input shorter than one frame")
    overlap = n_fft // hop
    n_bins = n_fft // 2 + 1
    nbp = _pad_bins(n_bins)
    tile = _TILE_F
    nf_pad = -(-(nf + -(-n_fft // rs) - 1) // tile) * tile
    grid = nf_pad // tile

    n_rows = (grid + 1) * tile
    span = n_rows * hop
    if xs.shape[-1] >= span:
        x_pad = xs[:, :span]
    else:
        x_pad = jnp.pad(xs, ((0, 0), (0, span - xs.shape[-1])))
    rows = x_pad.reshape(B, n_rows, hop)

    fc, fs = _dft_mats_padded(n_fft)
    consts = tuple(jnp.asarray(c) for c in _phasor_consts(n_fft, hop, rs))

    mag, tre, tim, ure, uim = pl.pallas_call(
        functools.partial(
            _terms_kernel_batched, overlap=overlap, rs=rs, ra=hop, scan=scan
        ),
        grid=(B, grid),
        in_specs=[
            pl.BlockSpec((1, tile, hop), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile, hop), lambda b, i: (b, i + 1, 0)),
            pl.BlockSpec((n_fft, nbp), lambda b, i: (0, 0)),
            pl.BlockSpec((n_fft, nbp), lambda b, i: (0, 0)),
        ]
        + [pl.BlockSpec((1, nbp), lambda b, i: (0, 0))] * 6,
        out_specs=[pl.BlockSpec((1, tile, nbp), lambda b, i: (b, i, 0))] * 5,
        out_shape=[_out_struct((B, nf_pad, nbp), jnp.float32, xs)] * 5,
        scratch_shapes=[pltpu.VMEM((4, nbp), jnp.float32)],
        compiler_params=_compiler_params(n_fft),
        interpret=_interpret(),
    )(rows, rows, jnp.asarray(fc), jnp.asarray(fs), *consts)
    if return_u:
        return mag, tre, tim, ure, uim, nf
    return mag, tre, tim, nf


def _cmul_norm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Renormalized complex product on (..., 2, nbp) stacks — associative in
    exact arithmetic (projective U(1) product), so scan-safe; renorm stops
    magnitude drift from compounding over long recordings."""
    are, aim = a[..., 0, :], a[..., 1, :]
    bre, bim = b[..., 0, :], b[..., 1, :]
    re = are * bre - aim * bim
    im = are * bim + aim * bre
    inv = jax.lax.rsqrt(jnp.maximum(re * re + im * im, _TINY))
    return jnp.stack([re * inv, im * inv], axis=-2)


def phasor_scan(tre: jnp.ndarray, tim: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """P = renormalized prefix product of the step phasors (blocked scan)."""
    t = jnp.stack([tre, tim], axis=-2)  # (nf, 2, nbp)
    p = blocked_scan(_cmul_norm, t)
    return p[..., 0, :], p[..., 1, :]


def phasor_prefix_exclusive(
    tre: jnp.ndarray, tim: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exclusive renormalized prefix product along axis 0 (identity first).

    Used for the cross-device phase carry: row d = product of rows < d of
    the per-device phasor totals.
    """
    t = jnp.stack([tre, tim], axis=-2)
    inc = blocked_scan(_cmul_norm, t)
    ident = jnp.stack(
        [jnp.ones_like(tre[:1]), jnp.zeros_like(tim[:1])], axis=-2
    )
    return (
        jnp.concatenate([ident, inc[:-1]])[..., 0, :],
        jnp.concatenate([ident, inc[:-1]])[..., 1, :],
    )


def boundary_step_term(
    u0re: jnp.ndarray,
    u0im: jnp.ndarray,
    upre: jnp.ndarray,
    upim: jnp.ndarray,
    n_fft: int,
    ra: int,
    rs: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Step phasor crossing a chunk boundary (jnp twin of the kernel math).

    u0 is a chunk's first analysis phasor, uprev the previous chunk's last;
    returns the term e^{i (Rs w + k princarg(delta))} with the DC/Nyquist
    pinning convention. Shapes: lane-padded (..., nbp).
    """
    hre, him, cre, cim, pin, spin = (
        jnp.asarray(c)[0] for c in _phasor_consts(n_fft, ra, rs)
    )
    dre = u0re * upre + u0im * upim
    dim = u0im * upre - u0re * upim
    if rs % ra == 0:
        gre, gim = _pow_k(dre, dim, rs, ra)
    else:
        zre = dre * hre - dim * him
        zim = dre * him + dim * hre
        wre, wim = _pow_k(zre, zim, rs, ra)
        gre = wre * cre - wim * cim
        gim = wre * cim + wim * cre
    tre = jnp.where(pin > 0, dre * spin, gre)
    tim = jnp.where(pin > 0, dim * spin, gim)
    return tre, tim


def _synth_tile(i, mag, pre, pim, mask, ic, is_, tail_ref, *, m: int, tile: int):
    """Y = mag*P -> inverse windowed DFT -> fold OLA with VMEM tail carry.

    Shared tile body (values in; tail_ref is the cross-tile OLA scratch).
    Returns the merged un-normalized buffer (tile + m - 1, rs)."""
    mag = mag * mask
    y_re = mag * pre
    y_im = mag * pim
    frames = jnp.dot(y_re, ic, preferred_element_type=jnp.float32,
                     precision=_PRECISION)
    frames = frames + jnp.dot(y_im, is_, preferred_element_type=jnp.float32,
                              precision=_PRECISION)
    rs = frames.shape[1] // m
    zrow = jnp.zeros((1, rs), jnp.float32)
    buf = jnp.concatenate([frames[:, :rs]] + [zrow] * (m - 1), axis=0)
    for s in range(1, m):
        shifted = jnp.concatenate(
            [zrow] * s + [frames[:, s * rs : (s + 1) * rs]] + [zrow] * (m - 1 - s),
            axis=0,
        )
        buf = buf + shifted
    head = buf[: m - 1] + tail_ref[:]
    buf = jnp.concatenate([head, buf[m - 1 :]], axis=0)
    tail_ref[:] = buf[tile:]
    return buf


def _synth_kernel(
    mag_ref, pre_ref, pim_ref, mask_ref, ic_ref, is_ref, norm_ref,
    out_ref, tail_ref, *, m: int
):
    """1-D-grid wrapper over _synth_tile.

    norm_ref: (R>=8, rs) inverse-normalization table — rows 0..m-2 are the
    head-edge 1/(partial window-energy) rows, row m-1 the interior 1/COLA
    row (interior normalization is frame-index-independent, so the whole
    divide pass folds into this kernel; the m-1 tail rows are normalized by
    the caller).
    """
    i = pl.program_id(0)
    tile = mag_ref.shape[0]

    @pl.when(i == 0)
    def _():
        tail_ref[:] = jnp.zeros_like(tail_ref)

    buf = _synth_tile(
        i, mag_ref[:], pre_ref[:], pim_ref[:], mask_ref[:], ic_ref[:],
        is_ref[:], tail_ref, m=m, tile=tile,
    )
    out_ref[:] = buf[:tile] * norm_ref[m - 1 : m, :]

    @pl.when(i == 0)
    def _():
        for j in range(m - 1):
            out_ref[j, :] = buf[j, :] * norm_ref[j, :]


def _synth_kernel_batched(
    mag_ref, pre_ref, pim_ref, mask_ref, ic_ref, is_ref, norm_ref,
    out_ref, tail_ref, *, m: int
):
    """2-D (batch, tile)-grid wrapper over _synth_tile (per-row OLA carry)."""
    i = pl.program_id(1)
    tile = mag_ref.shape[1]

    @pl.when(i == 0)
    def _():
        tail_ref[:] = jnp.zeros_like(tail_ref)

    buf = _synth_tile(
        i, mag_ref[0], pre_ref[0], pim_ref[0], mask_ref[0], ic_ref[:],
        is_ref[:], tail_ref, m=m, tile=tile,
    )
    out_ref[0] = buf[:tile] * norm_ref[m - 1 : m, :]

    @pl.when(i == 0)
    def _():
        for j in range(m - 1):
            out_ref[0, j, :] = buf[j, :] * norm_ref[j, :]


@functools.lru_cache(maxsize=16)
def _ola_norm_tables(n_fft: int, rs: int, eps: float = 1e-8):
    """(head_table (R, rs) f32, tail_inv (m-1, rs) f32); R = 8-aligned >= m.

    head_table rows 0..m-2: inverse partial window-energy for the first m-1
    output rows; rows m-1..R-1: inverse interior COLA energy (the same for
    every interior row — this is what makes in-kernel normalization a
    constant-table multiply). tail_inv normalizes the m-1 tail rows.

    General hops (rs not dividing n_fft): m = ceil(n_fft/rs) and the
    window-energy row is zero-padded to m*rs before segmenting — output
    position t receives window energy sum_s w2[t + s*rs] over in-range s,
    which depends only on t mod rs, so the constant-table structure (and
    the interior-fold trick in _pvoc_mats) survives unchanged.
    """
    m = -(-n_fft // rs)
    rows = max(8, -(-m // 8) * 8)  # sublane-aligned, covers overlap m > 8
    t = np.arange(n_fft, dtype=np.float64)
    w2 = (0.5 - 0.5 * np.cos(2.0 * np.pi * t / n_fft)) ** 2
    w2p = np.zeros(m * rs, np.float64)
    w2p[:n_fft] = w2
    seg = w2p.reshape(m, rs)
    full = np.maximum(seg.sum(axis=0), eps)
    head = np.full((rows, rs), 1.0 / full, np.float64)
    for r in range(m - 1):
        head[r] = 1.0 / np.maximum(seg[: r + 1].sum(axis=0), eps)
    tail_inv = np.empty((m - 1, rs), np.float64)
    for q in range(1, m):
        tail_inv[q - 1] = 1.0 / np.maximum(seg[q:].sum(axis=0), eps)
    return head.astype(np.float32), tail_inv.astype(np.float32)


def phasor_istft_ola(
    mag: jnp.ndarray,
    pre: jnp.ndarray,
    pim: jnp.ndarray,
    n_fft: int,
    rs: int,
    nf: int,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """NORMALIZED OLA waveform from lane-padded (nf_pad, nbp) spectra.

    Inputs come straight from stft_phasor_terms (padded layout); rows >= nf
    are masked off in-kernel. Normalization runs inside the kernel via the
    static COLA tables when frame_mask is None; with a custom frame_mask the
    caller must normalize (un-normalized signal is returned).
    Length (nf-1)*rs + n_fft.
    """
    if n_fft % rs != 0 or n_fft // rs < 2:
        raise ValueError("fused istft requires rs | n_fft and n_fft//rs >= 2")
    nf_pad, nbp = mag.shape
    m = n_fft // rs
    tile = _TILE_F
    if nf_pad % tile != 0:
        raise ValueError(f"expected lane-padded input with nf_pad % {tile} == 0")
    grid = nf_pad // tile

    normalize = frame_mask is None
    if frame_mask is None:
        mask = (jnp.arange(nf_pad) < nf).astype(mag.dtype)
    else:
        mask = jnp.zeros((nf_pad,), mag.dtype).at[: frame_mask.shape[0]].set(
            frame_mask.astype(mag.dtype)
        )
        mask = mask * (jnp.arange(nf_pad) < nf)
    ic, is_ = _idft_mats_padded(n_fft)
    if normalize:
        head_tbl, tail_inv = _ola_norm_tables(n_fft, rs)
    else:
        head_tbl = np.ones((max(8, -(-m // 8) * 8), rs), np.float32)
        tail_inv = np.ones((m - 1, rs), np.float32)

    main = pl.pallas_call(
        functools.partial(_synth_kernel, m=m),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec(head_tbl.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, rs), lambda i: (i, 0)),
        out_shape=_out_struct((nf_pad, rs), jnp.float32, mag, pre),
        scratch_shapes=[pltpu.VMEM((m - 1, rs), jnp.float32)],
        compiler_params=_compiler_params(n_fft),
        interpret=_interpret(),
    )(mag, pre, pim, mask[:, None], jnp.asarray(ic), jnp.asarray(is_),
      jnp.asarray(head_tbl))

    # The m-1 OLA spill rows (nf .. nf+m-2) got the interior normalization
    # in-kernel; rescale them to the true tail normalization.
    out_len = (nf - 1) * rs + n_fft
    if normalize:
        m_full, _ = _ola_norm_tables(n_fft, rs)
        fix = jnp.asarray(tail_inv / m_full[m - 1 : m])  # B^-1 / F^-1
        tail = main[nf : nf + m - 1] * fix
    else:
        tail = main[nf : nf + m - 1]
    full = jnp.concatenate([main[:nf].reshape(-1), tail.reshape(-1)])
    return full[:out_len]


def phasor_istft_ola_batch(
    mag: jnp.ndarray,
    pre: jnp.ndarray,
    pim: jnp.ndarray,
    n_fft: int,
    rs: int,
    nf: int,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched phasor_istft_ola: (B, nf_pad, nbp) spectra, 2-D-grid kernel.

    Same per-row contract as phasor_istft_ola (nf is the shared per-row
    frame count; frame_mask is (B, F) when given, in which case the caller
    normalizes). Returns (B, (nf-1)*rs + n_fft).
    """
    if n_fft % rs != 0 or n_fft // rs < 2:
        raise ValueError("fused istft requires rs | n_fft and n_fft//rs >= 2")
    B, nf_pad, nbp = mag.shape
    m = n_fft // rs
    tile = _TILE_F
    if nf_pad % tile != 0:
        raise ValueError(f"expected lane-padded input with nf_pad % {tile} == 0")
    grid = nf_pad // tile

    normalize = frame_mask is None
    row_valid = (jnp.arange(nf_pad) < nf).astype(mag.dtype)
    if frame_mask is None:
        mask = jnp.broadcast_to(row_valid[None], (B, nf_pad))
    else:
        mask = jnp.zeros((B, nf_pad), mag.dtype)
        mask = mask.at[:, : frame_mask.shape[1]].set(
            frame_mask.astype(mag.dtype)
        )
        mask = mask * row_valid[None]
    ic, is_ = _idft_mats_padded(n_fft)
    if normalize:
        head_tbl, tail_inv = _ola_norm_tables(n_fft, rs)
    else:
        head_tbl = np.ones((max(8, -(-m // 8) * 8), rs), np.float32)
        tail_inv = np.ones((m - 1, rs), np.float32)

    main = pl.pallas_call(
        functools.partial(_synth_kernel_batched, m=m),
        grid=(B, grid),
        in_specs=[
            pl.BlockSpec((1, tile, nbp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile, nbp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile, nbp), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((nbp, n_fft), lambda b, i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda b, i: (0, 0)),
            pl.BlockSpec(head_tbl.shape, lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, rs), lambda b, i: (b, i, 0)),
        out_shape=_out_struct((B, nf_pad, rs), jnp.float32, mag, pre),
        scratch_shapes=[pltpu.VMEM((m - 1, rs), jnp.float32)],
        compiler_params=_compiler_params(n_fft),
        interpret=_interpret(),
    )(mag, pre, pim, mask[..., None], jnp.asarray(ic), jnp.asarray(is_),
      jnp.asarray(head_tbl))

    out_len = (nf - 1) * rs + n_fft
    if normalize:
        m_full, _ = _ola_norm_tables(n_fft, rs)
        fix = jnp.asarray(tail_inv / m_full[m - 1 : m])
        tail = main[:, nf : nf + m - 1] * fix
    else:
        tail = main[:, nf : nf + m - 1]
    full = jnp.concatenate(
        [main[:, :nf].reshape(B, -1), tail.reshape(B, -1)], axis=-1
    )
    return full[:, :out_len]


def _pvoc_tile(
    i, rows_a, rows_b, mats, consts, carry_ref, tail_ref, fmask,
    *, overlap: int, rs: int, ra: int, m: int, tile: int,
    fwd_passes: int, inv_passes: int, fold: bool, ablate: str = "",
    inv_rev_passes: int = 3, started=None, goff=None, zrows=None,
):
    """The whole phase vocoder in ONE kernel pass per frame tile.

    framing -> windowed DFT (MXU) -> phasor terms -> in-VMEM prefix scan ->
    Y = mag * P -> inverse windowed DFT (MXU) -> fold OLA + normalization.
    HBM sees the raw samples once in and the stretched waveform once out;
    every intermediate lives in VMEM. Cross-tile state: previous frame's
    unit phasor + running synthesis phasor (carry_ref), OLA spill
    (tail_ref). The reference runs this as 7 separate CUDA kernel launches
    with HBM round trips between each (SURVEY.md SS3.2).

    Bin axis is PACKED (_packed_mats): lanes [1, n_fft//2) are the general
    complex bins; lane 0 carries DC in the re channel and Nyquist in the im
    channel. Both are forced-real pinned bins whose convention telescopes
    to Y_i = X_i * spin^i (spin = +1 at DC, (-1)^Rs at Nyquist), so they
    bypass the phasor machinery as a direct pass-through at the Y stage.

    fwd_passes / inv_passes: 0 = f32 matmuls at Precision.HIGHEST (6 MXU
    passes each on this Mosaic); 3/4 = hi/lo-bf16 split emulation via
    _dot_bf16. The forward DFT feeds the phasor u where weak-bin phase
    noise matters, so it runs at HIGHEST: the 2-way operand split behind
    the 3- and 4-pass variants carries a ~2^-17 representation error that
    no extra cross term recovers (measured round 3: 3-pass 1.3e-4, 4-pass
    7.9e-5 at k=2 and 1.29e-4 at k=4 — the gate leaves no room). The
    inverse is amplitude-only, where 2^-17 is harmless: 3-pass passes
    every gate.

    This is the SHARED tile body: the single-recording kernel (_pvoc_kernel,
    1-D grid) and the batched kernel (_pvoc_kernel_batched, 2-D
    (batch, tile) grid) both delegate here. `i` is the tile index WITHIN the
    current recording (program_id(0) single / program_id(1) batched — the
    i == 0 carry/anchor resets are what make per-batch-row state exact).
    rows_a/rows_b/mats/consts are VALUES (already read from refs); fmask is
    a (tile, 1) valid-frame column. Returns the merged un-normalized OLA
    buffer (tile + m - 1, rs) and updates carry_ref/tail_ref in place.
    """
    fch, fcl, fsh, fsl, ich, icl, ish, isl, rev, frows = mats
    hre, him, cre, cim = consts

    # ablate: "+"-joined stage names to cheapen/skip for per-stage timing
    # attribution (scripts/tpu_profile.py) — the output is WRONG with any
    # set; never set on a product path. "fwd1"/"inv1": the DFT matmuls as
    # single bf16 passes; "rev": skip the fold lane reversals; "scan":
    # skip the prefix scan; "terms": skip the phasor-term algebra;
    # "frame": skip the framing rolls; "mag": skip the sqrt/rsqrt
    # magnitude/normalize stage; "ola": skip the fold overlap-add.
    skip = set(ablate.split("+")) if ablate else set()
    if "rev" in skip:
        rev_fwd = rev_inv = lambda v, _r: v
    else:
        rev_fwd = _rev_lanes  # exact 3-pass: feeds the phasor-critical DFT
        rev_inv = functools.partial(_rev_lanes, passes=inv_rev_passes)

    # --- framing + forward DFT
    if "frame" in skip:
        frames = jnp.concatenate([rows_a] * overlap, axis=-1)
    else:
        frames = _build_frames(rows_a, rows_b, tile, overlap)
    if fold:
        # Even/odd fold (see _fold_consts): half-length matmuls at HIGHEST
        # (default; fwd_passes>0 is a profiler A/B knob — the bf16 splits
        # measured over the gate, see _FOLD_FWD_PASSES note), plus the
        # reversed view and a VPU lane reduction for the packed Nyquist.
        n_fft = overlap * ra
        L = n_fft // 2
        head = frames[:, :L]
        if zrows is not None and "rev" not in skip:
            # r04: the reversed view r[t] = frame[N-t] built from a
            # PRE-REVERSED rows view of the signal (zrows: zr_rows[v, t] =
            # x_pad[(v+1)*hop - t], one fused XLA reverse pass) instead of
            # the 3-pass exact permutation matmul — pure data movement,
            # exact, and off the MXU. Frame j's reversed window is rows
            # j+overlap-1-c of zr (lane block c), so the same two-tile
            # roll machinery applies; only lane 0 (r[0] = frame[L] =
            # frames[:, L]) needs a patch.
            blockz = jnp.concatenate([zrows[0], zrows[1]], axis=0)
            nb2z = 2 * tile
            partsz = []
            for c in range(overlap // 2):
                sft = overlap - 1 - c
                partsz.append(
                    (pltpu.roll(blockz, nb2z - sft, 0) if sft else blockz)[
                        :tile
                    ]
                )
            w_t = jnp.concatenate(partsz, axis=-1)  # (tile, L)
            lane0v = jax.lax.broadcasted_iota(jnp.int32, w_t.shape, 1) == 0
            r = jnp.where(lane0v, frames[:, L : L + 1], w_t)
        elif "rev" in skip and zrows is not None:
            r = frames[:, L:]
        else:
            r = rev_fwd(frames[:, L:], rev)
        wE = frows[0:1, :]
        wh = wE * head
        E = wh + frows[1:2, :] * r
        O = wh - frows[2:3, :] * r
        if "fwd1" in skip:
            re = jnp.dot(E, fch, preferred_element_type=jnp.float32)
            im = jnp.dot(O, fsh, preferred_element_type=jnp.float32)
        elif fwd_passes:
            re = _dot_bf16(E, fch, fcl, fwd_passes)
            im = _dot_bf16(O, fsh, fsl, fwd_passes)
        else:
            re = jnp.dot(E, fch, preferred_element_type=jnp.float32,
                         precision=_PRECISION)
            im = jnp.dot(O, fsh, preferred_element_type=jnp.float32,
                         precision=_PRECISION)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1) == 0
        nyq = jnp.sum(E * frows[3:4, :], axis=1, keepdims=True)
        im = jnp.where(lane0, nyq, im)
    elif fwd_passes:
        re = _dot_bf16(frames, fch, fcl, fwd_passes)
        im = _dot_bf16(frames, fsh, fsl, fwd_passes)
    else:
        re = jnp.dot(frames, fch, preferred_element_type=jnp.float32,
                     precision=_PRECISION)
        im = jnp.dot(frames, fsh, preferred_element_type=jnp.float32,
                     precision=_PRECISION)

    # --- phasor terms (general bins; packed lane 0 is overridden at Y)
    if "mag" in skip:
        mag, ure, uim = re, re, im
    else:
        n2 = re * re + im * im
        inv = jax.lax.rsqrt(jnp.maximum(n2, _TINY))
        # mag as n2 * rsqrt(n2) (one transcendental instead of sqrt+rsqrt;
        # ~1-2 ulp off exact sqrt — amplitude-domain, far under the gate).
        mag = n2 * inv
        safe = n2 > _TINY
        ure = jnp.where(safe, re * inv, 1.0)
        uim = jnp.where(safe, im * inv, 0.0)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, ure.shape, 0)
    row0 = row_idx == 0
    # Streaming mode (started/goff given): carry_ref is PRELOADED from the
    # previous segment's state at i == 0 by the wrapper, so the "tile 0"
    # resets only fire on the very first segment (started == 0) and the
    # cross-tile carry reads are unconditional.
    stream = started is not None
    anchor_now = (i == 0) & (started == 0) if stream else (i == 0)
    closed = rs % ra == 0 and not skip & {"terms", "scan", "noclosed"}
    if closed:
        # CLOSED FORM (integer k, round 3): the prefix product TELESCOPES.
        # e^{i k princarg(d)} == (e^{id})^k for integer k, and
        # prod_j u_j conj(u_{j-1}) == u_i conj(u_0) exactly, so
        #   P_i = u_0 * (u_i conj(u_0))^k  = e^{i psi_i}
        # with the heterodyne/synthesis rotations cancelling (Rs w = k Ra w).
        # Validated vs the f64 golden at 1e-10 for k=1..4. No per-frame
        # recurrence, no in-VMEM Hillis-Steele scan, no cross-tile product
        # carry — just the anchor phasor u_0 persisted in scratch. (k = 1/2
        # does NOT telescope — principal square roots don't commute with
        # the product across branch cuts — and keeps the scan below.)
        @pl.when(anchor_now)
        def _():
            carry_ref[0, :] = ure[0, :]
            carry_ref[1, :] = uim[0, :]

        u0re = carry_ref[0:1, :]
        u0im = carry_ref[1:2, :]
        zre = ure * u0re + uim * u0im  # u * conj(u0)
        zim = uim * u0re - ure * u0im
        wre, wim = _pow_k(zre, zim, rs, ra)
        tre = wre * u0re - wim * u0im  # * u0
        tim = wre * u0im + wim * u0re
    elif "terms" in skip:
        tre, tim = ure, uim
    else:
        pre_ = pltpu.roll(ure, 1, 0)
        pim_ = pltpu.roll(uim, 1, 0)
        pre_ = jnp.where(row0, carry_ref[0:1, :], pre_)
        pim_ = jnp.where(row0, carry_ref[1:2, :], pim_)
        dre = ure * pre_ + uim * pim_
        dim = uim * pre_ - ure * pim_
        if rs % ra == 0:
            # Integer k: e^{i Rs w} * (z h)^k == z^k exactly (Rs w == k Ra w
            # cancels the heterodyne) — no constants needed at all.
            tre, tim = _pow_k(dre, dim, rs, ra)
        else:
            zre = dre * hre - dim * him
            zim = dre * him + dim * hre
            wre, wim = _pow_k(zre, zim, rs, ra)
            tre = wre * cre - wim * cim
            tim = wre * cim + wim * cre
        first = row0 & anchor_now
        tre = jnp.where(first, ure, tre)
        tim = jnp.where(first, uim, tim)

    # --- in-VMEM prefix scan + cross-tile carry (scan path only)
    if not closed and "scan" not in skip:
        d = 1
        while d < tile:
            sre = pltpu.roll(tre, d, 0)
            sim = pltpu.roll(tim, d, 0)
            keep = row_idx < d
            sre = jnp.where(keep, 1.0, sre)
            sim = jnp.where(keep, 0.0, sim)
            tre, tim = tre * sre - tim * sim, tre * sim + tim * sre
            d *= 2
        if stream:
            # carry_ref rows 2:3 were preloaded from the previous segment
            # (identity on the very first one) at i == 0.
            c_re = carry_ref[2:3, :]
            c_im = carry_ref[3:4, :]
        else:
            c_re = jnp.where(i == 0, 1.0, carry_ref[2:3, :])
            c_im = jnp.where(i == 0, 0.0, carry_ref[3:4, :])
        tre, tim = tre * c_re - tim * c_im, tre * c_im + tim * c_re
        inv_p = jax.lax.rsqrt(jnp.maximum(tre * tre + tim * tim, _TINY))
        tre = tre * inv_p
        tim = tim * inv_p
    if not closed:
        carry_ref[2, :] = tre[tile - 1, :]
        carry_ref[3, :] = tim[tile - 1, :]
        carry_ref[0, :] = ure[tile - 1, :]
        carry_ref[1, :] = uim[tile - 1, :]

    # --- synthesis: Y = mag * P (masked past the last real frame)
    gidx = i * tile + row_idx
    if goff is not None:
        gidx = gidx + goff  # global frame index across streaming segments
    y_re = mag * fmask * tre
    y_im = mag * fmask * tim
    # Packed forced-real lane: Y_i = X_i * spin^i — pass-through, times an
    # alternating Nyquist sign when Rs is odd ((-1)^{Rs i}).
    lane0 = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1) == 0
    y_re = jnp.where(lane0, re * fmask, y_re)
    if rs % 2:
        nyq_sign = (1 - 2 * (gidx & 1)).astype(jnp.float32)
    else:
        nyq_sign = 1.0
    y_im = jnp.where(lane0, im * (nyq_sign * fmask), y_im)
    if "inv1" in skip:
        ep = jnp.dot(y_re.astype(jnp.bfloat16), ich,
                     preferred_element_type=jnp.float32)
        qp = jnp.dot(y_im.astype(jnp.bfloat16), ish,
                     preferred_element_type=jnp.float32)
    elif inv_passes:
        ep = _dot_bf16(y_re, ich, icl, inv_passes)
        qp = _dot_bf16(y_im, ish, isl, inv_passes)
    else:
        ep = jnp.dot(y_re, ich, preferred_element_type=jnp.float32,
                     precision=_PRECISION)
        qp = jnp.dot(y_im, ish, preferred_element_type=jnp.float32,
                     precision=_PRECISION)
    if fold:
        # Unfold: lower half y[t] = E'+Q', upper half y[N-t] = E'-Q'
        # (reversed view), y[N/2] and the Nyquist spectral line via VPU
        # lane reductions; window applied per half. Is2 row 0 is zero, so
        # the packed-Nyquist im lane never pollutes Q'.
        nyqv = y_im[:, 0:1]
        e2 = ep + nyqv * frows[4:5, :]
        y_mid = jnp.sum(y_re * frows[5:6, :], axis=1, keepdims=True) + (
            nyqv * (1.0 / n_fft)
        )
        lo = (e2 + qp) * frows[6:7, :]
        d = rev_inv(e2 - qp, rev)
        d = jnp.where(lane0, y_mid, d)
        frames_o = jnp.concatenate([lo, d * frows[7:8, :]], axis=1)
    else:
        frames_o = ep + qp

    # --- fold OLA with tail carry: roll+mask accumulation (r04 — replaces
    # the concat-built (tile+m-1)-row buffers, the largest non-matmul cost
    # in PROFILE_r04 ablations). Segment s of frame j lands in output row
    # j+s: a sublane roll by s aligns it; rows < s of the rolled block are
    # the WRAPPED rows (frames tile-s+j) — exactly the spill into the next
    # tile, accumulated into tail_ref. General hops (rs not dividing
    # n_fft, round 5): m = ceil(n_fft/rs) and the frame columns are
    # zero-padded to m*rs — the padded lanes contribute nothing, so the
    # same roll structure is exact for ANY rs (frame j always starts at
    # output row j). Returns main (tile, rs); when the interior COLA
    # normalization is folded into the unfold rows (_pvoc_mats
    # normed=True) this is the normalized signal directly.
    if "ola" in skip:
        return frames_o[:, :rs]
    n_cols = frames_o.shape[1]
    if m * rs > n_cols:
        frames_o = jnp.concatenate(
            [frames_o, jnp.zeros((tile, m * rs - n_cols), jnp.float32)],
            axis=1,
        )
    row_r = jax.lax.broadcasted_iota(jnp.int32, (tile, rs), 0)
    main = frames_o[:, :rs]
    wrap = None
    for s in range(1, m):
        p = pltpu.roll(frames_o[:, s * rs : (s + 1) * rs], s, 0)
        main = main + jnp.where(row_r >= s, p, 0.0)
        w_s = jnp.where(row_r < s, p, 0.0)
        wrap = w_s if wrap is None else wrap + w_s
    tail_pad = jnp.concatenate(
        [tail_ref[:], jnp.zeros((tile - (m - 1), rs), jnp.float32)], axis=0
    )
    main = main + tail_pad
    tail_ref[:] = wrap[: m - 1]
    return main


def _pvoc_kernel(
    rows_a, rows_b, fch, fcl, fsh, fsl, ich, icl, ish, isl, rev, frows,
    hre, him, cre, cim, norm,
    out_ref, carry_ref, tail_ref,
    *, overlap: int, rs: int, ra: int, m: int, nf: int, tile: int,
    fwd_passes: int, inv_passes: int, fold: bool, ablate: str = "",
    inv_rev_passes: int = 3, normed: bool = False,
):
    """Single-recording wrapper: 1-D grid over frame tiles (see _pvoc_tile).

    normed: interior normalization folded into the matrices (_pvoc_mats);
    `norm` is then the tiny head-row correction table (rows >= m-1 are 1).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        tail_ref[:] = jnp.zeros_like(tail_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    fmask = (i * tile + col < nf).astype(jnp.float32)
    mats = (
        fch[:], fcl[:], fsh[:], fsl[:],
        ich[:], icl[:], ish[:], isl[:], rev[:], frows[:],
    )
    consts = (hre[:], him[:], cre[:], cim[:])
    buf = _pvoc_tile(
        i, rows_a[:], rows_b[:], mats, consts, carry_ref, tail_ref, fmask,
        overlap=overlap, rs=rs, ra=ra, m=m, tile=tile,
        fwd_passes=fwd_passes, inv_passes=inv_passes, fold=fold,
        ablate=ablate, inv_rev_passes=inv_rev_passes,
    )
    if "norm" in (set(ablate.split("+")) if ablate else set()):
        out_ref[:] = buf
        return
    out_ref[:] = buf if normed else buf * norm[m - 1 : m, :]

    @pl.when(i == 0)
    def _():
        for j in range(m - 1):
            out_ref[j, :] = buf[j, :] * norm[j, :]


def _pvoc_kernel_z(
    rows_a, rows_b, rows_za, rows_zb, fch, fcl, fsh, fsl, ich, icl, ish, isl,
    rev, frows, hre, him, cre, cim, norm,
    out_ref, carry_ref, tail_ref,
    *, overlap: int, rs: int, ra: int, m: int, nf: int, tile: int,
    fwd_passes: int, inv_passes: int, fold: bool, ablate: str = "",
    inv_rev_passes: int = 3, normed: bool = False,
):
    """_pvoc_kernel with the pre-reversed rows view (zrows) replacing the
    forward-side 3-pass reversal matmul (see _pvoc_tile)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        tail_ref[:] = jnp.zeros_like(tail_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    fmask = (i * tile + col < nf).astype(jnp.float32)
    mats = (
        fch[:], fcl[:], fsh[:], fsl[:],
        ich[:], icl[:], ish[:], isl[:], rev[:], frows[:],
    )
    consts = (hre[:], him[:], cre[:], cim[:])
    buf = _pvoc_tile(
        i, rows_a[:], rows_b[:], mats, consts, carry_ref, tail_ref, fmask,
        overlap=overlap, rs=rs, ra=ra, m=m, tile=tile,
        fwd_passes=fwd_passes, inv_passes=inv_passes, fold=fold,
        ablate=ablate, inv_rev_passes=inv_rev_passes,
        zrows=(rows_za[:], rows_zb[:]),
    )
    if "norm" in (set(ablate.split("+")) if ablate else set()):
        out_ref[:] = buf
        return
    out_ref[:] = buf if normed else buf * norm[m - 1 : m, :]

    @pl.when(i == 0)
    def _():
        for j in range(m - 1):
            out_ref[j, :] = buf[j, :] * norm[j, :]


def _pvoc_kernel_batched(
    rows_a, rows_b, fch, fcl, fsh, fsl, ich, icl, ish, isl, rev, frows,
    hre, him, cre, cim, norm, fm,
    out_ref, carry_ref, tail_ref,
    *, overlap: int, rs: int, ra: int, m: int, tile: int,
    fwd_passes: int, inv_passes: int, fold: bool, inv_rev_passes: int = 3,
    normed: bool = False,
):
    """Batched wrapper: 2-D (batch, frame-tile) grid, one kernel program.

    The TPU grid iterates row-major (all tiles of batch row b, then b+1),
    so the VMEM carry/tail scratch is per-recording state exactly as in the
    1-D kernel: every `i == 0` reset in _pvoc_tile fires at tile 0 OF EACH
    BATCH ROW because i is program_id(1). This is the fix for the round-1
    gap where the DP/batched programs fell back to the polar path
    (VERDICT.md missing #4): vmapping a pallas_call would misattribute the
    scratch carry, but an explicit batch grid axis owns it correctly.

    fm: (1, tile, 1) block of the per-row valid-frame mask — ragged batches
    (per-utterance frame counts) mask exactly like the 1-D nf cutoff.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        tail_ref[:] = jnp.zeros_like(tail_ref)

    mats = (
        fch[:], fcl[:], fsh[:], fsl[:],
        ich[:], icl[:], ish[:], isl[:], rev[:], frows[:],
    )
    consts = (hre[:], him[:], cre[:], cim[:])
    buf = _pvoc_tile(
        i, rows_a[0], rows_b[0], mats, consts, carry_ref, tail_ref, fm[0],
        overlap=overlap, rs=rs, ra=ra, m=m, tile=tile,
        fwd_passes=fwd_passes, inv_passes=inv_passes, fold=fold,
        inv_rev_passes=inv_rev_passes,
    )
    out_ref[0] = buf if normed else buf * norm[m - 1 : m, :]

    @pl.when(i == 0)
    def _():
        for j in range(m - 1):
            out_ref[0, j, :] = buf[j, :] * norm[j, :]


# bf16-split pass counts for fused_time_stretch(fast=True). The forward
# DFT feeds the phasor u and must stay at HIGHEST (0): a 2-way bf16 split
# leaves a ~2^-17 OPERAND representation error (al is bf16-rounded), and
# the 4th (al*bl) pass cannot recover it — rejection evidence ON CHIP
# (PROFILE_r03.json accuracy_60s_vs_golden): 4-pass = 2.8e-4 at 2.0x and
# 0.34 at 0.5x (k=1/2 branch flips), far over the 1e-4 gate; interpret
# mode reads lower (7.9e-5 at k=2, 1.29e-4 at k=4) but the chip numbers
# are binding. HIGHEST measures ~2e-5 on chip. bf16-split DFT precision
# is effectively quantized: 3-4 passes ~2^-16, 6 passes (HIGHEST) ~2^-24 —
# nothing cheaper in between, so the forward keeps all 6. The inverse is
# amplitude-only, where 2^-17 is harmless: 3-pass passes every gate with
# the error flat in recording length, and its fold lane reversal runs at
# 2 passes for the same reason (PROFILE_r03.json A/B).
_FOLD_FWD_PASSES = 0
_INV_PASSES = 3
_INV_REV_PASSES = 2


def _pvoc_mats(n_fft: int, fast: bool, fwd_passes: int | None = None,
               norm_rs: int | None = None):
    """(mats 10-tuple, fwd_passes, inv_passes, fold, normed).

    mats layout (shared by _pvoc_kernel and _pvoc_kernel_batched):
    (fch, fcl, fsh, fsl, ich, icl, ish, isl, rev, frows) — forward/inverse
    DFT hi/lo pairs (lo slots hold unread dummies when a stage runs at
    HIGHEST), the reversal permutation, and the fold row table.

    fwd_passes: override for the forward-DFT bf16 pass count (None = the
    path default: _FOLD_FWD_PASSES on the fold path, HIGHEST elsewhere;
    0 = force HIGHEST — the accuracy escape hatch and A/B knob).

    norm_rs: when given (and the fold path applies), the INTERIOR COLA
    normalization 1/sum_s w^2[t + s*rs] is folded into the unfold window
    rows (frows 6/7 — the per-output-column synthesis-window multiply), so
    the output normalization multiply disappears from the kernel entirely
    (r04: the 'norm' ablation measured it at ~2% of kernel time). The
    normalization distributes over the OLA sum because it depends only on
    the output lane t mod rs. Head rows (first m-1 of the recording) then
    need only a tiny CORRECTION table (partial/full energy ratio) at tile
    0, and the external tail fix is unchanged (spill rows come out
    interior-normalized exactly as before). normed=True in the return
    signals the wrappers to use the correction table.
    """
    import ml_dtypes

    nbq = _pad_bins(n_fft // 2)
    z = np.zeros((8, 128), np.float32)  # unread dummies for lo slots
    zb = np.zeros((8, 128), ml_dtypes.bfloat16)
    if fast:
        inv_passes = _INV_PASSES
    else:
        inv_passes = 0
    # Even/odd fold applies when the half-length is lane-aligned; it
    # halves the MXU volume of both DFT stages. Gated on fast so
    # fast=False remains the non-fold full-precision path.
    fold = fast and nbq == n_fft // 2
    normed = fold and norm_rs is not None and 2 * norm_rs <= n_fft
    if fold:
        fwd_passes = _FOLD_FWD_PASSES if fwd_passes is None else fwd_passes
        mc, ms, ic2, is2, rows8, rmat = _fold_consts(n_fft)
        if normed:
            # Interior COLA norm as a per-output-column factor, folded into
            # the synthesis-window rows (w_lo row 6, w_hi row 7) and the
            # lane-0 correction rows of the unfold (rows 4/5 feed e2/y_mid,
            # which are PRE-window — only 6/7 touch the final columns).
            # The interior energy depends only on t mod rs (see
            # _ola_norm_tables), so the fold works for general hops too.
            interior = _ola_norm_tables(n_fft, norm_rs)[0][
                -(-n_fft // norm_rs) - 1
            ]  # (rs,) = 1/full window energy per output lane
            n_ext = interior[np.arange(n_fft) % norm_rs]  # (n_fft,)
            L = n_fft // 2
            rows8 = rows8.copy()
            rows8[6] = rows8[6] * n_ext[:L]
            rows8[7] = rows8[7] * n_ext[L:]
        if inv_passes:
            ich, icl, ish, isl = _fold_inv_split(n_fft)
            inv_mats = (ich, icl, ish, isl)
        else:
            inv_mats = (ic2, z, is2, z)
        if fwd_passes:
            fch, fcl = _bitsplit_host(mc)
            fsh, fsl = _bitsplit_host(ms)
            fwd_mats = (fch, fcl, fsh, fsl)
        else:
            fwd_mats = (mc, z, ms, z)
        mats = fwd_mats + inv_mats + (rmat, rows8)
    else:
        fwd_passes = 0 if fwd_passes is None else fwd_passes
        fcq, fsq, icq, isq = _packed_mats(n_fft)
        fch, fcl, fsh, fsl, ich, icl, ish, isl = _packed_split(n_fft)
        mats = (
            ((fch, fcl, fsh, fsl) if fwd_passes else (fcq, z, fsq, z))
            + ((ich, icl, ish, isl) if inv_passes else (icq, z, isq, z))
            + (zb, z)
        )
    return mats, fwd_passes, inv_passes, fold, normed


def fused_time_stretch(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    rs: int,
    fast: bool = True,
    tile: int | None = None,
    ablate: str = "",
    fwd_passes: int | None = None,
    inv_rev_passes: int | None = None,
    zrev: bool = False,
) -> jnp.ndarray:
    """Full fused TSM: ONE Pallas kernel, raw samples in, waveform out.

    zrev=True replaces the forward fold reversal (3 exact bf16 permutation
    passes on the MXU) with a pre-reversed rows view built by one fused
    XLA reverse pass + in-kernel sublane rolls — exact data movement
    (measured A/B in PROFILE_r04).

    fast=True (default) runs the forward DFT at Precision.HIGHEST (bf16
    splits measured over the gate — see _FOLD_FWD_PASSES), the inverse
    as a 3-pass hi/lo-bf16 split, and enables the even/odd fold
    (_fold_consts: half-length DFT matmuls) when the half-length is
    lane-aligned. fast=False runs BOTH DFT stages at HIGHEST through the
    packed non-fold layout — the full-precision escape hatch. Both use the
    packed bin layout (_packed_mats): matmul lane count exactly n_fft//2.

    tile: frames per grid step (default _TILE_F; perf tuning knob).
    ablate: stage-skip spec for scripts/tpu_profile.py ONLY — output is
    wrong when set.
    fwd_passes / inv_rev_passes: precision A/B knobs for the profiler
    (None = path defaults; fwd_passes=0 forces the forward to HIGHEST).
    """
    if n_fft % hop != 0:
        raise ValueError("fused path requires hop | n_fft")
    if n_fft % 2 != 0:
        # The packed layout routes bin n_fft//2 through the forced-real
        # lane-0 pass-through, which is only correct for even n_fft (where
        # that bin IS the real Nyquist line).
        raise ValueError("fused path requires even n_fft")
    if rs <= 0 or 2 * rs > n_fft:
        raise ValueError("fused path requires 0 < rs <= n_fft/2 (overlap >= 2)")
    nf = num_frames(x.shape[-1], n_fft, hop)
    if nf <= 0:
        raise ValueError("input shorter than one frame")
    overlap = n_fft // hop
    m = -(-n_fft // rs)  # ceil: general hops pad the last OLA segment
    nbq = _pad_bins(n_fft // 2)
    tile = _pick_tile(n_fft, rs, nf) if tile is None else tile
    nf_pad = -(-(nf + m - 1) // tile) * tile
    grid = nf_pad // tile

    n_rows = (grid + 1) * tile
    span = n_rows * hop
    if x.shape[-1] >= span:
        x_pad = x[:span]
    else:
        x_pad = jnp.pad(x, (0, span - x.shape[-1]))
    rows = x_pad.reshape(n_rows, hop)

    mats, fwd_passes, inv_passes, fold, normed = _pvoc_mats(
        n_fft, fast, fwd_passes, norm_rs=rs
    )
    irp = _INV_REV_PASSES if inv_rev_passes is None else inv_rev_passes
    consts = tuple(
        jnp.asarray(c) for c in _phasor_consts_packed(n_fft, hop, rs)
    )
    head_tbl, tail_inv = _ola_norm_tables(n_fft, rs)
    if normed:  # head-row correction only (partial/full energy ratio)
        head_tbl = head_tbl / head_tbl[m - 1 : m]

    mat_specs = [
        pl.BlockSpec(m_.shape, lambda i: (0, 0)) for m_ in mats
    ]
    use_z = zrev and fold and overlap % 2 == 0 and not ablate
    if use_z:
        # Pre-reversed rows view: zr[v, t] = x_pad[(v+1)*hop - t] — one
        # fused XLA reverse pass; the kernel builds the fold's reversed
        # operand from it with sublane rolls instead of the 3-pass exact
        # permutation matmul (see _pvoc_tile).
        xz = jnp.pad(x_pad, (0, 1))[1 : span + 1]
        zr = xz.reshape(n_rows, hop)[:, ::-1]
        kern = functools.partial(
            _pvoc_kernel_z, overlap=overlap, rs=rs, ra=hop, m=m, nf=nf,
            tile=tile, fwd_passes=fwd_passes, inv_passes=inv_passes,
            fold=fold, ablate=ablate, inv_rev_passes=irp, normed=normed,
        )
        row_specs = [
            pl.BlockSpec((tile, hop), lambda i: (i, 0)),
            pl.BlockSpec((tile, hop), lambda i: (i + 1, 0)),
            pl.BlockSpec((tile, hop), lambda i: (i, 0)),
            pl.BlockSpec((tile, hop), lambda i: (i + 1, 0)),
        ]
        row_ops = (rows, rows, zr, zr)
    else:
        kern = functools.partial(
            _pvoc_kernel, overlap=overlap, rs=rs, ra=hop, m=m, nf=nf,
            tile=tile, fwd_passes=fwd_passes, inv_passes=inv_passes,
            fold=fold, ablate=ablate, inv_rev_passes=irp, normed=normed,
        )
        row_specs = [
            pl.BlockSpec((tile, hop), lambda i: (i, 0)),
            pl.BlockSpec((tile, hop), lambda i: (i + 1, 0)),
        ]
        row_ops = (rows, rows)
    main = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=row_specs
        + mat_specs
        + [pl.BlockSpec((1, nbq), lambda i: (0, 0))] * 4
        + [pl.BlockSpec(head_tbl.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((tile, rs), lambda i: (i, 0)),
        out_shape=_out_struct((nf_pad, rs), jnp.float32, x),
        scratch_shapes=[
            pltpu.VMEM((4, nbq), jnp.float32),
            pltpu.VMEM((m - 1, rs), jnp.float32),
        ],
        compiler_params=_compiler_params(n_fft),
        interpret=_interpret(),
    )(*row_ops, *(jnp.asarray(m_) for m_ in mats), *consts,
      jnp.asarray(head_tbl))

    out_len = (nf - 1) * rs + n_fft
    m_full, _ = _ola_norm_tables(n_fft, rs)
    fix = jnp.asarray(tail_inv / m_full[m - 1 : m])
    tail = main[nf : nf + m - 1] * fix
    full = jnp.concatenate([main[:nf].reshape(-1), tail.reshape(-1)])
    return full[:out_len]


def _pvoc_kernel_stream(
    flags, rows_a, rows_b, fch, fcl, fsh, fsl, ich, icl, ish, isl, rev, frows,
    hre, him, cre, cim, norm, fm, carry_in, tail_in,
    out_ref, carry_out, tail_out, carry_ref, tail_ref,
    *, overlap: int, rs: int, ra: int, m: int, tile: int,
    fwd_passes: int, inv_passes: int, fold: bool, inv_rev_passes: int = 3,
    normed: bool = False,
):
    """Streaming wrapper over _pvoc_tile: one fixed-shape SEGMENT per call.

    The cross-segment state of the fused phasor pipeline is tiny — the
    carry block (4, nbq: u_prev / u_0 anchor phasor + running synthesis
    phasor P) and the OLA spill (m-1, rs) — and flows in as inputs and out
    as outputs, so a lax.scan over segments reproduces the monolithic
    kernel EXACTLY (the same scratch state, round-tripped through HBM
    between segments). flags (SMEM, (1, 2) int32) carries [started,
    global frame offset]: tile-0 anchor resets only fire on the very first
    segment; the offset keeps the (odd-Rs) Nyquist sign parity global.
    This is the single-kernel answer to VERDICT r03 #2 — the streaming /
    checkpoint executor riding the phasor kernels instead of the polar
    compensated-pair scan.
    """
    i = pl.program_id(0)
    started = flags[0, 0]
    goff = flags[0, 1]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = carry_in[:]
        tail_ref[:] = tail_in[:]

    mats = (
        fch[:], fcl[:], fsh[:], fsl[:],
        ich[:], icl[:], ish[:], isl[:], rev[:], frows[:],
    )
    consts = (hre[:], him[:], cre[:], cim[:])
    buf = _pvoc_tile(
        i, rows_a[:], rows_b[:], mats, consts, carry_ref, tail_ref, fm[:],
        overlap=overlap, rs=rs, ra=ra, m=m, tile=tile,
        fwd_passes=fwd_passes, inv_passes=inv_passes, fold=fold,
        inv_rev_passes=inv_rev_passes, started=started, goff=goff,
    )
    out_ref[:] = buf if normed else buf * norm[m - 1 : m, :]

    @pl.when(i == 0)
    def _():
        for j in range(m - 1):
            out_ref[j, :] = buf[j, :] * norm[j, :]

    # Unconditional per-step state copy (tiny): the last grid step's values
    # are what lands in HBM — the next segment's carry_in/tail_in.
    carry_out[:] = carry_ref[:]
    tail_out[:] = tail_ref[:]


def fused_stream_segment(
    rows_seg: jnp.ndarray,
    carry: jnp.ndarray,
    tail: jnp.ndarray,
    started: jnp.ndarray,
    frame_offset: jnp.ndarray,
    fmask: jnp.ndarray,
    norm_tbl: jnp.ndarray,
    n_fft: int,
    hop: int,
    rs: int,
    fast: bool = True,
    tile: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One F-frame segment of the streaming fused TSM (see _pvoc_kernel_stream).

    rows_seg: (F + tile, hop) rows view (F % tile == 0; the extra tile is
    the framing lookahead). carry: (4, nbq) f32; tail: (m-1, rs) f32;
    started / frame_offset: () int32; fmask: (F, 1) f32 valid-frame mask;
    norm_tbl: (R>=8, rs) — the head table on the first segment, the interior
    row broadcast on continuing ones (streaming.py builds it).
    Returns (out (F, rs) interior-normalized, carry', tail').
    """
    if n_fft % hop != 0 or rs <= 0 or 2 * rs > n_fft:
        raise ValueError("fused stream requires hop | n_fft and rs <= n_fft/2")
    overlap = n_fft // hop
    m = -(-n_fft // rs)
    nbq = _pad_bins(n_fft // 2)
    tile = _pick_tile(n_fft, rs, 0) if tile is None else tile
    F = rows_seg.shape[0] - tile
    if F <= 0 or F % tile != 0:
        raise ValueError(f"segment frames {F} must be a positive multiple of tile {tile}")
    grid = F // tile

    mats, fwd_passes, inv_passes, fold, normed = _pvoc_mats(
        n_fft, fast, norm_rs=rs
    )
    consts = tuple(
        jnp.asarray(c) for c in _phasor_consts_packed(n_fft, hop, rs)
    )
    flags = jnp.stack(
        [jnp.asarray(started), jnp.asarray(frame_offset)]
    ).reshape(1, 2).astype(jnp.int32)

    mat_specs = [pl.BlockSpec(m_.shape, lambda i: (0, 0)) for m_ in mats]
    out, carry_out, tail_out = pl.pallas_call(
        functools.partial(
            _pvoc_kernel_stream, overlap=overlap, rs=rs, ra=hop, m=m,
            tile=tile, fwd_passes=fwd_passes, inv_passes=inv_passes,
            fold=fold, inv_rev_passes=_INV_REV_PASSES, normed=normed,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, hop), lambda i: (i, 0)),
            pl.BlockSpec((tile, hop), lambda i: (i + 1, 0)),
        ]
        + mat_specs
        + [pl.BlockSpec((1, nbq), lambda i: (0, 0))] * 4
        + [
            pl.BlockSpec(norm_tbl.shape, lambda i: (0, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((4, nbq), lambda i: (0, 0)),
            pl.BlockSpec((m - 1, rs), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, rs), lambda i: (i, 0)),
            pl.BlockSpec((4, nbq), lambda i: (0, 0)),
            pl.BlockSpec((m - 1, rs), lambda i: (0, 0)),
        ],
        out_shape=[
            _out_struct((F, rs), jnp.float32, rows_seg),
            _out_struct((4, nbq), jnp.float32, rows_seg, carry),
            _out_struct((m - 1, rs), jnp.float32, rows_seg, tail),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, nbq), jnp.float32),
            pltpu.VMEM((m - 1, rs), jnp.float32),
        ],
        compiler_params=_compiler_params(n_fft),
        interpret=_interpret(),
    )(flags, rows_seg, rows_seg, *(jnp.asarray(m_) for m_ in mats), *consts,
      jnp.asarray(norm_tbl), fmask, carry, tail)
    return out, carry_out, tail_out


def stream_norm_tables(n_fft: int, rs: int, fast: bool = True):
    """(first_tbl, cont_tbl) for fused_stream_segment's norm input.

    With the interior normalization folded into the matrices (normed), the
    first segment needs the head-row CORRECTION table and continuing
    segments need all-ones; otherwise the real head/interior tables.
    """
    head_tbl, _ = _ola_norm_tables(n_fft, rs)
    m = -(-n_fft // rs)
    normed = _pvoc_mats(n_fft, fast, norm_rs=rs)[4]
    if normed:
        first = head_tbl / head_tbl[m - 1 : m]
        cont = np.ones_like(head_tbl)
    else:
        first = head_tbl
        cont = np.broadcast_to(head_tbl[m - 1 : m], head_tbl.shape).copy()
    return first, cont


def fused_time_stretch_batch(
    xs: jnp.ndarray,
    n_fft: int,
    hop: int,
    rs: int,
    n_valid_frames: jnp.ndarray | None = None,
    fast: bool = True,
) -> jnp.ndarray:
    """Batched fused TSM: one 2-D-grid Pallas kernel over (B, T) utterances.

    The DP answer to the reference's one-file-at-a-time CLI (BASELINE
    config 4: 64-utterance batches): the same single-kernel pipeline as
    fused_time_stretch, with the batch as the outer (sequential) grid axis
    and per-row carry resets (see _pvoc_kernel_batched). Ragged batches
    pass n_valid_frames (B,) — rows are zero-padded to the bucket max and
    masked exactly like the 1-D path's nf cutoff.

    Returns (B, nf_pad * rs) flattened rows; row b's valid span is
    (n_valid_frames[b] - 1) * rs + n_fft samples (the caller slices — see
    parallel/batch.py). Tail rows are renormalized per row.
    """
    if xs.ndim != 2:
        raise ValueError(f"expected (B, T) batch, got shape {xs.shape}")
    if n_fft % hop != 0:
        raise ValueError("fused path requires hop | n_fft")
    if n_fft % 2 != 0:
        raise ValueError("fused path requires even n_fft")
    if rs <= 0 or 2 * rs > n_fft:
        raise ValueError("fused path requires 0 < rs <= n_fft/2 (overlap >= 2)")
    B = xs.shape[0]
    nf = num_frames(xs.shape[-1], n_fft, hop)
    if nf <= 0:
        raise ValueError("input shorter than one frame")
    overlap = n_fft // hop
    m = -(-n_fft // rs)
    nbq = _pad_bins(n_fft // 2)
    tile = _pick_tile(n_fft, rs, nf)  # same kernel body as fused_time_stretch
    nf_pad = -(-(nf + m - 1) // tile) * tile
    grid = nf_pad // tile

    n_rows = (grid + 1) * tile
    span = n_rows * hop
    if xs.shape[-1] >= span:
        x_pad = xs[:, :span]
    else:
        x_pad = jnp.pad(xs, ((0, 0), (0, span - xs.shape[-1])))
    rows = x_pad.reshape(B, n_rows, hop)

    if n_valid_frames is None:
        nfs = jnp.full((B,), nf, dtype=jnp.int32)
    else:
        nfs = jnp.asarray(n_valid_frames, dtype=jnp.int32)
    fm = (
        jnp.arange(nf_pad, dtype=jnp.int32)[None, :] < nfs[:, None]
    ).astype(jnp.float32)[..., None]  # (B, nf_pad, 1)

    mats, fwd_passes, inv_passes, fold, normed = _pvoc_mats(
        n_fft, fast, norm_rs=rs
    )
    consts = tuple(
        jnp.asarray(c) for c in _phasor_consts_packed(n_fft, hop, rs)
    )
    head_tbl, tail_inv = _ola_norm_tables(n_fft, rs)
    if normed:
        head_tbl = head_tbl / head_tbl[m - 1 : m]

    mat_specs = [
        pl.BlockSpec(m_.shape, lambda b, i: (0, 0)) for m_ in mats
    ]
    main = pl.pallas_call(
        functools.partial(
            _pvoc_kernel_batched, overlap=overlap, rs=rs, ra=hop, m=m,
            tile=tile, fwd_passes=fwd_passes, inv_passes=inv_passes,
            fold=fold, inv_rev_passes=_INV_REV_PASSES, normed=normed,
        ),
        grid=(B, grid),
        in_specs=[
            pl.BlockSpec((1, tile, hop), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tile, hop), lambda b, i: (b, i + 1, 0)),
        ]
        + mat_specs
        + [pl.BlockSpec((1, nbq), lambda b, i: (0, 0))] * 4
        + [
            pl.BlockSpec(head_tbl.shape, lambda b, i: (0, 0)),
            pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, rs), lambda b, i: (b, i, 0)),
        out_shape=_out_struct((B, nf_pad, rs), jnp.float32, xs),
        scratch_shapes=[
            pltpu.VMEM((4, nbq), jnp.float32),
            pltpu.VMEM((m - 1, rs), jnp.float32),
        ],
        compiler_params=_compiler_params(n_fft),
        interpret=_interpret(),
    )(rows, rows, *(jnp.asarray(m_) for m_ in mats), *consts,
      jnp.asarray(head_tbl), fm)

    # Per-row tail renormalization: rows nf_b .. nf_b+m-2 got the interior
    # normalization in-kernel; rescale to the true tail normalization at
    # each row's own frame count (ragged-safe via dynamic slices).
    m_full, _ = _ola_norm_tables(n_fft, rs)
    fix = jnp.asarray(tail_inv / m_full[m - 1 : m])

    def _fix_row(row, nf_b):
        tail = jax.lax.dynamic_slice(
            row, (nf_b, 0), (m - 1, rs)
        ) * fix
        return jax.lax.dynamic_update_slice(row, tail, (nf_b, 0)).reshape(-1)

    return jax.vmap(_fix_row)(main, nfs)
