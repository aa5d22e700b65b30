"""Linear-interpolation resampler (reference component C12 — pitch shift).

The reference resamples with a CUDA kernel (or host loop). TPU gathers are
the wrong primitive for this (measured on v5e: 22-48M gathered elements/s —
the per-element gather made resampling ~20x the cost of the entire fused
TSM kernel, PROFILE_r03.json), so this module is gather-free on every hot
path:

  * rational steps p/q (q small): out[m*q + r] = lerp(x[m*p + a_r], w_r)
    with per-residue constant offsets/weights — q strided slices, pure
    layout ops. Covers every octave pitch shift EXACTLY (+-12 st resample
    by 2 or 1/2 is p/q in {2/1, 1/2}; identity is 1/1).
  * irrational steps: blocked strided-select. Output blocks of B samples
    read an S-sample input span; the span matrix is built by a ROW gather
    (nb rows, not out_len elements), and the in-block selection
    out[r] = span[c*r + k_r] is a sum over the K possible carry values k
    of statically-strided slices under a mask — elementwise VPU work that
    XLA fuses, no element gather anywhere.

Precision: sample positions j/factor are split per block into an exact
host-computed float64 integer part and a small float32 fractional part, so
position error stays ~1e-4 samples for arbitrarily long outputs (naive
float32 j/factor drifts past 2^23 samples). Linear interpolation is
continuous in position, so the <=1-ulp position differences between
formulations are ~slope*2^-24 in the waveform — far below the 1e-4 gate.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 1024  # positions-precision block (f64 host starts)
# Rows per grid step of the strided-select kernel; sweepable on chip (the
# r03 kernel was grid-overhead-bound at small B — more rows per step
# amortize it; VMEM use is R*(Sp+3B)*4 bytes). r05 sweep on the v3 fused
# kernel: 64 > 32 > 128 (resample_ablate, PROFILE_r05) — per-grid-step
# fixed overhead is a leading term, 128 trips VMEM pressure.
_SEL_ROWS = 64
# Select implementation: "mxu" (default, round 5 v4) = whole-row exact
# alignment then the STATIC shear as a 0/1 matmul on the MXU with
# hat-weight lerp (_select_body_v4) — chip A/B: 1803/1284 Msamp/s vs v3's
# 1267/1020 at the -7/+5 st steps (RESAMPLE_AB_r05.json). "fused" = v3:
# positions, carries, lerp weights, per-row alignment (8 static
# bit-rolls) and the short residual select ALL inside one kernel — no
# output-length index tensors, no per-row dynamic rolls (_select_body_v3;
# the r05 attribution showed v2 was bound by XLA index passes + tiny-roll
# op overhead, not arithmetic). "roll2" = v2 (dynamic per-chunk alignment
# via SMEM bases); "roll" = the r04 single-level K+1 rotations; "matmul"
# = per-row one-hot MXU selects. All A/B'd on chip (PITCH_r04/r05,
# RESAMPLE_AB_r05).
_SEL_IMPL = "mxu"
# Rows per grid step of the v4 MXU shear-select kernel (the matmul's M
# dim; 128 fills the MXU tile). r05 chip A/B (RESAMPLE_AB_r05.json):
# mxu128 1803/1284 Msamp/s vs v3 'fused' 1267/1020 at the -7/+5 st pitch
# steps (mxu64 within noise of 128); v4 is the default since r05.
_MXU_ROWS = 128
# One concatenated-K dot vs three split dots in the v4 kernel (A/B'd on
# chip; identical exact arithmetic either way).
_MXU_ONEDOT = False
_SEL_MM_ROWS = 8
# Blocks per superblock in the gather-free span construction (drift
# absorbed into the select range: K -> K + _SEL_SUPER).
_SEL_SUPER = 64
# Output block for the strided-select path. Chip sweep (PROFILE_r03.json):
# 512 maximizes the row-gather/select-loop tradeoff — 162.6 M out-samples/s
# at step 1.335 (vs 73.7 at B=128, 118.3 at B=1024); 127 M/s at step 0.749.
_SEL_BLOCK = 512


def _as_rational_step(factor: float, max_q: int = 4, max_p: int = 8):
    """1/factor as an EXACT small fraction p/q, or None.

    Exactness in float64 is required (the golden model computes j/factor in
    f64); octave factors (powers of two) always qualify.
    """
    if factor <= 0:
        return None
    step = 1.0 / factor
    fr = Fraction(step).limit_denominator(max_q)
    if 0 < fr.numerator <= max_p and float(fr) == step:
        return fr
    return None


def resample_linear(x: jnp.ndarray, factor: float, out_len: int) -> jnp.ndarray:
    """Resample 1-D x by `factor` (>1 = more samples) to `out_len` samples.

    out[j] = x[j / factor], linear interpolation, edge-clamped. Matches
    golden/pv_ref.py::resample_linear.
    """
    if out_len <= 0:
        return jnp.zeros((0,), dtype=x.dtype)
    if x.shape[-1] == 0:
        return jnp.zeros((out_len,), dtype=x.dtype)
    fr = _as_rational_step(factor)
    if fr is not None:
        return _resample_rational(x, fr.numerator, fr.denominator, out_len)
    return _resample_strided_select(x, factor, out_len)


def _positions(factor: float, out_len: int, n: int):
    """(lo int32, frac f32) exact blocked positions, edge-clamped (both
    the gather reference and the strided-select path use these).

    The in-block offset j/factor is itself split into an exact integer
    part and a sub-1.0 f32 fraction: a single f32 j/factor has ulp
    ~2.4e-4 samples at j ~ 2048, which was the dominant error term of the
    whole pitch pipeline (measured ~8e-5 vs golden at +5/+7 st); with the
    split, position error is ~6e-8 samples at any block size.
    """
    nblocks = -(-out_len // _BLOCK)
    starts = np.arange(nblocks, dtype=np.float64) * (_BLOCK / factor)
    start_int = jnp.asarray(np.floor(starts), dtype=jnp.int32)
    start_frac = jnp.asarray(starts - np.floor(starts), dtype=jnp.float32)
    jo64 = np.arange(_BLOCK, dtype=np.float64) / factor
    jo_int = jnp.asarray(np.floor(jo64), dtype=jnp.int32)
    jo_frac = jnp.asarray(jo64 - np.floor(jo64), dtype=jnp.float32)
    local = start_frac[:, None] + jo_frac[None, :]  # in [0, 2)
    local_int = jnp.floor(local)
    lo = (
        start_int[:, None] + jo_int[None, :] + local_int.astype(jnp.int32)
    ).reshape(-1)[:out_len]
    frac = (local - local_int).reshape(-1)[:out_len]
    return jnp.clip(lo, 0, n - 1), frac


def _resample_gather(x: jnp.ndarray, factor: float, out_len: int) -> jnp.ndarray:
    """Reference implementation: per-element gather (kept as the parity
    oracle for the layout-based paths; slow on TPU)."""
    n = x.shape[-1]
    lo, frac = _positions(factor, out_len, n)
    frac = frac.astype(x.dtype)
    hi = jnp.minimum(lo + 1, n - 1)
    return x[lo] * (1.0 - frac) + x[hi] * frac


@functools.lru_cache(maxsize=32)
def _rational_mats(p: int, q: int):
    """(M (128p, 128q) f32, cross (1, 128q) f32) for the matmul resampler.

    Within one row of X (128p input samples starting at m0*p), output
    column c = j*q + r (j in [0,128), r in [0,q)) is
      out = x[j*p + a_r]*(1-w_r) + x[j*p + a_r + 1]*w_r,
    a_r = (r*p)//q, w_r = (r*p mod q)/q. All in-row terms land in M; the
    lerp neighbor of the last j that crosses the row boundary (j = 127,
    a_r + 1 == p) lands in `cross`, applied to the NEXT row's first sample.
    Entries are exact dyadic/q-adic fractions.
    """
    M = np.zeros((128 * p, 128 * q), np.float32)
    cross = np.zeros((1, 128 * q), np.float32)
    for j in range(128):
        for r in range(q):
            a = (r * p) // q
            w = ((r * p) % q) / q
            c = j * q + r
            M[j * p + a, c] += 1.0 - w
            if w:
                hi = j * p + a + 1
                if hi < 128 * p:
                    M[hi, c] += w
                else:
                    cross[0, c] = w
    return M, cross


def _resample_rational(x: jnp.ndarray, p: int, q: int, out_len: int) -> jnp.ndarray:
    """step = p/q exactly: ONE lane-aligned MXU matmul per 128 output
    groups — the TPU-native replacement for per-output strided slices.

    Strided 1-D slices lower to lane relayouts on TPU (measured round 3:
    337-1449 M samples/s — they dominated octave pitch shifts); the matmul
    form reads x as (R, 128p) rows and multiplies by a constant (128p,
    128q) lerp-weight matrix at Precision.HIGHEST (exact for the dyadic
    weights; the f32 matmul emulation is exact for the {1-w, w} two-term
    sums), hitting the MXU at trivial cost (128p MACs/output). The lerp
    neighbor crossing each row boundary is added via a (R, 1) next-row
    column — a pure slice.
    """
    n = x.shape[-1]
    m_out = -(-out_len // q)
    R = -(-m_out // 128)
    need = R * 128 * p + 1
    pad = max(0, need - n)
    xp = jnp.pad(x, (0, pad), mode="edge") if pad else x[:need]
    if xp.shape[-1] > need:
        xp = xp[:need]
    X = xp[: R * 128 * p].reshape(R, 128 * p)
    M, cross = _rational_mats(p, q)
    out = jnp.dot(
        X, jnp.asarray(M), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if np.any(cross):
        nxt = jnp.concatenate([X[1:, :1], xp[R * 128 * p :][None]], axis=0)
        out = out + nxt * jnp.asarray(cross)
    return out.reshape(R * 128 * q)[:out_len]


def _resample_rational_slices(x: jnp.ndarray, p: int, q: int, out_len: int) -> jnp.ndarray:
    """Strided-slice formulation (kept as the parity oracle for tests).

    out[m*q + r] = x[m*p + (r*p)//q] * (1-w_r) + x[m*p + (r*p)//q + 1] * w_r
    with w_r = (r*p mod q)/q — offsets and weights constant per residue r.
    """
    n = x.shape[-1]
    m_out = -(-out_len // q)
    # Edge-pad so m*p + a_r + 1 stays in range, with clamp semantics.
    max_idx = (m_out - 1) * p + ((q - 1) * p) // q + 1
    pad = max(0, max_idx + 1 - n)
    xp = jnp.pad(x, (0, pad), mode="edge") if pad else x
    cols = []
    for r in range(q):
        a = (r * p) // q
        w = ((r * p) % q) / q
        base = jax.lax.slice(xp, (a,), (a + (m_out - 1) * p + 1,), (p,))
        if w == 0.0:
            cols.append(base)
        else:
            nxt = jax.lax.slice(xp, (a + 1,), (a + 1 + (m_out - 1) * p + 1,), (p,))
            cols.append(base * (1.0 - w) + nxt * w)
    out = jnp.stack(cols, axis=1).reshape(m_out * q)
    return out[:out_len]


@functools.lru_cache(maxsize=32)
def _fused_sel_consts(factor: float, out_len: int, n: int):
    """Host-side exact constants for the v3 fused select (all f64 math).

    Everything the kernel needs beyond the span rows: per-block scalars
    S = start_int - used + OFF (int32) and F = start_frac (f32), the
    static per-chunk offset vectors V/JF, and the geometry ints.
    """
    step = 1.0 / factor
    B = _SEL_BLOCK
    CH = _V2_CHUNK
    nch = B // CH
    nb = -(-out_len // B)
    starts64 = np.arange(nb, dtype=np.float64) * (B / factor)
    start_int = np.floor(starts64).astype(np.int64)
    start_frac = (starts64 - np.floor(starts64)).astype(np.float32)
    jo64 = np.arange(B, dtype=np.float64) / factor
    jo_int = np.floor(jo64).astype(np.int64)
    jo_frac = (jo64 - np.floor(jo64)).astype(np.float32)
    c = 1
    if step >= 1.0:
        OFF = 0
        K = int(np.ceil(B * (step - 1.0))) + 3
    else:
        OFF = int(np.ceil(B * (1.0 - step))) + 3
        K = OFF + 3
    G = _SEL_SUPER
    stride = max(1, int(np.floor(B * step)))
    Kp = K + G
    W = c * (B - 1) + Kp + 1
    nr = -(-W // stride) + 1
    n_super = -(-nb // G)
    sb_len = (G + nr - 1) * stride
    lo0 = np.clip(start_int, 0, n - 1)  # block starts (jo[0] = 0)
    nb_pad = n_super * G
    lo0_p = np.concatenate([lo0, np.full(nb_pad - nb, lo0[-1] if nb else 0)])
    anchors = lo0_p.reshape(n_super, G)[:, 0]
    used = (
        anchors[:, None] + stride * np.arange(G, dtype=np.int64)[None, :]
    ).reshape(-1)[:nb]
    S = (start_int - used + OFF).astype(np.int32)[:, None]  # (nb, 1)
    F = start_frac[:, None]  # (nb, 1)
    V = (jo_int - c * np.arange(B, dtype=np.int64)).astype(
        np.int32
    ).reshape(nch, CH)
    JF = jo_frac.reshape(nch, CH)
    K2 = int(np.ceil(CH * abs(step - c))) + 4
    Wx = -(-(Kp + c * (CH - 1) + K2 + 2) // 128) * 128
    return dict(
        B=B, CH=CH, nch=nch, nb=nb, c=c, OFF=OFF, K=K, Kp=Kp, K2=K2,
        Wx=Wx, G=G, stride=stride, nr=nr, n_super=n_super, sb_len=sb_len,
        S=S, F=F, V=V, JF=JF, anchors=anchors.astype(np.int32),
    )


def _fused_spans(
    x: jnp.ndarray, cst: dict, width: int | None = None
) -> jnp.ndarray:
    """(nb, <=nr*stride) span rows — gather-free superblock construction
    (one row-gather per superblock of G blocks, drift absorbed into the
    select range; see the v2 notes). Shared by the v3 and v4 kernels.

    `width` caps the constructed span width: the v4 kernel reads only
    smax + Wk lanes (~1024) of the full nr*stride (~2304) span, and the
    r05 chip attribution (RESAMPLE_ATTR_r05.json) showed span
    construction is ~77% of resample wall — building only the needed
    parts cuts its HBM bytes ~2.3x. The per-superblock row gather always
    fetches sb_len (the trailing rows feed the last blocks' parts), but
    the O(nb * span_width) concat/materialization shrinks."""
    xp = jnp.pad(x, (cst["OFF"], cst["sb_len"] + cst["stride"] + 1),
                 mode="edge")
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    supers = jax.lax.gather(
        xp,
        jnp.asarray(cst["anchors"])[:, None],
        dnums,
        slice_sizes=(cst["sb_len"],),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (n_super, sb_len)
    rows = supers.reshape(
        cst["n_super"], cst["G"] + cst["nr"] - 1, cst["stride"]
    )
    nparts = cst["nr"]
    if width is not None:
        nparts = min(cst["nr"], -(-width // cst["stride"]))
    parts = [rows[:, j : j + cst["G"], :] for j in range(nparts)]
    spans = jnp.concatenate(parts, axis=-1).reshape(
        cst["n_super"] * cst["G"], nparts * cst["stride"]
    )[: cst["nb"]]
    if width is not None and spans.shape[1] > width:
        spans = spans[:, :width]
    return spans


def _resample_fused(x: jnp.ndarray, factor: float, out_len: int) -> jnp.ndarray:
    """v3 fused strided select: spans from superblocks + ONE kernel doing
    index math, alignment, and lerp (see _select_body_v3)."""
    from jax.experimental import pallas as pl

    from .pallas.stft import _interpret, _out_struct

    n = x.shape[-1]
    cst = _fused_sel_consts(factor, out_len, n)
    B, CH, nch = cst["B"], cst["CH"], cst["nch"]
    nb, c, OFF = cst["nb"], cst["c"], cst["OFF"]
    Kp, K2, Wx = cst["Kp"], cst["K2"], cst["Wx"]
    stride, nr, n_super, sb_len = (
        cst["stride"], cst["nr"], cst["n_super"], cst["sb_len"]
    )

    spans = _fused_spans(x, cst)

    R = _SEL_ROWS
    nbp = -(-nb // R) * R
    S_span = nr * stride
    sp_need = max(S_span, c * CH * (nch - 1) + Wx)
    Sp = -(-sp_need // 128) * 128
    spans_p = jnp.pad(spans, ((0, nbp - nb), (0, Sp - S_span)))
    si = jnp.pad(jnp.asarray(cst["S"]), ((0, nbp - nb), (0, 0)))
    sf = jnp.pad(jnp.asarray(cst["F"]), ((0, nbp - nb), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _select_body_v3, K2=K2, Kp=Kp, c=c, Wx=Wx
        ),
        grid=(nbp // R,),
        in_specs=[
            pl.BlockSpec((R, Sp), lambda i: (i, 0)),
            pl.BlockSpec((R, 1), lambda i: (i, 0)),
            pl.BlockSpec((R, 1), lambda i: (i, 0)),
            pl.BlockSpec((nch, CH), lambda i: (0, 0)),
            pl.BlockSpec((nch, CH), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, B), lambda i: (i, 0)),
        out_shape=_out_struct((nbp, B), jnp.float32, x),
        interpret=_interpret(),
    )(spans_p, si, sf, jnp.asarray(cst["V"]), jnp.asarray(cst["JF"]))
    return out.reshape(-1)[:out_len]


def _select_body_v4(
    spans_ref, si_ref, sf_ref, jf_ref, w_ref, out_ref, *, bits, Wk: int
):
    """MXU shear select (round-5 v4): one whole-row alignment, then the
    static shear as a 0/1 matmul — no per-lane carry select at all.

    After left-rolling row r by its exact block-start offset S_r (the 8
    static bit-rolls of v3, applied ONCE per row instead of per chunk),
    lane 0 is x[start_int_r] and the j-th output reads lane
    jo_int[j] + e_j with e_j = floor(F_r + jo_frac[j]) in {0, 1} — the
    STATIC shear jo_int plus a 1-bounded exact correction. The shear is a
    compile-time 0/1 matrix [W0|W1|W2] (W_s[i, j] = 1 iff i = jo_int[j]+s)
    so y_s = A @ W_s picks A[:, jo_int+s] on the MXU (3 exact bf16 splits
    of A; 0/1 weights make each split-product exact, disjoint sums
    reconstruct f32 exactly). The linear interpolation collapses to hat
    weights over u = F + jo_frac in [0, 2):
        out = max(1-u, 0)*y0 + (1-|u-1|)*y1 + max(u-1, 0)*y2
    which is arithmetic-identical to v3's (1-fr)/fr lerp at e=0/e=1.
    v3's residual K2-select loop (the measured VPU bind at ~1.5 Gsamp/s,
    share 0.55-0.67 of pitch wall) is gone entirely.
    """
    from jax.experimental.pallas import tpu as pltpu

    At = spans_ref[:]  # (R, Sp)
    S = si_ref[:]  # (R, 1) int32: start_int - used + OFF
    F = sf_ref[:]  # (R, 1) f32: start_frac
    jf = jf_ref[:]  # (1, B) f32: jo_frac
    for b in bits:  # descending powers of two covering max(S)
        # Live window before bit b: Wk + (remaining bits sum) = Wk+2b-1.
        need = -(-(Wk + 2 * b - 1) // 128) * 128
        if At.shape[1] > need:
            At = At[:, :need]
        rolled = pltpu.roll(At, At.shape[1] - b, 1)
        At = jnp.where((S & b) != 0, rolled, At)
    A = At[:, :Wk]
    a1 = A.astype(jnp.bfloat16)
    r1 = A - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    W = w_ref[:]  # (Wk, 3B) or (3*Wk, 3B) bf16 0/1
    if W.shape[0] == 3 * Wk:
        # One MXU dot: splits concatenated along K against [W; W; W]
        # (identical exact sum, one Mosaic op instead of three).
        y = jnp.dot(
            jnp.concatenate([a1, a2, a3], axis=1),
            W,
            preferred_element_type=jnp.float32,
        )
    else:
        y = (
            jnp.dot(a1, W, preferred_element_type=jnp.float32)
            + jnp.dot(a2, W, preferred_element_type=jnp.float32)
            + jnp.dot(a3, W, preferred_element_type=jnp.float32)
        )
    B = out_ref.shape[1]
    y0, y1, y2 = y[:, :B], y[:, B : 2 * B], y[:, 2 * B :]
    u = F + jf  # in [0, 2); e = floor(u), fr = u - e
    w0 = jnp.maximum(1.0 - u, 0.0)
    w1 = 1.0 - jnp.abs(u - 1.0)
    w2 = jnp.maximum(u - 1.0, 0.0)
    out_ref[:] = w0 * y0 + w1 * y1 + w2 * y2


def _resample_mxu(x: jnp.ndarray, factor: float, out_len: int) -> jnp.ndarray:
    """v4 MXU shear select (see _select_body_v4)."""
    from jax.experimental import pallas as pl

    from .pallas.stft import _interpret, _out_struct

    n = x.shape[-1]
    cst = _fused_sel_consts(factor, out_len, n)
    B, nb = cst["B"], cst["nb"]

    jo64 = np.arange(B, dtype=np.float64) / factor
    jo_int = np.floor(jo64).astype(np.int64)
    jo_frac = (jo64 - np.floor(jo64)).astype(np.float32)
    Wk = -(-int(jo_int[-1] + 3) // 128) * 128
    Wm = np.zeros((Wk, 3 * B), np.float32)
    idx = np.arange(B)
    for s in range(3):
        Wm[jo_int + s, s * B + idx] = 1.0
    if _MXU_ONEDOT:
        Wm = np.concatenate([Wm, Wm, Wm], axis=0)

    # Build only the span lanes the kernel reads: max normal-block offset
    # + the Wk select window (span construction is ~77% of resample wall
    # at full nr*stride width — RESAMPLE_ATTR_r05.json).
    L_full = cst["nr"] * cst["stride"]
    s_norm = (
        int(np.minimum(cst["S"][:, 0], L_full - Wk).max()) if nb else 0
    )
    width = -(-(max(s_norm, 0) + Wk) // 128) * 128
    spans = _fused_spans(x, cst, width=min(width, L_full))

    S_span = spans.shape[1]
    # Blocks whose start lies entirely beyond the input end carry a huge
    # start_int - used offset, but their whole span row is the edge-clamp
    # constant (xp edge pad), so ANY in-range window reads the exact
    # clamped output — cap S at L - Wk (v3 reached the same result by
    # clipping per-element carries; measured: uncapped S wraps the
    # bit-rolls into the zero padding on out_len >> n/step requests).
    S = np.minimum(cst["S"][:, 0], S_span - Wk)
    smax = int(S.max()) if nb else 0
    assert nb == 0 or S.min() >= 0, "span offset underflow"
    bits = [1 << i for i in range(smax.bit_length())][::-1]

    R = _MXU_ROWS
    nbp = -(-nb // R) * R
    Sp = -(-max(S_span, smax + Wk) // 128) * 128
    spans_p = jnp.pad(spans, ((0, nbp - nb), (0, Sp - S_span)))
    si = jnp.pad(
        jnp.asarray(S.astype(np.int32)[:, None]), ((0, nbp - nb), (0, 0))
    )
    sf = jnp.pad(jnp.asarray(cst["F"]), ((0, nbp - nb), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_select_body_v4, bits=tuple(bits), Wk=Wk),
        grid=(nbp // R,),
        in_specs=[
            pl.BlockSpec((R, Sp), lambda i: (i, 0)),
            pl.BlockSpec((R, 1), lambda i: (i, 0)),
            pl.BlockSpec((R, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, B), lambda i: (0, 0)),
            pl.BlockSpec(Wm.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, B), lambda i: (i, 0)),
        out_shape=_out_struct((nbp, B), jnp.float32, x),
        interpret=_interpret(),
    )(
        spans_p,
        si,
        sf,
        jnp.asarray(jo_frac).reshape(1, B),
        jnp.asarray(Wm, jnp.bfloat16),
    )
    return out.reshape(-1)[:out_len]


def _resample_strided_select(
    x: jnp.ndarray, factor: float, out_len: int
) -> jnp.ndarray:
    """Irrational steps: blocked strided-select (see module docstring).

    Per output block of B samples: a row gather fetches the (nb, S) span
    matrix (nb dynamic slices — NOT an element gather), then the in-block
    offsets o_r = lo_r - block_start decompose as o_r = c*r + k_r with
    c = floor(step) and k_r in [0, K); summing the K statically-strided
    span slices under (k_r == k) masks reconstructs the exact lerp inputs
    with pure elementwise ops that XLA fuses into one pass.
    """
    n = x.shape[-1]
    step = 1.0 / factor
    if _SEL_IMPL in ("fused", "mxu") and 0.5 <= step < 2.0:
        # Every pitch-shift step lands here; the fused v3/v4 kernels
        # (positions + alignment + select in VMEM) replace the v1/v2
        # paths below, which are kept as parity oracles and for steps
        # outside [0.5, 2).
        if _SEL_IMPL == "mxu":
            return _resample_mxu(x, factor, out_len)
        return _resample_fused(x, factor, out_len)
    B = _SEL_BLOCK
    lo, frac = _positions(factor, out_len, n)
    frac = frac.astype(x.dtype)

    nb = -(-out_len // B)
    pad_out = nb * B - out_len
    lo_b = jnp.pad(lo, (0, pad_out), mode="edge").reshape(nb, B)
    starts = lo_b[:, 0]  # (nb,) block input starts (monotone)
    o = lo_b - starts[:, None]  # (nb, B) in-block offsets, >= 0

    c_floor = int(np.floor(step)) if step >= 1.0 else 0
    # k_r = o_r - c*r: bounded by the fractional accumulation across one
    # block (+ rounding slack); K is static.
    K = int(np.ceil(B * (step - c_floor))) + 3
    S = c_floor * (B - 1) + K + 1  # widest span incl. the +1 lerp neighbor

    fr2 = jnp.pad(frac, (0, pad_out)).reshape(nb, B)
    if c_floor <= 1:
        # c = round(step) capped at 1 (the kernel's lane ramp supports
        # c in {0, 1}): for step in [0.5, 1) this runs the select at
        # c = 1 with a LEFT OFFSET absorbing the negative drift — the
        # roll count K tracks B*|step - 1| instead of B*step (measured
        # ~2x fewer rolls at step 0.749).
        if step >= 1.0:
            c, OFF = 1, 0
            K = int(np.ceil(B * (step - 1.0))) + 3
        elif step >= 0.5:
            c = 1
            OFF = int(np.ceil(B * (1.0 - step))) + 3
            K = OFF + 3
        else:
            c, OFF = 0, 0
            K = int(np.ceil(B * step)) + 3
        # Every pitch-shift step lands here (step in (0.5, 2)). r04: the
        # per-block span ROW GATHER (nb ~ 90k rows of ~S samples) measured
        # 64% of the whole resample (select_attr, chip) — so spans are now
        # built GATHER-FREE from SUPERBLOCKS: G consecutive blocks share
        # one long contiguous window (one gather of nb/G long rows — DMA-
        # friendly), and within a superblock every block's span starts at
        # a FIXED stride floor(B*step); the per-block drift (< G) is
        # absorbed into the select offset k, whose range grows K -> K+G.
        # The window then reshapes into per-block span rows with pure
        # static slices (the framing fold trick).
        G = _SEL_SUPER
        stride = max(1, int(np.floor(B * step)))
        Kp = K + G  # drift bound: 0 <= exact_start - fixed_start < G
        W = c * (B - 1) + Kp + 1
        nr = -(-W // stride) + 1  # rows per span window
        n_super = -(-nb // G)
        sb_len = (G + nr - 1) * stride  # samples per superblock row
        # Anchor = exact start of each superblock's first block.
        nb_pad = n_super * G
        starts_p = jnp.pad(starts, (0, nb_pad - nb), mode="edge")
        anchors = starts_p.reshape(n_super, G)[:, 0]  # (n_super,)
        used = (
            anchors[:, None]
            + stride * jnp.arange(G, dtype=jnp.int32)[None, :]
        ).reshape(-1)[:nb]  # fixed span starts per block
        # Left pad by OFF: window [used - OFF, ...) in x coordinates is
        # [used, ...) in xp coordinates, so anchors need no adjustment.
        xp = jnp.pad(x, (OFF, sb_len + stride + 1), mode="edge")
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
        )
        supers = jax.lax.gather(
            xp,
            anchors[:, None],
            dnums,
            slice_sizes=(sb_len,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (n_super, sb_len)
        rows = supers.reshape(n_super, G + nr - 1, stride)
        parts = [rows[:, j : j + G, :] for j in range(nr)]
        spans = jnp.concatenate(parts, axis=-1).reshape(
            n_super * G, nr * stride
        )[:nb]
        k = (
            lo_b - used[:, None] + OFF
            - c * jnp.arange(B, dtype=jnp.int32)[None, :]
        )
        # Right-edge clamp: where lo was clipped to n-1 (positions past
        # the end), k can fall below 0; clamping re-points the select at
        # an index >= the clipped one, which the edge padding maps to
        # x[n-1] — exactly the reference clamp semantics.
        k = jnp.clip(k, 0, Kp - 1)
        # Lanes whose position clipped to the last sample (lo == n-1) give
        # exactly x[n-1] (both lerp taps clamp); they are overwritten after
        # the kernel. Those lanes AND the out_len padding lanes (whose
        # edge-replicated lo breaks the in-chunk monotone-drift structure)
        # are excluded from the v2 chunk-base minima so they cannot widen
        # a chunk's residual range past its static bound.
        in_range = (
            jnp.arange(nb * B, dtype=jnp.int32).reshape(nb, B) < out_len
        )
        valid = (lo_b < (n - 1)) & in_range
        out = _select_kernel_call(
            spans, k, fr2, K=Kp, c=c, step=step, valid=valid
        )
        out = jnp.where(lo_b == n - 1, x[n - 1], out)
        return out.reshape(-1)[:out_len]

    # Span matrix via row gather: nb slices of S contiguous samples.
    xp = jnp.pad(x, (0, S + 1), mode="edge")
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    spans = jax.lax.gather(
        xp,
        starts[:, None],
        dnums,
        slice_sizes=(S,),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (nb, S)

    c = c_floor
    k = o - c * jnp.arange(B, dtype=jnp.int32)[None, :]  # (nb, B) in [0, K)
    k = jnp.clip(k, 0, K - 1)
    acc_lo = jnp.zeros((nb, B), x.dtype)
    acc_hi = jnp.zeros((nb, B), x.dtype)
    width = c * (B - 1) + 1
    for kk in range(K):
        m = k == kk
        sl = jax.lax.slice(spans, (0, kk), (nb, kk + width), (1, c))
        sl1 = jax.lax.slice(spans, (0, kk + 1), (nb, kk + 1 + width), (1, c))
        acc_lo = acc_lo + jnp.where(m, sl, 0)
        acc_hi = acc_hi + jnp.where(m, sl1, 0)
    out = acc_lo * (1.0 - fr2) + acc_hi * fr2
    return out.reshape(-1)[:out_len]


def _select_mm_body(spans_ref, k_ref, fr_ref, out_ref, *, c: int):
    """MXU one-hot select: out[r] = lerp(span[c*r + k_r], fr_r) as matmuls.

    The roll-based select (below) costs K+1 sequential lane rotations of
    the span per block (K ~ B*(step-c) ~ 174 at B=512) and measured only
    130-190 M out-samples/s on chip — the rotations, not arithmetic, bind.
    Here each block row builds a {0,1} one-hot (Sp, B) from iota compares
    (pure elementwise, no data movement) and SELECTS VIA THE MXU:
    lo = span_row @ onehot (3-pass exact: one-hot is bf16-exact, the span
    is 3-way bitmask-split), hi reuses the SAME one-hot against the
    1-shifted span. Exact lerp, zero gathers, reduction on the otherwise
    idle MXU.
    """
    from .pallas.fused import _split32_3

    from jax.experimental.pallas import tpu as pltpu

    sp = spans_ref[:]  # (R, Sp) f32
    k = k_ref[:]  # (R, B) int32
    fr = fr_ref[:]
    R, Sp = sp.shape
    B = k.shape[1]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (Sp, B), 0)
    if c:
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (Sp, B), 1)
    sp_sh = pltpu.roll(sp, Sp - 1, 1)  # sp_sh[:, s] = sp[:, s+1]
    h1, h2, h3 = _split32_3(sp)
    g1, g2, g3 = _split32_3(sp_sh)
    rows_lo = []
    rows_hi = []
    for q in range(R):
        tgt = k[q : q + 1, :]  # (1, B) broadcasts over the Sp axis
        if c:
            tgt = tgt + c * iota_b
        oh = (iota_s == tgt).astype(jnp.bfloat16)  # (Sp, B), exact

        def sel(p1, p2, p3):
            r = jnp.dot(p1[q : q + 1], oh, preferred_element_type=jnp.float32)
            r = r + jnp.dot(p2[q : q + 1], oh,
                            preferred_element_type=jnp.float32)
            return r + jnp.dot(p3[q : q + 1], oh,
                               preferred_element_type=jnp.float32)

        rows_lo.append(sel(h1, h2, h3))
        rows_hi.append(sel(g1, g2, g3))
    lo = jnp.concatenate(rows_lo, axis=0)  # (R, B)
    hi = jnp.concatenate(rows_hi, axis=0)
    out_ref[:] = lo * (1.0 - fr) + hi * fr


_V2_CHUNK = 128  # output lanes per dynamically-aligned chunk


def _select_body_v3(
    spans_ref, si_ref, sf_ref, v_ref, jf_ref, out_ref,
    *, K2: int, Kp: int, c: int, Wx: int
):
    """Fully fused strided select: positions, carries, lerp weights, and
    the two-level alignment ALL in VMEM (round-5 v3).

    The r05 attribution (PROFILE_r05 resample_attr) showed v2 was bound by
    (a) ~12 XLA element passes building lo/k/frac/bases at output length
    (31% of wall), and (b) per-(row, chunk) DYNAMIC pltpu.rolls — 128 tiny
    (1, Sp) ops per grid step whose op overhead, not arithmetic, dominated
    the kernel (46% of wall at ~12x the elem-op estimate). Here:

      * positions: out[j] of block q reads in-block offset
        k = S_q + V[j] + carry, frac = F_q + JF[j] - carry, with
        S_q = start_int_q - used_q + OFF and F_q = start_frac_q exact
        per-block f64-split scalars (same arithmetic as _positions, so
        the result matches the gather reference to position ulp), and
        V/JF static per-chunk vectors — zero HBM-length index tensors.
      * per-row chunk alignment: the chunk base (min of the monotone k at
        a static end lane) is applied with 8 STATIC full-width bit-rolls
        (base < 256: roll by 2^b where bit b of base is set) + masked
        selects — full-(R, Wx) VPU ops instead of 128 serialized tiny
        rolls.
      * the residual k2 in [0, K2) runs the short static select loop.
    """
    from jax.experimental.pallas import tpu as pltpu

    sp = spans_ref[:]  # (R, Sp)
    S = si_ref[:]  # (R, 1) int32: start_int - used + OFF
    F = sf_ref[:]  # (R, 1) f32: start_frac
    R = sp.shape[0]
    CH = _V2_CHUNK
    nch = out_ref.shape[1] // CH
    for t in range(nch):
        At = sp[:, c * CH * t : c * CH * t + Wx]
        jf = jf_ref[t : t + 1, :]  # (1, CH)
        vt = v_ref[t : t + 1, :]  # (1, CH) int32
        loc = F + jf  # in [0, 2)
        li = jnp.floor(loc)
        fr = loc - li
        k = S + vt + li.astype(jnp.int32)  # (R, CH)
        # k is monotone over the chunk (position steps of c or c+-1), so
        # the minimum sits at one end; min of both ends covers either
        # drift direction.
        base = jnp.clip(
            jnp.minimum(k[:, :1], k[:, CH - 1 :]), 0, Kp - 1
        )
        k2 = jnp.clip(k - base, 0, K2 - 1)
        bit = 1
        while bit < Kp:
            rolled = pltpu.roll(At, Wx - bit, 1)
            At = jnp.where((base & bit) != 0, rolled, At)
            bit <<= 1
        # After base alignment only c*(CH-1) + K2 + 1 lanes remain live;
        # slicing halves every roll in the residual loop (Wx ~ 512 covers
        # the pre-alignment base range, W2 = 256 covers the residual).
        W2 = min(Wx, -(-(c * (CH - 1) + K2 + 2) // 128) * 128)
        At = At[:, :W2]
        acc_lo = jnp.zeros((R, CH), jnp.float32)
        acc_hi = jnp.zeros((R, CH), jnp.float32)
        for kk in range(K2 + 1):
            rolledk = pltpu.roll(At, W2 - kk, 1) if kk else At
            cur = rolledk[:, :CH] if c else rolledk[:, :1]
            if kk < K2:
                acc_lo = jnp.where(k2 == kk, cur, acc_lo)
            if kk > 0:
                acc_hi = jnp.where(k2 == kk - 1, cur, acc_hi)
        out_ref[:, t * CH : (t + 1) * CH] = acc_lo * (1.0 - fr) + acc_hi * fr


def _select_body_v2(
    spans_ref, bases_ref, k_ref, fr_ref, out_ref, *, K: int, c: int
):
    """Two-level select: dynamic per-chunk alignment + short static loop.

    out[r] = lerp(span[c*r + k_r], fr_r) with k_r monotone (steps in
    {0, +-1}). Level 1: each 128-lane chunk t of each block row q is
    aligned by ONE dynamic lane roll of the span row (shift = c*128*t +
    base_qt, base from SMEM — pltpu.roll takes traced shifts). Level 2:
    the chunk-local residual k' = k - base spans only the within-chunk
    carry drift (K ~ ceil(128*|step-c|) + slack), so the static
    roll+select loop is ~4x shorter than the single-level r04 kernel
    whose K also carried the full-block drift plus the superblock
    construction drift (which is constant per row and cancels in k').

    k_ref / fr_ref / out_ref are pre-reshaped to (R*nchunks, 128) rows so
    no in-kernel sublane/lane reshape is needed.
    """
    from jax.experimental.pallas import tpu as pltpu

    sp = spans_ref[:]  # (R, Sp)
    R, Sp = sp.shape
    B = _SEL_BLOCK
    nch = B // _V2_CHUNK
    # Aligned window: must cover c*(chunk-1) + K + 1 (the hi lerp tap).
    W = min(Sp, -(-(c * (_V2_CHUNK - 1) + K + 2) // 128) * 128)
    chunks = []
    for q in range(R):
        row = sp[q : q + 1, :]
        for t in range(nch):
            shift = c * (_V2_CHUNK * t) + bases_ref[q, t]
            amt = jax.lax.rem(Sp - shift, Sp)
            rolled = pltpu.roll(row, amt, 1)  # lane j = row[j+shift]
            chunks.append(rolled[:, :W])
    aligned = jnp.concatenate(chunks, axis=0)  # (R*nch, W)

    k = k_ref[:]  # (R*nch, 128) chunk-local residual, in [0, K)
    fr = fr_ref[:]
    acc_lo = jnp.zeros_like(fr)
    acc_hi = jnp.zeros_like(fr)
    for kk in range(K + 1):
        rolled = pltpu.roll(aligned, W - kk, 1) if kk else aligned
        cur = rolled[:, :1] if c == 0 else rolled[:, :_V2_CHUNK]
        if kk < K:
            acc_lo = jnp.where(k == kk, cur, acc_lo)
        if kk > 0:
            acc_hi = jnp.where(k == kk - 1, cur, acc_hi)
    out_ref[:] = acc_lo * (1.0 - fr) + acc_hi * fr


def _select_body(spans_ref, k_ref, fr_ref, out_ref, *, K: int, c: int):
    """K-way masked select in VMEM: out[r] = lerp(span[c*r + k_r], fr_r).

    One lane-roll per k value (the hi neighbor at k reuses the lo roll at
    k+1), with (k == value) one-hot selects — no gather, no strided
    slices; c is 0 or 1 (pitch steps are in (0.5, 2)).
    """
    from jax.experimental.pallas import tpu as pltpu

    sp = spans_ref[:]  # (R, Sp)
    k = k_ref[:]  # (R, B) int32
    fr = fr_ref[:]
    B = k.shape[1]
    Sp = sp.shape[1]
    acc_lo = jnp.zeros_like(fr)
    acc_hi = jnp.zeros_like(fr)
    for kk in range(K + 1):
        rolled = pltpu.roll(sp, Sp - kk, 1) if kk else sp
        # c == 0: column kk broadcasts over B; c == 1: shifted window.
        cur = rolled[:, :1] if c == 0 else rolled[:, :B]
        if kk < K:
            acc_lo = jnp.where(k == kk, cur, acc_lo)
        if kk > 0:
            acc_hi = jnp.where(k == kk - 1, cur, acc_hi)
    out_ref[:] = acc_lo * (1.0 - fr) + acc_hi * fr


def _select_kernel_call(
    spans, k, fr, K: int, c: int, step: float = 1.0, valid=None
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .pallas.stft import _interpret, _out_struct

    nb, S = spans.shape
    B = k.shape[1]
    impl = _SEL_IMPL
    if impl == "roll2" and B % _V2_CHUNK != 0:
        impl = "roll"
    mm = impl == "matmul"
    R = _SEL_MM_ROWS if mm else _SEL_ROWS
    nbp = -(-nb // R) * R
    Sp = -(-(S) // 128) * 128
    spans_p = jnp.pad(spans, ((0, nbp - nb), (0, Sp - S)))
    k_p = jnp.pad(k, ((0, nbp - nb), (0, 0)))
    fr_p = jnp.pad(fr, ((0, nbp - nb), (0, 0)))
    if impl == "roll2":
        # Chunk-local residual: bases = per-128-lane-chunk minima (the
        # superblock drift is constant per row, the block carry drift per
        # chunk is ~128*|step-c| — both removed by the dynamic alignment).
        nch = B // _V2_CHUNK
        k3 = k_p.reshape(nbp, nch, _V2_CHUNK)
        if valid is not None:
            v3 = jnp.pad(valid, ((0, nbp - nb), (0, 0))).reshape(
                nbp, nch, _V2_CHUNK
            )
            k_for_base = jnp.where(v3, k3, 1 << 20)
        else:
            k_for_base = k3
        bases = jnp.min(k_for_base, axis=2).astype(jnp.int32)  # (nbp, nch)
        bases = jnp.minimum(bases, K - 1)  # all-invalid chunks: any in-range
        K2 = int(np.ceil(_V2_CHUNK * abs(step - c))) + 4
        k2 = jnp.clip(k3 - bases[:, :, None], 0, K2 - 1).reshape(
            nbp * nch, _V2_CHUNK
        )
        fr2 = fr_p.reshape(nbp * nch, _V2_CHUNK)
        Rc = R * nch
        out = pl.pallas_call(
            functools.partial(_select_body_v2, K=K2, c=c),
            grid=(nbp // R,),
            in_specs=[
                pl.BlockSpec((R, Sp), lambda i: (i, 0)),
                pl.BlockSpec(
                    (R, nch), lambda i: (i, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec((Rc, _V2_CHUNK), lambda i: (i, 0)),
                pl.BlockSpec((Rc, _V2_CHUNK), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((Rc, _V2_CHUNK), lambda i: (i, 0)),
            out_shape=_out_struct((nbp * nch, _V2_CHUNK), jnp.float32, spans),
            interpret=_interpret(),
        )(spans_p, bases, k2, fr2)
        return out.reshape(nbp, B)[:nb]
    if mm:
        body = functools.partial(_select_mm_body, c=c)
    else:
        body = functools.partial(_select_body, K=K, c=c)
    out = pl.pallas_call(
        body,
        grid=(nbp // R,),
        in_specs=[
            pl.BlockSpec((R, Sp), lambda i: (i, 0)),
            pl.BlockSpec((R, B), lambda i: (i, 0)),
            pl.BlockSpec((R, B), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((R, B), lambda i: (i, 0)),
        out_shape=_out_struct((nbp, B), jnp.float32, spans),
        interpret=_interpret(),
    )(spans_p, k_p, fr_p)
    return out[:nb]
