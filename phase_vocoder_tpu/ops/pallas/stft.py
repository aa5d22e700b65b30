"""Fused Pallas TPU kernels for the phase-vocoder hot path.

Reference components C5-C7 and C9-C11 (SURVEY.md SS2.1) are CUDA kernels
separated by HBM round trips (frame+window kernel, cuFFT, cart2polar, ...,
polar2cart, cuFFT, atomicAdd OLA). The XLA path already fuses the
elementwise stages into the DFT matmuls; these kernels go further and fuse
the *memory-layout* stages too, so the big intermediates never touch HBM:

  * `stft_fused` — framing + Hann window + DFT (two MXU matmuls) in ONE
    kernel. The (nf, n_fft) frames tensor (4x the input bytes at 4x
    overlap) exists only as a VMEM tile; HBM sees the raw samples once in
    and (re, im) once out. Cart->polar stays in XLA (Mosaic lacks an atan2
    lowering; the bytes moved are identical either way).

  * `istft_ola` — polar->cart + inverse DFT (two MXU matmuls) + synthesis
    window + deterministic fold overlap-add in ONE kernel. The (nf, n_fft)
    output-frames tensor stays in VMEM; the cross-tile OLA overlap is
    carried in scratch across the (sequential) TPU grid — the idiomatic
    replacement for the reference's atomicAdd (C11): same math, bitwise
    deterministic, no contention.

Layout notes (see /opt/skills/guides/pallas_guide.md):
  * The bin axis (n_fft//2+1 = 513 for N=1024) is padded to a multiple of
    128 lanes inside these wrappers; callers see logical n_bins.
  * Frames are built from an (R, hop) "rows" view of the padded signal with
    static row slices (hop | n_fft required) — no gathers, no in-kernel
    reshape of the 1-D buffer.
  * Grid iterations on TPU execute sequentially on the core, which is what
    makes the OLA tail carry in VMEM scratch correct.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..window import hann_window

# Matmul precision for the in-kernel DFT products. HIGHEST = full f32
# emulation on the MXU; the 1e-4 waveform gate leaves no room for bf16
# single-pass (see ops/fft.py).
_PRECISION = jax.lax.Precision.HIGHEST

# Frames per grid step. 128 keeps (tile x n_fft) + (tile x bins) + DFT
# matrices comfortably inside VMEM (~8 MB at N=1024).
_TILE_F = 128

_LANES = 128


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests, virtual meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


def _pad_bins(n_bins: int) -> int:
    return -(-n_bins // _LANES) * _LANES


def _out_struct(shape, dtype, *operands):
    """ShapeDtypeStruct whose `vma` is the union of the operands' vma.

    Inside shard_map (check_vma=True) pallas_call outputs must declare
    which mesh axes they vary over; outside shard_map vma stays unset.
    """
    vma = set()
    for op in operands:
        v = getattr(jax.typeof(op), "vma", None)
        if v:
            vma |= set(v)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


@functools.lru_cache(maxsize=16)
def _dft_mats_padded(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Hann-windowed forward DFT matrices, bins padded to lane multiple."""
    n_bins = n_fft // 2 + 1
    nbp = _pad_bins(n_bins)
    k = np.arange(n_bins, dtype=np.float64)
    t = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(t, k) / n_fft
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * t / n_fft)
    fc = np.zeros((n_fft, nbp), np.float32)
    fs = np.zeros((n_fft, nbp), np.float32)
    fc[:, :n_bins] = (np.cos(ang) * w[:, None]).astype(np.float32)
    fs[:, :n_bins] = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return fc, fs


@functools.lru_cache(maxsize=16)
def _idft_mats_padded(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Hann-windowed inverse DFT matrices, padded bins rows are zero."""
    n_bins = n_fft // 2 + 1
    nbp = _pad_bins(n_bins)
    k = np.arange(n_bins, dtype=np.float64)
    t = np.arange(n_fft, dtype=np.float64)
    wk = np.full(n_bins, 2.0)
    wk[0] = 1.0
    if n_fft % 2 == 0:
        wk[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(k, t) / n_fft
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * t / n_fft)
    ic = np.zeros((nbp, n_fft), np.float32)
    is_ = np.zeros((nbp, n_fft), np.float32)
    ic[:n_bins] = ((wk[:, None] / n_fft) * np.cos(ang) * w[None, :]).astype(np.float32)
    is_[:n_bins] = (-(wk[:, None] / n_fft) * np.sin(ang) * w[None, :]).astype(np.float32)
    return ic, is_


def _stft_kernel(rows_a, rows_b, fc_ref, fs_ref, re_ref, im_ref, *, overlap: int):
    """One frame tile: build frames from rows, windowed DFT.

    Frame j of the tile = rows[j .. j+overlap) of the two-tile rows block,
    concatenated along lanes; pltpu.roll keeps every slice aligned (Mosaic
    rejects dynamic sublane offsets that aren't provably multiples of 8).

    Outputs (re, im) rather than (mag, phi): Mosaic has no atan2 lowering,
    and polar conversion costs the same HBM bytes either way — XLA fuses it
    into the consumer.
    """
    tile = re_ref.shape[0]
    block = jnp.concatenate([rows_a[:], rows_b[:]], axis=0)  # (2*tile, hop)
    nb2 = 2 * tile
    parts = [
        (pltpu.roll(block, nb2 - s, 0) if s else block)[:tile]
        for s in range(overlap)
    ]
    frames = jnp.concatenate(parts, axis=-1)  # (tile, n_fft)
    re_ref[:] = jnp.dot(frames, fc_ref[:], preferred_element_type=jnp.float32,
                        precision=_PRECISION)
    im_ref[:] = jnp.dot(frames, fs_ref[:], preferred_element_type=jnp.float32,
                        precision=_PRECISION)


def stft_polar(
    x: jnp.ndarray, n_fft: int, hop: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused windowed-STFT -> (mag, phi), each (nf, n_bins), from 1-D x.

    Framing + window + DFT run in one Pallas kernel; the polar conversion
    is XLA (fused into consumers). Requires hop | n_fft. Equals analyze()
    on the matmul backend to f32 round-off (tests/test_pallas.py).
    """
    re, im = stft_fused(x, n_fft, hop)
    return jnp.sqrt(re * re + im * im), jnp.arctan2(im, re)


def stft_fused(
    x: jnp.ndarray, n_fft: int, hop: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused framing + Hann window + DFT -> (re, im), each (nf, n_bins)."""
    if n_fft % hop != 0:
        raise ValueError("pallas stft requires hop | n_fft")
    from ..framing import num_frames

    nf = num_frames(x.shape[-1], n_fft, hop)
    if nf <= 0:
        n_bins = n_fft // 2 + 1
        return (jnp.zeros((0, n_bins), x.dtype),) * 2
    overlap = n_fft // hop
    n_bins = n_fft // 2 + 1
    nbp = _pad_bins(n_bins)
    tile = _TILE_F
    nf_pad = -(-nf // tile) * tile
    grid = nf_pad // tile

    # rows view: row r = x[r*hop : (r+1)*hop]; frame i = rows[i : i+overlap];
    # one extra tile of rows so the i+1 block of the last step is in range.
    n_rows = (grid + 1) * tile
    span = n_rows * hop
    if x.shape[-1] >= span:
        x_pad = x[:span]
    else:
        x_pad = jnp.pad(x, (0, span - x.shape[-1]))
    rows = x_pad.reshape(n_rows, hop)
    fc, fs = _dft_mats_padded(n_fft)

    re, im = pl.pallas_call(
        functools.partial(_stft_kernel, overlap=overlap),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, hop), lambda i: (i, 0)),
            pl.BlockSpec((tile, hop), lambda i: (i + 1, 0)),
            pl.BlockSpec((n_fft, nbp), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, nbp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
        ],
        out_shape=[
            _out_struct((nf_pad, nbp), jnp.float32, x),
            _out_struct((nf_pad, nbp), jnp.float32, x),
        ],
        interpret=_interpret(),
    )(rows, rows, jnp.asarray(fc), jnp.asarray(fs))
    return re[:nf, :n_bins], im[:nf, :n_bins]


def _istft_kernel(
    mag_ref, psi_ref, mask_ref, ic_ref, is_ref, out_ref, tail_ref,
    *, m: int
):
    """One frame tile: polar->cart, inverse DFT, windowed fold-OLA.

    m = n_fft // rs (overlap factor at the synthesis hop). `tail_ref` is a
    (m-1, rs) VMEM scratch carrying the OLA spill into the next grid step —
    correct because the TPU grid runs sequentially.
    """
    i = pl.program_id(0)
    tile = mag_ref.shape[0]
    rs = out_ref.shape[1]

    @pl.when(i == 0)
    def _():
        tail_ref[:] = jnp.zeros_like(tail_ref)

    mag = mag_ref[:] * mask_ref[:]
    psi = psi_ref[:]
    y_re = mag * jnp.cos(psi)
    y_im = mag * jnp.sin(psi)
    frames = jnp.dot(y_re, ic_ref[:], preferred_element_type=jnp.float32,
                     precision=_PRECISION)
    frames = frames + jnp.dot(y_im, is_ref[:], preferred_element_type=jnp.float32,
                              precision=_PRECISION)
    # Fold OLA: segment s of frame j lands in output row j+s (row = rs
    # samples). Built with shifted concats + adds — Mosaic has no
    # scatter-add lowering, and these are pure static-layout ops.
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
    out_ref[:] = buf[:tile]


@functools.lru_cache(maxsize=16)
def _idft_mats_split(n_fft: int):
    """Host bitmask hi/lo bf16 split of the windowed inverse DFT matrices.

    The inverse is amplitude-domain — the 3-pass bf16 split's ~2^-17
    operand error passes every golden gate (measured on the fused path,
    ops/pallas/fused.py) at half the MXU passes of Precision.HIGHEST.
    """
    from .fused import _bitsplit_host

    ic, is_ = _idft_mats_padded(n_fft)
    return _bitsplit_host(ic) + _bitsplit_host(is_)


def _istft_frames_kernel(
    mag_ref, psi_ref, mask_ref, ich, icl, ish, isl, out_ref
):
    """One frame tile: polar->cart (VPU cos/sin) + 3-pass bf16 inverse
    windowed DFT -> windowed output frames (no OLA — the caller overlap-adds
    with the general-hop fold, so ANY synthesis hop is supported)."""
    from .fused import _dot_bf16

    mag = mag_ref[:] * mask_ref[:]
    psi = psi_ref[:]
    y_re = mag * jnp.cos(psi)
    y_im = mag * jnp.sin(psi)
    frames = _dot_bf16(y_re, ich[:], icl[:], 3)
    out_ref[:] = frames + _dot_bf16(y_im, ish[:], isl[:], 3)


def _istft_frames_cart_kernel(
    yre_ref, yim_ref, mask_ref, ich, icl, ish, isl, out_ref
):
    """One frame tile: 3-pass bf16 inverse windowed DFT from cartesian
    (y_re, y_im) -> windowed output frames (no OLA; general-hop caller)."""
    from .fused import _dot_bf16

    y_re = yre_ref[:] * mask_ref[:]
    y_im = yim_ref[:] * mask_ref[:]
    frames = _dot_bf16(y_re, ich[:], icl[:], 3)
    out_ref[:] = frames + _dot_bf16(y_im, ish[:], isl[:], 3)


def istft_frames_cart(
    y_re: jnp.ndarray,
    y_im: jnp.ndarray,
    n_fft: int,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused cartesian spectra -> windowed output frames (nf, n_fft).

    The cart twin of istft_frames: serves the semi-fused phasor path for
    general synthesis hops (rs does not divide n_fft, e.g. stretch 1.5 /
    non-octave pitch), where Y = mag * P arrives as (re, im) directly from
    the phasor-term kernels — no polar round trip, no cos/sin at all.
    """
    nf, n_bins = y_re.shape
    if nf == 0:
        return jnp.zeros((0, n_fft), y_re.dtype)
    nbp = _pad_bins(n_bins)
    tile = _TILE_F
    nf_pad = -(-nf // tile) * tile
    grid = nf_pad // tile

    if frame_mask is None:
        mask = (jnp.arange(nf_pad) < nf).astype(y_re.dtype)
    else:
        mask = jnp.zeros((nf_pad,), y_re.dtype).at[:nf].set(
            frame_mask.astype(y_re.dtype)
        )
    pad_spec = [(0, nf_pad - nf), (0, nbp - n_bins)]
    yre_p = jnp.pad(y_re, pad_spec)
    yim_p = jnp.pad(y_im, pad_spec)
    ich, icl, ish, isl = _idft_mats_split(n_fft)

    frames = pl.pallas_call(
        _istft_frames_cart_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, n_fft), lambda i: (i, 0)),
        out_shape=_out_struct((nf_pad, n_fft), jnp.float32, y_re, y_im),
        interpret=_interpret(),
    )(yre_p, yim_p, mask[:, None], jnp.asarray(ich), jnp.asarray(icl),
      jnp.asarray(ish), jnp.asarray(isl))
    return frames[:nf]


def istft_frames(
    mag: jnp.ndarray,
    psi: jnp.ndarray,
    n_fft: int,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused polar -> windowed output frames (nf, n_fft), ANY synthesis hop.

    The rs | n_fft case uses istft_ola (OLA fused in-kernel); this kernel
    serves the general-hop path (non-octave pitch shifts, e.g. rs=342):
    polar->cart and the inverse DFT fuse in VMEM, and the caller runs the
    scatter-free general fold OLA (ops/framing.py) on the frames. Replaced
    the all-XLA polar synthesis on the non-octave path: the cos/sin +
    matmul chain stays in VMEM and the inverse runs 3-pass bf16 instead of
    HIGHEST (amplitude-domain, gate-validated).
    """
    nf, n_bins = mag.shape
    if nf == 0:
        return jnp.zeros((0, n_fft), mag.dtype)
    nbp = _pad_bins(n_bins)
    tile = _TILE_F
    nf_pad = -(-nf // tile) * tile
    grid = nf_pad // tile

    if frame_mask is None:
        mask = (jnp.arange(nf_pad) < nf).astype(mag.dtype)
    else:
        mask = jnp.zeros((nf_pad,), mag.dtype).at[:nf].set(
            frame_mask.astype(mag.dtype)
        )
    pad_spec = [(0, nf_pad - nf), (0, nbp - n_bins)]
    mag_p = jnp.pad(mag, pad_spec)
    psi_p = jnp.pad(psi, pad_spec)
    ich, icl, ish, isl = _idft_mats_split(n_fft)

    frames = pl.pallas_call(
        _istft_frames_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, n_fft), lambda i: (i, 0)),
        out_shape=_out_struct((nf_pad, n_fft), jnp.float32, mag, psi),
        interpret=_interpret(),
    )(mag_p, psi_p, mask[:, None], jnp.asarray(ich), jnp.asarray(icl),
      jnp.asarray(ish), jnp.asarray(isl))
    return frames[:nf]


def istft_ola(
    mag: jnp.ndarray,
    psi: jnp.ndarray,
    n_fft: int,
    rs: int,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused polar->waveform: Y=mag*e^{i psi} -> irfft -> window -> OLA.

    Returns the un-normalized OLA signal of length (nf-1)*rs + n_fft (divide
    by ola_window_norm as usual). Requires rs | n_fft with overlap >= 2
    (rs == n_fft is the degenerate no-overlap case — use the jnp path).
    """
    if n_fft % rs != 0 or n_fft // rs < 2:
        raise ValueError("pallas istft requires rs | n_fft and n_fft//rs >= 2")
    nf, n_bins = mag.shape
    if nf == 0:
        return jnp.zeros((0,), mag.dtype)
    m = n_fft // rs
    nbp = _pad_bins(n_bins)
    tile = _TILE_F
    # Pad so the OLA spill rows (nf .. nf+m-2) land inside the main output.
    nf_pad = -(-(nf + m - 1) // tile) * tile
    grid = nf_pad // tile

    if frame_mask is None:
        mask = (jnp.arange(nf_pad) < nf).astype(mag.dtype)
    else:
        mask = jnp.zeros((nf_pad,), mag.dtype).at[:nf].set(
            frame_mask.astype(mag.dtype)
        )
    pad_spec = [(0, nf_pad - nf), (0, nbp - n_bins)]
    mag_p = jnp.pad(mag, pad_spec)
    psi_p = jnp.pad(psi, pad_spec)
    ic, is_ = _idft_mats_padded(n_fft)

    main = pl.pallas_call(
        functools.partial(_istft_kernel, m=m),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, nbp), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
            pl.BlockSpec((nbp, n_fft), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, rs), lambda i: (i, 0)),
        out_shape=_out_struct((nf_pad, rs), jnp.float32, mag, psi),
        scratch_shapes=[pltpu.VMEM((m - 1, rs), jnp.float32)],
        interpret=_interpret(),
    )(mag_p, psi_p, mask[:, None], jnp.asarray(ic), jnp.asarray(is_))

    out_len = (nf - 1) * rs + n_fft
    return main.reshape(-1)[:out_len]
