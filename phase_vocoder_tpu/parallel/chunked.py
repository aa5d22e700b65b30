"""Sequence-parallel chunked TSM — the flagship new capability.

The reference cannot split a recording at all: the whole file must fit one
GPU (SURVEY.md SS2.2). Here ONE long recording is sharded over the mesh's
"seq" axis by FRAMES (each device owns a contiguous span of F analysis
frames) and stitched exactly:

  * input halo   — each device ppermutes the first N-Ra samples of its
    sample span to its left neighbor, so every frame is computed exactly
    (no seam); the ring-attention/Ulysses communication pattern applied to
    STFT frames [BASELINE.json:5].
  * phase halo   — the first analysis-phase row ppermutes left so the
    heterodyned increment crossing the chunk boundary is exact.
  * phase carry  — the synthesis-phase prefix sum factorizes: each device
    scans its own (Rs/Ra)*dphi terms as a compensated (hi, lo)-pair
    associative scan (ops/phase.py), the per-chunk pair totals are
    all-gathered (D x 2 x n_bins floats — tiny) and a pair-wrapped
    exclusive prefix over the device axis yields each chunk's carry.
    Addition mod 2*pi is associative and the pairs hold ~2^-48 effective
    precision, so chunked psi == monolithic psi REGARDLESS of recording
    length.
  * OLA tails    — the last N-Rs output samples of each chunk ppermute to
    the right neighbor and add into its head BEFORE normalization, so the
    overlap-add seam is exact. Window-energy normalization is masked to
    valid frames, so padding frames contribute nothing.

Everything is one jitted shard_map program; collectives ride ICI (and DCN
across hosts under jax.distributed — same program, parallel/distributed.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import PvocConfig
from ..ops import fft as fft_ops
from ..ops import framing, phase
from ..ops.window import hann_window
from .. import pipeline
from .mesh import make_mesh

_EPS = 1e-8

# Measurement-only A/B knob (SCALING_r04 / VERDICT r03 #3): when True, every
# collective in the chunk bodies is replaced by a zero-communication local
# fake (ppermute -> identity, all_gather -> local broadcast), so timing the
# same program with the flag flipped isolates collective cost from compute.
# OUTPUT IS WRONG with the flag set; never enable on a product path. Flip
# via ablate_collectives(); callers must jax.clear_caches() after flipping
# (the flag is read at trace time).
_ABLATE_COLLECTIVES = False


def ablate_collectives(enabled: bool) -> None:
    """Measurement-only knob (see _ABLATE_COLLECTIVES). Clears jit caches on
    every flip so stale traces cannot leak across the A/B (ADVICE r04)."""
    global _ABLATE_COLLECTIVES
    if enabled != _ABLATE_COLLECTIVES:
        _ABLATE_COLLECTIVES = enabled
        jax.clear_caches()


def _pp(x, pairs):
    """ppermute over 'seq', or a zero-comm identity fake under ablation."""
    if _ABLATE_COLLECTIVES:
        return x
    return jax.lax.ppermute(x, "seq", pairs)


def _ag(x, axis: str = "seq"):
    """all_gather over `axis`, or a zero-comm local broadcast fake."""
    if _ABLATE_COLLECTIVES:
        d = jax.lax.axis_size(axis)
        return jnp.broadcast_to(x[None], (d,) + x.shape)
    return jax.lax.all_gather(x, axis)


def _closed_form_phasors(ure, uim, d, F: int, rs: int, ra: int, n_fft: int,
                         axis: str = "seq"):
    """P = u_0 (u conj(u_0))^k with u_0 broadcast from device 0 (integer k).

    ure/uim: (..., F_pad, nbp) local unit analysis phasors (leading batch
    dims allowed). Returns (pre, pim) of the same shape. Pinned DC/Nyquist
    lanes get P = u * spin^g (g = global frame index) — the telescoped form
    of the pass-through convention. Rows past the valid frames are garbage
    and must be masked downstream (mag mask, as the scan path already does).
    """
    from ..ops.pallas.fused import _phasor_consts, _pow_k

    u0s = jnp.stack([ure[..., 0, :], uim[..., 0, :]], axis=-2)  # (...,2,nbp)
    u0g = _ag(u0s, axis)[0]  # device 0's anchor (...,2,nbp)
    u0re = jnp.expand_dims(u0g[..., 0, :], -2)  # (..., 1, nbp)
    u0im = jnp.expand_dims(u0g[..., 1, :], -2)
    zre = ure * u0re + uim * u0im  # u * conj(u0)
    zim = uim * u0re - ure * u0im
    wre, wim = _pow_k(zre, zim, rs, ra)
    pre = wre * u0re - wim * u0im  # * u0
    pim = wre * u0im + wim * u0re
    # Forced-real pinned lanes: P = u * spin^g  (spin = -1 only at the
    # Nyquist lane when Rs is odd, else +1 everywhere).
    consts = _phasor_consts(n_fft, ra, rs)
    pin = jnp.asarray(consts[4])  # (1, nbp)
    spin = jnp.asarray(consts[5])
    g = d * F + jnp.arange(ure.shape[-2])  # (F_pad,) global frame index
    spin_g = jnp.where(
        spin < 0, jnp.where((g % 2 == 1)[:, None], -1.0, 1.0), 1.0
    )  # (F_pad, nbp)
    pre = jnp.where(pin > 0, ure * spin_g, pre)
    pim = jnp.where(pin > 0, uim * spin_g, pim)
    return pre, pim


def _chunked_body_fused(x_sh, x_tail, nf, cfg: PvocConfig, rs: int, F: int, D: int):
    """Fused phasor-form chunk program (runs inside shard_map over 'seq').

    Same communication pattern as _chunked_body — input halo, boundary
    phase exchange, collective phase carry, OLA tail exchange — but the
    phase state rides as UNIT PHASORS (the e^{i psi} group) instead of
    wrapped angles, and analysis/synthesis use the fused Pallas kernels:

      * boundary:   each device ppermutes its LAST analysis phasor right;
                    the receiver rebuilds its first step term exactly.
      * carry:      per-device phasor totals are all_gathered (D x 2 x nbp
                    floats) and combined with an exclusive renormalized
                    prefix PRODUCT over the device axis — the U(1) image of
                    the wrapped-angle prefix sum, identical math.
    """
    from ..ops.pallas.fused import (
        boundary_step_term,
        phasor_istft_ola,
        phasor_prefix_exclusive,
        phasor_scan,
        stft_phasor_terms,
    )

    n, ra = cfg.n_fft, cfg.hop
    d = jax.lax.axis_index("seq")
    left = [(i, i - 1) for i in range(1, D)]
    right = [(i, i + 1) for i in range(D - 1)]

    # --- input halo (identical to the polar body)
    halo = _pp(x_sh[: n - ra], left)
    halo = jnp.where(d == D - 1, x_tail, halo)
    mag, tre, tim, ure, uim, _ = stft_phasor_terms(
        jnp.concatenate([x_sh, halo]), n, ra, rs, scan=False, return_u=True
    )  # lane-padded (F_pad, nbp); F local frames

    if rs % ra == 0:
        # CLOSED FORM (integer k, round 3): the phasor prefix product
        # telescopes — P_i = u_0 (u_i conj(u_0))^k globally, so the whole
        # carry machinery (boundary phasor exchange, local scan, totals
        # all_gather, exclusive prefix product) reduces to ONE broadcast of
        # the global anchor phasor u_0 (device 0's first row). Pinned
        # DC/Nyquist lanes keep P_i = u_i spin^i (same telescoping).
        # Validated vs the f64 golden at 1e-10 (ops/pallas/fused.py).
        pre, pim = _closed_form_phasors(ure, uim, d, F, rs, ra, n)
    else:
        # --- boundary: previous chunk's last analysis phasor -> my first
        # term (k = 1/2 does not telescope across branch cuts).
        u_last = jnp.stack([ure[F - 1], uim[F - 1]])  # (2, nbp)
        u_prev = _pp(u_last, right)  # zeros at d=0
        bre, bim = boundary_step_term(
            ure[0], uim[0], u_prev[0], u_prev[1], n, ra, rs
        )
        # Device 0 keeps the anchor term (t[0] = u_0); others use the
        # boundary step. Padding terms past the last VALID frame must be
        # identity so the phasor totals stay exact.
        j = jnp.arange(tre.shape[0])  # local row (F frames + lane padding)
        first = (j == 0)[:, None]
        use_boundary = jnp.logical_and(first, d > 0)
        tre = jnp.where(use_boundary, bre[None, :], tre)
        tim = jnp.where(use_boundary, bim[None, :], tim)
        # Identity terms for every non-contributing row: local padding rows
        # (j >= F — the kernel builds them from halo samples, so they are
        # NOT zero) and globally-past-the-end rows (d*F + j >= nf).
        valid = ((j < F) & (d * F + j < nf))[:, None]
        tre = jnp.where(valid, tre, 1.0)
        tim = jnp.where(valid, tim, 0.0)

        # --- local scan + cross-device exclusive prefix product (carry).
        pre_l, pim_l = phasor_scan(tre, tim)
        totals = _ag(jnp.stack([pre_l[-1], pim_l[-1]]))  # (D, 2, nbp)
        cre_all, cim_all = phasor_prefix_exclusive(totals[:, 0], totals[:, 1])
        cre = jnp.take(cre_all, d, axis=0)
        cim = jnp.take(cim_all, d, axis=0)
        pre = pre_l * cre[None, :] - pim_l * cim[None, :]
        pim = pre_l * cim[None, :] + pim_l * cre[None, :]
        inv = jax.lax.rsqrt(jnp.maximum(pre * pre + pim * pim, 1e-30))
        pre, pim = pre * inv, pim * inv

    # --- fused synthesis (un-normalized: masked path), then the same OLA
    # tail exchange as the polar body.
    mask = (d * F + jnp.arange(F) < nf).astype(mag.dtype)
    ola = phasor_istft_ola(mag, pre, pim, n, rs, F, frame_mask=mask)
    w = hann_window(n, dtype=mag.dtype)
    norm = framing.ola_window_norm(
        w, F, rs, eps=0.0, method="fold", frame_mask=mask
    )

    tail_len = n - rs
    recv_y = _pp(ola[F * rs :], right)
    recv_n = _pp(norm[F * rs :], right)
    pad = (0, F * rs - tail_len)
    main = ola[: F * rs] + jnp.pad(recv_y, pad)
    main_norm = norm[: F * rs] + jnp.pad(recv_n, pad)
    main_out = main / jnp.maximum(main_norm, _EPS)
    tail_out = ola[F * rs :] / jnp.maximum(norm[F * rs :], _EPS)
    return main_out, tail_out[None, :]


def _chunked_body_fused1(
    x_sh, x_tail, nf, cfg: PvocConfig, rs: int, F: int, D: int,
    tile: int,
):
    """SINGLE-KERNEL fused chunk body (round 5, VERDICT r04 #1): the whole
    monolithic phase-vocoder kernel (_pvoc_kernel via fused_stream_segment)
    runs INSIDE each shard_map shard, instead of the split kernels + XLA
    glue of _chunked_body_fused — the r04 split body kept only ~1/3 of
    monolithic per-chip throughput (SCALING_CHIP_r04.json), which made the
    multi-chip scaling denominator dishonest.

    Applies to INTEGER hop ratios k = Rs/Ra (the headline 2.0x point, and
    every stretch whose phase propagation telescopes to the closed form
    P_i = u_0 (u_i conj(u_0))^k): the per-device kernel then needs NO
    serial cross-device phase state at all — only the global anchor phasor
    u_0, one tiny all_gather. Communication per device: the input halo
    ppermute (N - Ra samples), the anchor all_gather (2 x nbq floats), and
    the OLA tail ppermute ((m-1) x rs floats). Non-integer k keeps the
    split body (its in-kernel scan cannot accept a cross-device prefix
    carry after the fact).

    Normalization: every device runs with the INTERIOR table (the stream
    kernel's continuing-segment mode), so main rows and exchanged tail
    rows share the same per-lane scale and add linearly; device 0 then
    applies the head-row correction, and the global tail fix happens in
    the caller exactly as in the monolithic assembly (the caller sizes
    F so the nf..nf+m-2 spill rows land inside the last device's span).
    """
    from ..ops.pallas.fused import (
        _PRECISION,
        _packed_mats,
        _pad_bins,
        fused_stream_segment,
        stream_norm_tables,
    )

    n, ra = cfg.n_fft, cfg.hop
    m = n // rs
    nbq = _pad_bins(n // 2)
    d = jax.lax.axis_index("seq")
    left = [(i, i - 1) for i in range(1, D)]
    right = [(i, i + 1) for i in range(D - 1)]

    # --- input halo (same pattern as the split bodies)
    halo = _pp(x_sh[: n - ra], left)
    halo = jnp.where(d == D - 1, x_tail, halo)

    # --- global anchor phasor u_0: frame 0 through the packed windowed
    # DFT (full-precision XLA matmul — one (1, N) row, negligible), then
    # device 0's broadcast. All devices use the broadcast anchor (the
    # stream kernel runs with started=1), so the closed form is globally
    # consistent; it matches the in-kernel fold DFT to f32 round-off,
    # which perturbs P by ~(1+k) ulp — far under the gate.
    fcq, fsq, _, _ = _packed_mats(n)
    fr0 = x_sh[None, :n]
    re0 = jnp.dot(fr0, jnp.asarray(fcq), precision=_PRECISION)
    im0 = jnp.dot(fr0, jnp.asarray(fsq), precision=_PRECISION)
    n2 = re0 * re0 + im0 * im0
    inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
    safe = n2 > 1e-30
    u0_local = jnp.concatenate(
        [jnp.where(safe, re0 * inv, 1.0), jnp.where(safe, im0 * inv, 0.0)]
    )  # (2, nbq)
    u0 = _ag(u0_local)[0]  # device 0's anchor
    carry = jnp.zeros((4, nbq), jnp.float32).at[:2].set(u0).at[2].set(1.0)

    # --- the whole pipeline, one kernel per shard
    pad = tile * ra - (n - ra)
    rows = jnp.concatenate(
        [x_sh, halo, jnp.zeros((pad,), x_sh.dtype)]
    ).reshape(F + tile, ra)
    fmask = ((d * F + jnp.arange(F)) < nf).astype(jnp.float32)[:, None]
    first_tbl, cont_tbl = stream_norm_tables(n, rs)
    out, _carry_out, tail_out = fused_stream_segment(
        rows,
        carry,
        jnp.zeros((m - 1, rs), jnp.float32),
        jnp.ones((), jnp.int32),  # started: anchor comes preloaded
        (d * F).astype(jnp.int32),  # global frame offset (Nyquist parity)
        fmask,
        jnp.asarray(cont_tbl),
        n,
        ra,
        rs,
        tile=tile,
    )

    # --- OLA tail exchange: my spill adds into my right neighbor's head
    # (both interior-normalized — same per-lane scale, linear add).
    recv = _pp(tail_out, right)  # zeros at d = 0
    head = out[: m - 1] + recv
    corr = jnp.asarray(first_tbl[: m - 1] / cont_tbl[: m - 1])
    head = jnp.where(d == 0, head * corr, head)
    return jnp.concatenate([head, out[m - 1 :]], axis=0)  # (F, rs)


def _fused1_ok(cfg: PvocConfig, rs: int) -> bool:
    """Single-kernel chunk body: integer k with the exact-fold layout."""
    return _fused_chunk_ok(cfg, rs) and rs % cfg.hop == 0


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _chunked_fused1_jit(x_main, x_tail, nf, cfg, rs, F, mesh):
    D = mesh.shape["seq"]
    from ..ops.pallas.fused import _pick_tile

    tile = min(_pick_tile(cfg.n_fft, rs, F), F)
    body = functools.partial(
        _chunked_body_fused1, nf=nf, cfg=cfg, rs=rs, F=F, D=D, tile=tile
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("seq"), P()),
        out_specs=P("seq"),
        check_vma=False,
    )
    return fn(x_main, x_tail)


def _chunked_body(x_sh, x_tail, nf, cfg: PvocConfig, rs: int, F: int, D: int):
    """Per-device chunk program (runs inside shard_map over axis 'seq').

    x_sh: (F*Ra,) this device's sample span; x_tail: (N-Ra,) replicated
    global tail beyond the sharded span (used by the last device as halo).
    Returns (main (F*rs,), tail (1, N-rs)) — tail rows materialize as a
    (D, N-rs) array of which only the last row is meaningful.
    """
    n, ra = cfg.n_fft, cfg.hop
    d = jax.lax.axis_index("seq")
    left = [(i, i - 1) for i in range(1, D)]
    right = [(i, i + 1) for i in range(D - 1)]

    # --- input halo: receive next chunk's head (zeros at d=D-1 -> x_tail).
    halo = _pp(x_sh[: n - ra], left)
    halo = jnp.where(d == D - 1, x_tail, halo)
    # Backend dispatch (xla / matmul / fused pallas) lives in the pipeline.
    mag, phi = pipeline.analyze(jnp.concatenate([x_sh, halo]), cfg)  # (F, nb)

    # --- phase halo: neighbor's first phi row for the boundary increment.
    phi_next = _pp(phi[0:1], left)  # zeros at d=D-1
    phi_ext = jnp.concatenate([phi, phi_next])  # (F+1, n_bins)

    # --- phase carry: local compensated scan + cross-device exclusive
    # prefix, all in (hi, lo)-pair arithmetic (ops/phase.py) — plain f32
    # wrap_add drifts linearly with length (2.84e-4 vs golden at 60 s /
    # 2.0x, over the 1e-4 gate) because period-locked rounding biases
    # integrate; the pair scan holds ~2^-48 at any length. The per-device
    # totals all_gather carries BOTH halves (D x 2 x n_bins — still tiny).
    th, tl = phase.residual_terms_c(phi_ext, ra, rs, n)  # (F, nb) pairs
    # Zero increments that cross past the last valid frame (padding).
    g = d * F + jnp.arange(F)  # global frame indices owned here
    vm = (g < nf - 1)[:, None].astype(th.dtype)
    th, tl = th * vm, tl * vm
    incl_h, incl_l = phase.blocked_scan(phase.wrap_add_c, (th, tl))
    local_excl = tuple(
        jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]])
        for a in (incl_h, incl_l)
    )
    totals = _ag(jnp.stack([incl_h[-1], incl_l[-1]]))  # (D, 2, n_bins)
    pref_h, pref_l = phase.blocked_scan(
        phase.wrap_add_c, (totals[:, 0], totals[:, 1])
    )
    carry = tuple(
        jnp.take(jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]]), d, axis=0)[
            None, :
        ]
        for a in (pref_h, pref_l)
    )
    res_h, res_l = phase.wrap_add_c(carry, local_excl)  # (F, n_bins) pair
    residual = res_h + res_l

    # --- global phi[0] (device 0's first row) for the absolute phase.
    phi0 = _ag(phi[0])[0]  # (n_bins,)
    psi = phase.finalize_phase(phi0, residual, rs, n, frame_offset=d * F)
    psi = phase.pin_real_bins(psi, phi, rs, n, frame_offset=d * F)

    mask = (g < nf).astype(mag.dtype)  # valid-frame mask
    if pipeline.pallas_synthesis_ok(cfg, rs):
        from ..ops.pallas import istft_ola

        ola = istft_ola(mag, psi, n, rs, frame_mask=mask)  # (F*rs+n-rs,)
    else:
        y_re = mag * jnp.cos(psi)
        y_im = mag * jnp.sin(psi)
        if cfg.fft_backend == "xla":
            w = hann_window(n, dtype=y_re.dtype)
            y_frames = fft_ops.irfft(y_re, y_im, n, backend="xla") * w
        else:
            y_frames = fft_ops.irfft(
                y_re, y_im, n, backend="matmul", fused_window=True
            )
        y_frames = y_frames * mask[:, None]
        ola = framing.overlap_add(y_frames, rs, method=cfg.ola_method)
    w = hann_window(n, dtype=mag.dtype)
    norm = framing.ola_window_norm(
        w, F, rs, eps=0.0, method=cfg.ola_method, frame_mask=mask
    )

    # --- OLA tail exchange: my tail adds into my right neighbor's head.
    tail_len = n - rs
    recv_y = _pp(ola[F * rs :], right)  # zeros at d=0
    recv_n = _pp(norm[F * rs :], right)
    pad = (0, F * rs - tail_len)
    main = ola[: F * rs] + jnp.pad(recv_y, pad)
    main_norm = norm[: F * rs] + jnp.pad(recv_n, pad)
    main_out = main / jnp.maximum(main_norm, _EPS)

    # Last device's tail is the global output tail (no receiver exists).
    tail_out = ola[F * rs :] / jnp.maximum(norm[F * rs :], _EPS)
    return main_out, tail_out[None, :]


def _fused_chunk_ok(cfg: PvocConfig, rs: int) -> bool:
    """The fused chunk bodies ride the split synthesis kernel
    (phasor_istft_ola), which keeps the exact-fold rs | n_fft layout."""
    from ..ops.pallas.fused import fold_ola_supported

    return pipeline.fused_ok(cfg, rs) and fold_ola_supported(cfg.n_fft, rs)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _chunked_jit(x_main, x_tail, nf, cfg, rs, F, mesh):
    D = mesh.shape["seq"]
    body_fn = (
        _chunked_body_fused if _fused_chunk_ok(cfg, rs) else _chunked_body
    )
    body = functools.partial(body_fn, nf=nf, cfg=cfg, rs=rs, F=F, D=D)
    # check_vma=False: the interpret-mode pallas kernels do internal
    # dynamic_slices that the vma checker cannot type (JAX suggests this
    # workaround); correctness is covered by the sharded-vs-single tests.
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("seq"), P()),
        out_specs=(P("seq"), P("seq", None)),
        check_vma=False,
    )
    return fn(x_main, x_tail)


def _chunked_body_fused_batch(
    x_sh, x_tail, nf, cfg: PvocConfig, rs: int, F: int, D: int
):
    """Batched fused chunk program: DP rows x SP chunks in one body.

    Identical math to _chunked_body_fused with a leading (B_local,) batch
    axis: the Pallas stages run as 2-D (batch, tile)-grid kernels
    (stft_phasor_terms_batch / phasor_istft_ola_batch — per-row scratch
    carry, no vmap misattribution), and the cross-device collectives carry
    the batch axis along.
    """
    from ..ops.pallas.fused import (
        boundary_step_term,
        phasor_istft_ola_batch,
        phasor_prefix_exclusive,
        phasor_scan,
        stft_phasor_terms_batch,
    )

    n, ra = cfg.n_fft, cfg.hop
    B = x_sh.shape[0]
    d = jax.lax.axis_index("seq")
    left = [(i, i - 1) for i in range(1, D)]
    right = [(i, i + 1) for i in range(D - 1)]

    halo = _pp(x_sh[:, : n - ra], left)
    halo = jnp.where(d == D - 1, x_tail, halo)
    mag, tre, tim, ure, uim, _ = stft_phasor_terms_batch(
        jnp.concatenate([x_sh, halo], axis=-1), n, ra, rs,
        scan=False, return_u=True,
    )  # (B, F_pad, nbp)

    if rs % ra == 0:
        # Telescoped closed form (see _closed_form_phasors / the 1-D body).
        pre, pim = _closed_form_phasors(ure, uim, d, F, rs, ra, n)
    else:
        u_last = jnp.stack([ure[:, F - 1], uim[:, F - 1]], axis=1)  # (B,2,nbp)
        u_prev = _pp(u_last, right)
        bre, bim = boundary_step_term(
            ure[:, 0], uim[:, 0], u_prev[:, 0], u_prev[:, 1], n, ra, rs
        )  # (B, nbp)
        j = jnp.arange(tre.shape[1])
        first = (j == 0)[None, :, None]
        use_boundary = jnp.logical_and(first, d > 0)
        tre = jnp.where(use_boundary, bre[:, None, :], tre)
        tim = jnp.where(use_boundary, bim[:, None, :], tim)
        valid = ((j < F) & (d * F + j < nf))[None, :, None]
        tre = jnp.where(valid, tre, 1.0)
        tim = jnp.where(valid, tim, 0.0)

        pre_l, pim_l = jax.vmap(phasor_scan)(tre, tim)
        totals = _ag(jnp.stack([pre_l[:, -1], pim_l[:, -1]], axis=1))  # (D, B, 2, nbp)
        totals = totals.transpose(1, 0, 2, 3)  # (B, D, 2, nbp)
        cre_all, cim_all = jax.vmap(phasor_prefix_exclusive)(
            totals[:, :, 0], totals[:, :, 1]
        )  # (B, D, nbp)
        cre = jnp.take(cre_all, d, axis=1)  # (B, nbp)
        cim = jnp.take(cim_all, d, axis=1)
        pre = pre_l * cre[:, None, :] - pim_l * cim[:, None, :]
        pim = pre_l * cim[:, None, :] + pim_l * cre[:, None, :]
        inv = jax.lax.rsqrt(jnp.maximum(pre * pre + pim * pim, 1e-30))
        pre, pim = pre * inv, pim * inv

    mask = (d * F + jnp.arange(F) < nf).astype(mag.dtype)  # (F,)
    mask_b = jnp.broadcast_to(mask[None], (B, F))
    ola = phasor_istft_ola_batch(mag, pre, pim, n, rs, F, frame_mask=mask_b)
    w = hann_window(n, dtype=mag.dtype)
    norm = framing.ola_window_norm(
        w, F, rs, eps=0.0, method="fold", frame_mask=mask
    )  # (F*rs + n - rs,) — row-independent

    tail_len = n - rs
    recv_y = _pp(ola[:, F * rs :], right)  # (B, n-rs)
    recv_n = _pp(norm[F * rs :], right)
    main = ola[:, : F * rs] + jnp.pad(recv_y, ((0, 0), (0, F * rs - tail_len)))
    main_norm = norm[: F * rs] + jnp.pad(recv_n, (0, F * rs - tail_len))
    main_out = main / jnp.maximum(main_norm, _EPS)[None, :]
    tail_out = ola[:, F * rs :] / jnp.maximum(norm[F * rs :], _EPS)[None, :]
    return main_out, tail_out[:, None, :]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _batched_chunked_jit(x_main, x_tail, nf, cfg, rs, F, mesh):
    """DP x SP: batch axis on mesh 'data', time-chunk axis on mesh 'seq'."""
    D = mesh.shape["seq"]

    if _fused_chunk_ok(cfg, rs):
        body = functools.partial(
            _chunked_body_fused_batch, nf=nf, cfg=cfg, rs=rs, F=F, D=D
        )
    else:

        def body(xm, xt):  # (B_local, F*Ra), (B_local, N-Ra)
            one = functools.partial(
                _chunked_body, nf=nf, cfg=cfg, rs=rs, F=F, D=D
            )
            return jax.vmap(one)(xm, xt)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data", "seq"), P("data", None)),
        out_specs=(P("data", "seq"), P("data", "seq", None)),
        check_vma=False,
    )
    return fn(x_main, x_tail)


def batched_chunked_time_stretch(
    xs,
    stretch: float,
    cfg: PvocConfig = PvocConfig(),
    mesh: Mesh | None = None,
) -> jnp.ndarray:
    """Stretch a (B, T) batch, data-parallel over 'data' AND sequence-parallel
    over 'seq' — the full 2-D-mesh program (one shard_map, both axes)."""
    dtype = jnp.dtype(cfg.dtype)
    xs = jnp.asarray(xs, dtype=dtype)
    if xs.ndim != 2:
        raise ValueError(f"expected (B, T) batch, got shape {xs.shape}")
    rs = cfg.synthesis_hop(stretch)
    n, ra = cfg.n_fft, cfg.hop
    nf = framing.num_frames(xs.shape[-1], n, ra)
    if nf <= 0:
        return jnp.zeros((xs.shape[0], 0), dtype=dtype)
    if mesh is None or "seq" not in mesh.shape or "data" not in mesh.shape:
        raise ValueError("batched_chunked_time_stretch needs a ('data','seq') mesh")
    D = mesh.shape["seq"]
    F = -(-nf // D)
    if F < min_frames_per_device(cfg, rs):
        raise ValueError(
            f"recording too short to chunk over {D} devices "
            f"(need >= {min_frames_per_device(cfg, rs) * D} frames, have {nf})"
        )
    nf_pad = F * D
    span = nf_pad * ra
    full = jnp.pad(xs, ((0, 0), (0, max(0, span + (n - ra) - xs.shape[-1]))))
    x_main, x_tail = full[:, :span], full[:, span : span + (n - ra)]
    main, tails = _batched_chunked_jit(x_main, x_tail, nf, cfg, rs, F, mesh)
    out = jnp.concatenate([main, tails[:, -1]], axis=-1)
    return out[:, : framing.output_length(nf, n, rs)]


def min_frames_per_device(cfg: PvocConfig, rs: int) -> int:
    """Smallest F for which halos only touch the immediate neighbor."""
    n, ra = cfg.n_fft, cfg.hop
    f_halo = -(-(n - ra) // ra)  # input halo fits in neighbor's span
    f_tail = -(-(n - rs) // rs)  # OLA tail fits in neighbor's main span
    return max(f_halo, f_tail, 1)


def chunked_time_stretch(
    x,
    stretch: float,
    cfg: PvocConfig = PvocConfig(),
    mesh: Mesh | None = None,
    force: bool = False,
) -> jnp.ndarray:
    """Time-stretch ONE long recording sharded over the mesh's "seq" axis.

    Mathematically identical to pipeline.time_stretch (the phase prefix sum
    factorizes exactly across chunks); falls back to the single-device path
    when the recording is too short to split usefully. force=True runs the
    shard_map program even on a 1-device mesh — the per-chip throughput of
    the chunked program itself, i.e. the true scaling denominator
    (SCALING_r04 / VERDICT r03 #3a).
    """
    dtype = jnp.dtype(cfg.dtype)
    x = jnp.asarray(x, dtype=dtype)
    rs = cfg.synthesis_hop(stretch)
    n, ra = cfg.n_fft, cfg.hop
    nf = framing.num_frames(x.shape[-1], n, ra)
    if nf <= 0:
        return jnp.zeros((0,), dtype=dtype)
    if mesh is None:
        mesh = make_mesh(axis="seq")
    D = mesh.shape["seq"]

    if _fused1_ok(cfg, rs):
        # Single-kernel body (integer k): F is tile-aligned and sized so
        # the nf..nf+m-2 OLA spill rows land inside the last device's span
        # (the monolithic output layout, assembled across shards).
        from ..ops.pallas.fused import _ola_norm_tables, _pick_tile

        m = n // rs
        F_needed = -(-(nf + m - 1) // D)
        t0 = _pick_tile(n, rs, nf)
        if F_needed >= t0:
            F = -(-F_needed // t0) * t0
        else:
            F = max(8, -(-F_needed // 8) * 8)
        if (D == 1 and not force) or F < min_frames_per_device(cfg, rs):
            return pipeline.time_stretch(x, stretch, cfg)
        span = F * D * ra
        full = jnp.pad(x, (0, max(0, span + (n - ra) - x.shape[-1])))
        x_main, x_tail = full[:span], full[span : span + (n - ra)]
        rows = _chunked_fused1_jit(
            x_main, x_tail, nf, cfg, rs, F, mesh
        )  # (D*F, rs), interior-normalized, spill rows past nf
        m_full, tail_inv = _ola_norm_tables(n, rs)
        fix = jnp.asarray(tail_inv / m_full[m - 1 : m])
        tail = rows[nf : nf + m - 1] * fix
        out = jnp.concatenate([rows[:nf].reshape(-1), tail.reshape(-1)])
        return out[: framing.output_length(nf, n, rs)]

    F = -(-nf // D)
    if (D == 1 and not force) or F < min_frames_per_device(cfg, rs):
        return pipeline.time_stretch(x, stretch, cfg)

    nf_pad = F * D
    span = nf_pad * ra
    full = jnp.pad(x, (0, max(0, span + (n - ra) - x.shape[-1])))
    x_main, x_tail = full[:span], full[span : span + (n - ra)]

    main, tails = _chunked_jit(x_main, x_tail, nf, cfg, rs, F, mesh)
    out = jnp.concatenate([main, tails[-1]])
    return out[: framing.output_length(nf, n, rs)]
