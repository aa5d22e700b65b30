"""Data-parallel batched TSM (BASELINE config 4: 64 utterances, varied ratios).

Utterance batches are embarrassingly parallel: vmap the single-utterance
pipeline over the batch axis and shard that axis over the mesh's "data"
axis — XLA partitions the program with zero collectives (SURVEY.md SS2.2).

Varied stretch ratios: the synthesis hop Rs is a static shape parameter, so
utterances are grouped by Rs and each group runs as one padded batch
(padded-length bucketing, SURVEY.md SS7 stage 5).
"""

from __future__ import annotations

import functools
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PvocConfig
from .. import pipeline
from ..ops import framing


@functools.partial(jax.jit, static_argnums=(2, 3))
def _batch_stretch_jit(
    xs: jnp.ndarray, n_valid_frames: jnp.ndarray, cfg: PvocConfig, rs: int
) -> jnp.ndarray:
    nf_padded = framing.num_frames(xs.shape[-1], cfg.n_fft, cfg.hop)

    def one(x, nf_i):
        mag, phi = pipeline.analyze(x, cfg)
        re, im = pipeline.stretch_frames(mag, phi, cfg, rs)
        mask = (jnp.arange(nf_padded) < nf_i).astype(x.dtype)
        return pipeline.synthesize(re, im, cfg, rs, frame_mask=mask)

    return jax.vmap(one)(xs, n_valid_frames)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _batch_stretch_fused_jit(
    xs: jnp.ndarray,
    n_valid_frames: jnp.ndarray,
    cfg: PvocConfig,
    rs: int,
    mesh: Mesh | None,
) -> jnp.ndarray:
    """Batched fused phasor path: ONE 2-D-grid Pallas kernel per shard.

    A pallas_call is opaque to XLA's auto-partitioner, so the mesh case
    wraps it in shard_map over "data" explicitly — each device runs the
    batched kernel on its own B/D rows with zero collectives (DP).
    """
    from ..ops.pallas.fused import fused_time_stretch_batch

    nf = framing.num_frames(xs.shape[-1], cfg.n_fft, cfg.hop)
    out_len = framing.output_length(nf, cfg.n_fft, rs)

    def body(xm, nm):
        return fused_time_stretch_batch(
            xm, cfg.n_fft, cfg.hop, rs, n_valid_frames=nm
        )

    if mesh is None:
        ys = body(xs, n_valid_frames)
    else:
        ys = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )(xs, n_valid_frames)
    return ys[:, :out_len]


def batch_time_stretch(
    xs, stretch: float, cfg: PvocConfig = PvocConfig(), mesh: Mesh | None = None
) -> jnp.ndarray:
    """Stretch a (B, T) batch of equal-length utterances, one ratio.

    With a mesh, the batch axis is sharded over the "data" mesh axis so each
    chip processes B/D utterances.
    """
    return batch_time_stretch_rs(xs, cfg.synthesis_hop(stretch), cfg, mesh=mesh)


def batch_time_stretch_ragged(
    xs: list, stretch: float, cfg: PvocConfig = PvocConfig(), mesh: Mesh | None = None
) -> list:
    """Stretch a list of variable-length utterances (one ratio).

    Pads to the bucket maximum, runs one batched program, slices each output
    to its true stretched length. Padding frames produce zero output (zero
    input -> zero magnitude), so slicing recovers the exact per-utterance
    waveform of the unpadded run up to OLA edge normalization.
    """
    return batch_time_stretch_varied(xs, [stretch] * len(xs), cfg, mesh=mesh)


def batch_time_stretch_varied(
    xs: list,
    stretches: list,
    cfg: PvocConfig = PvocConfig(),
    mesh: Mesh | None = None,
) -> list:
    """Stretch utterances with per-utterance ratios (grouped by ratio)."""
    if len(xs) != len(stretches):
        raise ValueError("xs and stretches must have equal length")
    groups: dict[int, list[int]] = defaultdict(list)
    for i, s in enumerate(stretches):
        groups[cfg.synthesis_hop(s)].append(i)

    out: list = [None] * len(xs)
    for rs, idxs in groups.items():
        max_len = max(len(xs[i]) for i in idxs)
        batch = np.zeros((len(idxs), max_len), dtype=cfg.dtype)
        nfs = np.empty(len(idxs), dtype=np.int32)
        for row, i in enumerate(idxs):
            batch[row, : len(xs[i])] = xs[i]
            nfs[row] = framing.num_frames(len(xs[i]), cfg.n_fft, cfg.hop)
        ys = np.asarray(batch_time_stretch_rs(batch, rs, cfg, mesh=mesh, n_valid_frames=nfs))
        for row, i in enumerate(idxs):
            out[i] = ys[row, : framing.output_length(int(nfs[row]), cfg.n_fft, rs)]
    return out


def batch_time_stretch_rs(
    xs,
    rs: int,
    cfg: PvocConfig = PvocConfig(),
    mesh: Mesh | None = None,
    n_valid_frames=None,
) -> jnp.ndarray:
    """Batched stretch parameterized directly by synthesis hop Rs."""
    xs = jnp.asarray(xs, dtype=jnp.dtype(cfg.dtype))
    nf = framing.num_frames(xs.shape[-1], cfg.n_fft, cfg.hop)
    if n_valid_frames is None:
        n_valid_frames = jnp.full((xs.shape[0],), nf, dtype=jnp.int32)
    else:
        n_valid_frames = jnp.asarray(n_valid_frames, dtype=jnp.int32)
    pad_rows = 0
    if mesh is not None:
        # shard_map needs B % D == 0: pad with all-masked zero rows (their
        # output is zero and is dropped before returning).
        d = mesh.shape["data"]
        pad_rows = (-xs.shape[0]) % d
        if pad_rows:
            xs = jnp.pad(xs, ((0, pad_rows), (0, 0)))
            n_valid_frames = jnp.pad(n_valid_frames, (0, pad_rows))
        xs = jax.device_put(xs, NamedSharding(mesh, P("data")))
        n_valid_frames = jax.device_put(n_valid_frames, NamedSharding(mesh, P("data")))
    if pipeline.fused_ok(cfg, rs):
        ys = _batch_stretch_fused_jit(xs, n_valid_frames, cfg, rs, mesh)
    else:
        ys = _batch_stretch_jit(xs, n_valid_frames, cfg, rs)
    return ys[: ys.shape[0] - pad_rows] if pad_rows else ys
