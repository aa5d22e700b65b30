"""Chunk-granular checkpoint/resume for long streaming runs (SURVEY.md SS5).

The reference has no recovery story — a killed CLI run restarts from zero.
Here the only cross-segment state is streaming.StreamState (a few KB:
wrapped phase carry, OLA tails, frame offset), so hour-long jobs checkpoint
at segment-batch granularity: each batch's output lands in a numbered .npy
part and the carry state is saved with orbax-checkpoint. A killed job
resumes at the last completed batch; the resumed result is bit-identical to
an uninterrupted run (the scan program is the same, only the carry is
round-tripped through HBM/disk).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from ..config import PvocConfig
from ..ops import framing
from .. import streaming

def _state_to_tree(state: streaming.StreamState) -> dict:
    return {f.name: getattr(state, f.name) for f in dataclasses.fields(state)}


def _tree_to_state(tree: dict) -> streaming.StreamState:
    return streaming.StreamState(**{k: jnp.asarray(v) for k, v in tree.items()})


class StreamCheckpointer:
    """Persists (batch index, StreamState, output parts) under a directory."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._ckptr = None

    def _orbax(self):
        if self._ckptr is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.directory, "manifest.json")

    def write_manifest(self, meta: dict) -> None:
        with open(self._manifest_path(), "w") as f:
            json.dump(meta, f)

    def read_manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # -- parts + state -----------------------------------------------------
    def save_batch(self, batch: int, out: np.ndarray,
                   state: streaming.StreamState) -> None:
        part = os.path.join(self.directory, f"part_{batch:06d}.npy")
        tmp = part + ".tmp.npy"
        np.save(tmp, np.asarray(out))
        os.replace(tmp, part)
        ckptr = self._orbax()
        state_dir = os.path.join(self.directory, f"state_{batch:06d}")
        ckptr.save(state_dir, _state_to_tree(state), force=True)
        ckptr.wait_until_finished()
        # State save is the commit point; stale older states are pruned.
        for old in self.completed_batches()[:-1]:
            prev = os.path.join(self.directory, f"state_{old:06d}")
            if os.path.isdir(prev):
                import shutil

                shutil.rmtree(prev, ignore_errors=True)

    def completed_batches(self) -> list[int]:
        done = []
        for name in os.listdir(self.directory):
            if name.startswith("state_") and not name.endswith(".tmp"):
                try:
                    done.append(int(name.split("_")[1]))
                except (IndexError, ValueError):
                    continue
        return sorted(done)

    def latest(self) -> tuple[int, streaming.StreamState] | None:
        done = self.completed_batches()
        if not done:
            return None
        batch = done[-1]
        tree = self._orbax().restore(
            os.path.join(self.directory, f"state_{batch:06d}")
        )
        return batch, _tree_to_state(tree)

    def load_parts(self, up_to_batch: int) -> list[np.ndarray]:
        parts = []
        for b in range(up_to_batch + 1):
            parts.append(np.load(os.path.join(self.directory, f"part_{b:06d}.npy")))
        return parts


def checkpointed_stream_time_stretch(
    x,
    stretch: float,
    cfg: PvocConfig = PvocConfig(),
    checkpoint_dir: str = "pvoc_ckpt",
    segment_frames: int = streaming.DEFAULT_SEGMENT_FRAMES,
    batch_segments: int = 8,
    _fail_after_batches: int | None = None,
) -> jnp.ndarray:
    """stream_time_stretch with segment-batch checkpointing.

    Re-running after a crash resumes at the last completed batch and returns
    the identical waveform. `_fail_after_batches` is a fault-injection hook
    for tests (raises after N batches, mimicking preemption).
    """
    dtype = jnp.dtype(cfg.dtype)
    x = jnp.asarray(x, dtype=dtype)
    rs = cfg.synthesis_hop(stretch)
    nf = framing.num_frames(x.shape[-1], cfg.n_fft, cfg.hop)
    if nf <= 0:
        return jnp.zeros((0,), dtype=dtype)
    F, S = streaming.plan_segments(nf, cfg, rs, segment_frames)
    x_pad = streaming.pad_for_segments(x, cfg, F, S)

    ck = StreamCheckpointer(checkpoint_dir)
    meta = {"nf": nf, "F": F, "S": S, "rs": rs, "stretch": stretch,
            "n_fft": cfg.n_fft, "hop": cfg.hop, "batch_segments": batch_segments}
    existing = ck.read_manifest()
    if existing is not None and existing != meta:
        raise ValueError(
            f"checkpoint dir {checkpoint_dir!r} holds a different run: "
            f"{existing} != {meta}"
        )
    ck.write_manifest(meta)

    latest = ck.latest()
    if latest is None:
        next_batch = 0
        state = streaming.init_state(cfg, rs, dtype=dtype)
    else:
        last_done, state = latest
        next_batch = last_done + 1

    n_batches = -(-S // batch_segments)
    done = 0
    for batch in range(next_batch, n_batches):
        s0 = batch * batch_segments
        count = min(batch_segments, S - s0)
        # One compiled program per distinct `count` (at most two: full + last).
        out, state = streaming._stream_scan_from(
            x_pad, state, nf, cfg, rs, F, count
        )
        ck.save_batch(batch, np.asarray(out), state)
        done += 1
        if _fail_after_batches is not None and done >= _fail_after_batches:
            raise RuntimeError(f"injected failure after {done} batches")

    parts = ck.load_parts(n_batches - 1)
    out = jnp.concatenate(
        [jnp.asarray(p) for p in parts] + [streaming.flush_tail(state)]
    )
    return out[: framing.output_length(nf, cfg.n_fft, rs)]
