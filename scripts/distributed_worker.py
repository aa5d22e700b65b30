"""Worker process for the multi-host bootstrap test (SURVEY.md SS2.2, SS4.4).

Run as one of N processes of a multi-process JAX job:

    python scripts/distributed_worker.py <coordinator> <num_procs> <pid> <out.json>

Each process contributes 4 virtual CPU devices (so 2 processes = an 8-device
global mesh), bootstraps via jax.distributed.initialize, and runs the SAME
sequence-parallel chunked-TSM program the single-process tests exercise —
this validates the process-bootstrap + global-mesh path end to end: the
collectives (ppermute halos, all_gather phase carry) here cross a process
boundary, which is exactly what DCN traffic between real hosts exercises.

Process 0 compares the globally-gathered output against the float64 golden
model and the single-device path, and writes a JSON verdict to <out.json>.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    coord, nproc, pid, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    # Per-process virtual CPU devices — must be set before jax imports.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    # The axon TPU plugin overrides JAX_PLATFORMS; force CPU (two processes
    # must not race for the single tunneled chip).
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from phase_vocoder_tpu import PvocConfig
    from phase_vocoder_tpu.parallel import distributed
    from phase_vocoder_tpu.parallel.chunked import chunked_time_stretch

    distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    mesh = distributed.global_mesh("seq")
    n_global = int(mesh.devices.size)

    # Deterministic input, identical on every process (replicated feed).
    sr, seconds, ratio = 16000, 8.0, 2.0
    g = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    x = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.3 * np.sin(2 * np.pi * (200.0 * t + 400.0 * t * t))
        + 0.05 * g.standard_normal(len(t))
    ).astype(np.float32)

    cfg = PvocConfig(fft_backend="pallas")
    y = chunked_time_stretch(x, ratio, cfg, mesh=mesh)

    # Gather the sharded global output so process 0 can judge it.
    from jax.experimental import multihost_utils

    y_full = np.asarray(multihost_utils.process_allgather(y, tiled=True))

    if pid == 0:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from golden import pv_ref

        ref = pv_ref.phase_vocoder(
            np.asarray(x, np.float64), ratio, cfg.n_fft, cfg.hop
        )
        m = min(len(ref), len(y_full))
        sl = slice(cfg.n_fft, m - cfg.n_fft)
        err = float(
            np.max(np.abs(y_full[sl] - ref[sl])) / np.max(np.abs(ref[sl]))
        )
        rec = {
            "process_count": int(jax.process_count()),
            "global_devices": n_global,
            "local_devices": int(jax.local_device_count()),
            "rel_err_vs_golden": err,
            "pass": bool(err < 1e-4),
        }
        with open(out_path, "w") as f:
            json.dump(rec, f)

    # All processes must reach the barrier before exiting (the coordinator
    # lives in process 0; early exit would kill process 1's collectives).
    multihost_utils.sync_global_devices("pvoc_distributed_worker_done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
