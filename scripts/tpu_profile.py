"""Per-stage timing attribution for the fused TSM kernel on the real TPU.

The whole pipeline is ONE Mosaic kernel, so a jax.profiler trace cannot
split it into stages. This script attributes time by ABLATION: it re-times
the kernel with individual stages skipped or cheapened (the `ablate` hook
in ops/pallas/fused.py — outputs are numerically wrong, only wall time is
meaningful) and reports the deltas vs the full kernel:

  fwd1  — forward half-length DFT matmuls at 1-pass bf16 instead of
          Precision.HIGHEST (6 passes): delta ~= 10/12 of fwd MXU time
  inv1  — inverse DFT matmuls at 1 pass instead of the 3-pass bf16 split
  rev   — skip both fold lane-reversal permutation matmuls (3 passes each)
  scan  — skip the in-VMEM Hillis-Steele prefix product (log2(tile) levels
          of sublane rolls + complex muls on (tile, 512) f32)
  terms — skip the phasor-term algebra (rolls, complex muls, pow_k)

Also sweeps the frames-per-grid-step tile size and (optionally) captures a
jax.profiler trace of the full kernel for the record.

Usage:  python scripts/tpu_profile.py [--seconds 600] [--iters 5]
        [--trace-dir /tmp/pvoc_trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PVOC_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["PVOC_PLATFORM"])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--tiles", type=int, nargs="*", default=[64, 128, 256])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from phase_vocoder_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from phase_vocoder_tpu import PvocConfig
    from phase_vocoder_tpu.ops.pallas.fused import fused_time_stretch

    sr, n_fft, hop = 16000, 1024, 256
    cfg = PvocConfig(n_fft=n_fft, hop=hop, fft_backend="pallas")
    rs = cfg.synthesis_hop(args.ratio)

    rng = np.random.default_rng(0)
    t = np.arange(int(args.seconds * sr)) / sr
    x_np = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.3 * np.sin(2 * np.pi * (200.0 * t + 40.0 * t * t))
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)
    x = jax.device_put(jnp.asarray(x_np))

    def timed(tile=None, ablate=""):
        fn = jax.jit(
            lambda a: jnp.sum(
                fused_time_stretch(a, n_fft, hop, rs, tile=tile, ablate=ablate)
            )
        )
        float(fn(x))  # compile + warmup
        best = min(
            (lambda t0: (float(fn(x)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(args.iters)
        )
        return best

    report = {
        "metric": "fused_kernel_stage_attribution",
        "audio_seconds": args.seconds,
        "device": str(jax.devices()[0]),
        "iters": args.iters,
    }

    base = timed()
    report["baseline_s"] = round(base, 5)
    report["baseline_audio_s_per_s"] = round(args.seconds / base, 1)

    stages = {}
    for ab in ("fwd1", "inv1", "rev", "scan", "terms", "scan+terms",
               "fwd1+inv1+rev", "frame", "mag", "ola", "norm",
               "frame+ola+norm+mag"):
        dt = timed(ablate=ab)
        stages[ab] = {
            "wall_s": round(dt, 5),
            "delta_vs_base_s": round(base - dt, 5),
            "share_of_base": round((base - dt) / base, 4),
        }
    report["ablations"] = stages

    tiles = {}
    for tl in args.tiles:
        dt = timed(tile=tl)
        tiles[str(tl)] = {
            "wall_s": round(dt, 5),
            "audio_s_per_s": round(args.seconds / dt, 1),
        }
    report["tile_sweep"] = tiles

    if args.trace_dir:
        fn = jax.jit(lambda a: jnp.sum(fused_time_stretch(a, n_fft, hop, rs)))
        float(fn(x))
        with jax.profiler.trace(args.trace_dir):
            float(fn(x))
        report["trace_dir"] = args.trace_dir

    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
