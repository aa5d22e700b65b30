"""Round-4 TPU measurement session — ALL chip work in ONE process.

Produces (incrementally, so a timeout loses nothing):
  PROFILE_r04.json — finer remainder ablations (frame/mag/ola/norm), framing
                     roll-vs-slice A/B, tile sweep at the 14400 s headline
                     point, on-chip 60 s accuracy gates for the r04 kernel.
  STRETCH_r04.json — canonical stretch rows 0.5/1.0/2.0 at 14400 s
                     (VERDICT r03 #6).
  STREAM_r04.json  — streaming fused executor + checkpointed run at
                     14400 s (VERDICT r03 #2).
  PITCH_r04.json   — pitch bench at 3600 s with stretch-only attribution
                     (VERDICT r03 #4).
  SCALING_r04.json (partial, chip side) — 1-device chunked shard_map
                     throughput, the true scaling denominator (#3a). The
                     CPU-mesh collectives A/B (#3b) runs separately under
                     PVOC_PLATFORM=cpu and is merged by scripts/merge_scaling.

Usage: timeout 7200 python scripts/tpu_round4.py [--sections profile,stretch,stream,pitch,scaling]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, flush=True)


def write(name, obj):
    path = os.path.join(REPO, name)
    with open(path, "w") as f:
        json.dump(obj, f, indent=1)
    log(f"[wrote {name}]")


def make_signal(seconds, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    return (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.3 * np.sin(2 * np.pi * (200.0 * t + 40.0 * t * t))
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="profile,stretch,stream,pitch,scaling")
    ap.add_argument("--seconds", type=float, default=14400.0)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)
    sections = set(args.sections.split(","))

    from phase_vocoder_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from golden import pv_ref
    from phase_vocoder_tpu import PvocConfig, pipeline
    from phase_vocoder_tpu.ops.pallas import fused

    dev = str(jax.devices()[0])
    log("device:", dev)
    sr, n_fft, hop = 16000, 1024, 256
    cfg = PvocConfig(n_fft=n_fft, hop=hop, fft_backend="pallas")

    x_head = jax.device_put(jnp.asarray(make_signal(args.seconds)))
    x60 = make_signal(60.0)

    def timed(fn, x, iters=None):
        float(fn(x))  # compile + warmup
        times = []
        for _ in range(iters or args.iters):
            t0 = time.perf_counter()
            float(fn(x))
            times.append(time.perf_counter() - t0)
        return min(times)

    def gate(ours, ref):
        sl = slice(n_fft, len(ref) - n_fft)
        o = np.asarray(ours, np.float64)
        return float(np.max(np.abs(o[sl] - ref[sl])) / np.max(np.abs(ref[sl])))

    # ------------------------------------------------------------- profile
    if "profile" in sections:
        prof = {
            "metric": "fused_kernel_attribution_r04",
            "device": dev,
            "audio_seconds": args.seconds,
            "iters": args.iters,
            "note": (
                "r04 kernel = r03 + mag via n2*rsqrt (sqrt removed) + "
                "stream-capable tile body; ablation outputs are WRONG "
                "(wall time only)"
            ),
        }

        def tstretch(tile=None, ablate=""):
            return jax.jit(
                lambda a: jnp.sum(
                    fused.fused_time_stretch(
                        a, n_fft, hop, 512, tile=tile, ablate=ablate
                    )
                )
            )

        base = timed(tstretch(), x_head)
        prof["base_wall_s"] = round(base, 5)
        prof["base_audio_s_per_s"] = round(args.seconds / base, 1)
        log("base:", prof["base_audio_s_per_s"])

        abl = {}
        for ab in ("frame", "mag", "ola", "norm", "frame+mag+ola+norm",
                   "fwd1", "inv1", "rev"):
            try:
                dt = timed(tstretch(ablate=ab), x_head)
                abl[ab] = {
                    "wall_s": round(dt, 5),
                    "audio_s_per_s": round(args.seconds / dt, 1),
                    "share_of_base": round((base - dt) / base, 4),
                }
                log("ablate", ab, abl[ab])
            except Exception as e:  # keep going; record the failure
                abl[ab] = {"error": repr(e)[:200]}
                log("ablate", ab, "FAILED", repr(e)[:120])
        prof["ablations"] = abl
        write("PROFILE_r04.json", prof)

        # framing slice-vs-roll A/B
        fr = {}
        for mode in ("slice", "roll"):
            fused.set_framing_mode(mode)
            jax.clear_caches()
            try:
                dt = timed(tstretch(), x_head)
                fr[mode] = {
                    "wall_s": round(dt, 5),
                    "audio_s_per_s": round(args.seconds / dt, 1),
                }
            except Exception as e:
                fr[mode] = {"error": repr(e)[:200]}
            log("framing", mode, fr[mode])
        fused.set_framing_mode("roll")
        jax.clear_caches()
        prof["framing_mode_ab"] = fr
        write("PROFILE_r04.json", prof)

        tiles = {}
        for tl in (256, 320, 384, 448, 512):
            try:
                dt = timed(tstretch(tile=tl), x_head)
                tiles[str(tl)] = {
                    "wall_s": round(dt, 5),
                    "audio_s_per_s": round(args.seconds / dt, 1),
                }
            except Exception as e:
                tiles[str(tl)] = {"error": repr(e)[:200]}
            log("tile", tl, tiles[str(tl)])
        prof["tile_sweep"] = tiles
        write("PROFILE_r04.json", prof)

        # on-chip 60 s gates for the r04 kernel (and tile 384 at a length
        # where it compiles, if any)
        acc = {}
        for stretch in (0.5, 1.0, 2.0):
            rs = cfg.synthesis_hop(stretch)
            ref = pv_ref.phase_vocoder(np.asarray(x60, np.float64), stretch,
                                       n_fft, hop)
            y = fused.fused_time_stretch(jnp.asarray(x60), n_fft, hop, rs)
            acc[f"{stretch}x"] = round(gate(y, ref), 8)
            log("gate", stretch, acc[f"{stretch}x"])
        prof["accuracy_60s_chip"] = acc
        write("PROFILE_r04.json", prof)

    # ------------------------------------------------------------- stretch
    if "stretch" in sections:
        import bench

        rows = {}
        for ratio in (2.0, 1.0, 0.5):
            rec = bench.run_bench(seconds=args.seconds, ratio=ratio,
                                  iters=args.iters)
            rows[f"{ratio}x"] = rec
            log("stretch", ratio, rec["value"], "gate",
                rec.get("allclose_rel_err"))
            write("STRETCH_r04.json", {
                "metric": "canonical_stretch_throughput",
                "device": dev,
                "audio_seconds": args.seconds,
                "rows": rows,
            })

    # ------------------------------------------------------------- stream
    if "stream" in sections:
        import bench

        rec = bench.run_stream_bench(seconds=args.seconds, iters=args.iters,
                                     checkpoint=True)
        log("stream:", rec["value"], "ckpt:",
            rec.get("checkpointed_audio_s_per_s"))
        write("STREAM_r04.json", rec)

    # ------------------------------------------------------------- pitch
    if "pitch" in sections:
        import bench

        rec = bench.run_pitch_bench(seconds=3600.0, iters=3)
        write("PITCH_r04.json", rec)
        for k, v in rec["semitones"].items():
            log("pitch", k, v["audio_s_per_s"], v["path"],
                "resample_share", v["resample_share_of_wall"])

    # ------------------------------------------------------------- scaling
    if "scaling" in sections:
        from phase_vocoder_tpu.parallel.chunked import chunked_time_stretch
        from jax.sharding import Mesh

        seconds = 3600.0
        x = jax.device_put(jnp.asarray(make_signal(seconds)))
        mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
        fn = jax.jit(
            lambda a: jnp.sum(
                chunked_time_stretch(a, 2.0, cfg, mesh=mesh, force=True)
            )
        )
        best = timed(fn, x, iters=3)
        # reference: the monolithic fused kernel on the same slice
        fn_mono = jax.jit(
            lambda a: jnp.sum(fused.fused_time_stretch(a, n_fft, hop, 512))
        )
        best_mono = timed(fn_mono, x, iters=3)
        rec = {
            "metric": "chunked_one_device_denominator",
            "device": dev,
            "audio_seconds": seconds,
            "chunked_1dev_wall_s": round(best, 4),
            "chunked_1dev_audio_s_per_s": round(seconds / best, 1),
            "monolithic_wall_s": round(best_mono, 4),
            "monolithic_audio_s_per_s": round(seconds / best_mono, 1),
            "chunked_vs_monolithic": round(best_mono / best, 4),
            "note": (
                "the chunked shard_map program forced onto a 1-device mesh "
                "(split kernels + XLA glue + degenerate collectives) — the "
                "honest per-chip numerator/denominator for scaling claims "
                "(VERDICT r03 #3a)"
            ),
        }
        write("SCALING_CHIP_r04.json", rec)
        log("chunked 1-dev:", rec["chunked_1dev_audio_s_per_s"],
            "monolithic:", rec["monolithic_audio_s_per_s"])

    log("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
