"""Round-5 TPU session driver — ONE process holds the chip (CLAUDE.md).

Produces, in order:
  1. GEOM_r05.json   — off-canonical geometries on chip (VERDICT r04 #7):
                       N=512/hop=128 and N=2048/hop=512, stretch
                       {0.5, 1.0, 2.0}, each row gated <1e-4 vs the f64
                       golden model on a 60 s slice before timing 3600 s.
                       Rows run under try/except: a Mosaic scoped-VMEM
                       rejection is recorded honestly instead of killing
                       the session (the first run died on N=2048/x0.5 —
                       _pick_tile now scales with the overlap count).
  2. PITCH_r05.json  — refresh of the interim artifact with the v3 fused
                       select resampler (landed after the interim run;
                       VERDICT r04 #3/#5).
  3. BENCH_preview_r05.json — canonical headline point (14400 s, 2.0x),
                       same record bench.py main() emits, for cross-check
                       against the driver's end-of-round run.

Run:  cd /root/repo && timeout 5400 python scripts/tpu_round5.py
"""

from __future__ import annotations

import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import bench  # noqa: E402


def main() -> int:
    import jax

    dev = str(jax.devices()[0])
    print("device:", dev, flush=True)

    # ---- 1. geometry generality --------------------------------------
    rows = {}
    for n_fft, hop in ((512, 128), (2048, 512)):
        for ratio in (0.5, 1.0, 2.0):
            key = f"n{n_fft}_hop{hop}_x{ratio:g}"
            print("GEOM", key, flush=True)
            try:
                r = bench.run_bench(
                    seconds=3600.0,
                    ratio=ratio,
                    n_fft=n_fft,
                    hop=hop,
                    iters=3,
                    chain=4,
                )
            except Exception as e:  # record, keep the session alive
                traceback.print_exc()
                rows[key] = {"error": f"{type(e).__name__}: {e}"[:400]}
                continue
            rows[key] = {
                k: r[k]
                for k in (
                    "value",
                    "unit",
                    "path",
                    "wall_s_best",
                    "chain",
                    "roofline_audio_s_per_s",
                    "vs_baseline",
                    "allclose_rel_err",
                    "allclose_pass",
                )
            }
            print(
                key,
                r["value"],
                "rel",
                r.get("allclose_rel_err"),
                r["path"],
                flush=True,
            )
    geom = {
        "metric": "geometry_generality_r05",
        "unit": "audio-s/s",
        "device": dev,
        "gate": "interior max rel err < 1e-4 vs f64 golden, 60 s slice, "
                "measured ON CHIP on the very path timed",
        "seconds_per_pass": 3600.0,
        "note": (
            "VERDICT r04 #7: every prior artifact was N=1024/hop=256. "
            "These rows prove the framework claim at two off-canonical "
            "operating points: half-size (N=512/hop=128) and double-size "
            "(N=2048/hop=512) frames, all three canonical stretches. "
            "_pick_tile scales the fused kernel's frame tile down at "
            "N=2048 (tile 64 at overlap 2, /(overlap/2) beyond — tile 64 "
            "stacked 18.75M > the 16 MB Mosaic scoped-VMEM limit at "
            "rs=256) to hold the working set under the stack limit."
        ),
        "rows": rows,
    }
    json.dump(geom, open(os.path.join(REPO, "GEOM_r05.json"), "w"), indent=1)
    print("wrote GEOM_r05.json", flush=True)

    # ---- 2. pitch refresh (resampler v3) -----------------------------
    try:
        p = bench.run_pitch_bench()
        p["note"] = (
            "round 5 final (v3 fused-select resampler): ALL semitones ride "
            "the single fused stretch kernel (general-hop ceil-fold OLA + "
            "angle-domain terms, landed r05); the resampler's position/"
            "carry/lerp math now runs inside one Pallas kernel with per-row "
            "static bit-roll alignment (ops/resample.py v3). The interim "
            "artifact (commit bbc7338) measured the v2 select at the same "
            "stretch kernel; this run re-measures with v3 as routed by "
            "default."
        )
        json.dump(
            p, open(os.path.join(REPO, "PITCH_r05.json"), "w"), indent=1
        )
        print("wrote PITCH_r05.json", flush=True)
        for k, v in p["semitones"].items():
            print(
                k,
                v["audio_s_per_s"],
                "resample_share",
                v["resample_share_of_wall"],
                "rel",
                v["rel_err_vs_golden"],
                flush=True,
            )
    except Exception:
        traceback.print_exc()

    # ---- 3. headline preview -----------------------------------------
    h = bench.run_bench()
    json.dump(
        h, open(os.path.join(REPO, "BENCH_preview_r05.json"), "w"), indent=1
    )
    print("wrote BENCH_preview_r05.json", flush=True)
    print(json.dumps({k: h[k] for k in ("value", "vs_baseline", "path")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
