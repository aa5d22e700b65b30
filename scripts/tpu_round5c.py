"""Round-5 TPU session C — ONE process holds the chip (CLAUDE.md).

1. A/B the v4 MXU shear-select resampler vs v3 on chip at the pitch
   factors (standalone, chained dispatch), sweeping _MXU_ROWS {64, 128};
   accuracy vs the gather reference on a 1M-sample slice first.
2. If v4 wins: flip _SEL_IMPL to 'mxu' and re-run the pitch bench ->
   PITCH_r05.json (+ resample attribution note).
3. Re-run the N=2048 GEOM rows with the scoped-VMEM fix -> merge into
   GEOM_r05.json.

Run:  cd /root/repo && timeout 5400 python scripts/tpu_round5c.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from phase_vocoder_tpu.ops import resample
    from phase_vocoder_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = str(jax.devices()[0])
    print("device:", dev, flush=True)

    # ---- 1. resampler A/B -------------------------------------------
    sr = 16000
    seconds = 3600.0
    chain = 4
    rng = np.random.default_rng(0)
    ab = {"metric": "resample_ab_r05", "device": dev, "rows": {}}

    def time_impl(impl, rows, rfac, y, out_len):
        resample._SEL_IMPL = impl
        resample._MXU_ROWS = rows
        jax.clear_caches()

        def body(a):
            s = jnp.float32(0.0)
            for j in range(chain):
                s = s + jnp.sum(
                    resample._resample_strided_select(
                        a[j:], rfac, out_len - j
                    )
                )
            return s

        fn = jax.jit(body)
        float(fn(y))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(y))
            times.append(time.perf_counter() - t0)
        return min(times)

    for s in (-7.0, 5.0):
        factor = 2.0 ** (s / 12.0)
        rfac = 1.0 / factor
        in_len = int(seconds * sr * factor)
        out_len = int(round(in_len * rfac))
        y = jax.device_put(
            jnp.asarray(rng.standard_normal(in_len).astype(np.float32))
        )
        # accuracy first (1M slice, on chip, vs the gather reference)
        ns = 1_000_000
        ysl = y[: int(ns * factor)]
        osl = int(round(int(ns * factor) * rfac))
        ref = np.asarray(resample._resample_gather(ysl, rfac, osl))
        accs = {}
        for impl, rows in (("fused", 64), ("mxu", 64)):
            resample._SEL_IMPL = impl
            resample._MXU_ROWS = rows
            jax.clear_caches()
            out = np.asarray(
                resample._resample_strided_select(ysl, rfac, osl)
            )
            accs[impl] = float(np.max(np.abs(out - ref)))
        row = {"chip_abs_err_vs_gather": accs}
        for impl, rows in (("fused", 64), ("mxu", 64), ("mxu", 128)):
            key = f"{impl}{rows if impl == 'mxu' else ''}"
            try:
                best = time_impl(impl, rows, rfac, y, out_len)
                msps = chain * out_len / best / 1e6
                row[key] = {
                    "wall_s_best": round(best, 4),
                    "msamp_per_s": round(msps, 1),
                }
                print(f"{s:+g}st {key}: {msps:.0f} Msamp/s", flush=True)
            except Exception as e:
                traceback.print_exc()
                row[key] = {"error": f"{type(e).__name__}: {e}"[:300]}
        ab["rows"][f"{s:+g}st"] = row
    resample._SEL_IMPL = "fused"
    resample._MXU_ROWS = 64
    jax.clear_caches()

    # pick winner at -7st
    r7 = ab["rows"]["-7st"]
    cands = {
        k: v["msamp_per_s"]
        for k, v in r7.items()
        if isinstance(v, dict) and "msamp_per_s" in v
    }
    winner = max(cands, key=cands.get) if cands else "fused"
    ab["winner"] = winner
    json.dump(ab, open(os.path.join(REPO, "RESAMPLE_AB_r05.json"), "w"),
              indent=1)
    print("wrote RESAMPLE_AB_r05.json; winner:", winner, flush=True)

    # ---- 2. pitch re-run with the winner -----------------------------
    if winner.startswith("mxu"):
        resample._SEL_IMPL = "mxu"
        resample._MXU_ROWS = 128 if winner == "mxu128" else 64
        jax.clear_caches()
        try:
            p = bench.run_pitch_bench()
            p["note"] = (
                "round 5 final: v4 MXU shear-select resampler (static 0/1 "
                "shear matmul + hat-weight lerp, ops/resample.py "
                "_select_body_v4) as routed; chip A/B vs v3 in "
                "RESAMPLE_AB_r05.json. All semitones ride the single fused "
                "stretch kernel (general-hop ceil-fold OLA, landed r05)."
            )
            p["resampler"] = winner
            json.dump(
                p, open(os.path.join(REPO, "PITCH_r05.json"), "w"), indent=1
            )
            print("wrote PITCH_r05.json", flush=True)
            for k, v in p["semitones"].items():
                print(
                    k, v["audio_s_per_s"],
                    "share", v["resample_share_of_wall"],
                    "rel", v["rel_err_vs_golden"], flush=True,
                )
        except Exception:
            traceback.print_exc()
        resample._SEL_IMPL = "fused"
        resample._MXU_ROWS = 64
        jax.clear_caches()

    # ---- 3. N=2048 GEOM rows with the VMEM fix -----------------------
    geom = json.load(open(os.path.join(REPO, "GEOM_r05.json")))
    for ratio in (0.5, 1.0, 2.0):
        key = f"n2048_hop512_x{ratio:g}"
        print("GEOM", key, flush=True)
        try:
            r = bench.run_bench(
                seconds=3600.0, ratio=ratio, n_fft=2048, hop=512,
                iters=3, chain=4,
            )
        except Exception as e:
            traceback.print_exc()
            geom["rows"][key] = {"error": f"{type(e).__name__}: {e}"[:400]}
            continue
        geom["rows"][key] = {
            k: r[k]
            for k in (
                "value", "unit", "path", "wall_s_best", "chain",
                "roofline_audio_s_per_s", "vs_baseline",
                "allclose_rel_err", "allclose_pass",
            )
        }
        print(key, r["value"], "rel", r.get("allclose_rel_err"), flush=True)
    geom["note"] = (
        "VERDICT r04 #7: every prior artifact was N=1024/hop=256. These "
        "rows prove the framework claim at two off-canonical operating "
        "points: half-size (N=512/hop=128) and double-size (N=2048/"
        "hop=512) frames, all three canonical stretches. N=2048 needs "
        "CompilerParams(vmem_limit_bytes=100M): the half-size DFT matrix "
        "operands alone are ~18 MB, over Mosaic's 16 MB default scoped-"
        "VMEM stack limit at any tile (first r05 attempt OOM'd); "
        "_pick_tile also scales the frame tile with n_fft and overlap."
    )
    json.dump(geom, open(os.path.join(REPO, "GEOM_r05.json"), "w"), indent=1)
    print("wrote GEOM_r05.json", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
