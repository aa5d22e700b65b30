"""STRETCH_r05.json: canonical stretch rows at 14400 s on the r05 kernel."""
import json, os, sys
REPO = "/root/repo"
sys.path.insert(0, REPO); os.chdir(REPO)
import bench

rows = {}
for ratio in (2.0, 1.0, 0.5, 1.5):
    r = bench.run_bench(seconds=14400.0, ratio=ratio, iters=3, chain=8)
    rows[f"{ratio:g}x"] = {k: r[k] for k in (
        "value", "unit", "path", "wall_s_best", "chain",
        "vs_baseline", "allclose_rel_err", "allclose_pass")}
    print(ratio, r["value"], "rel", r.get("allclose_rel_err"), r["path"], flush=True)
rec = {
 "metric": "stretch_rows_r05", "unit": "audio-s/s",
 "seconds_per_pass": 14400.0,
 "note": ("r05 canonical rows. 1.5x now rides the single fused kernel "
          "(general-hop ceil-fold OLA, landed r05) instead of the r04 "
          "semi-fused path (49,650). Gates on 60 s chip slices vs the f64 "
          "golden, on the very path timed."),
 "rows": rows,
}
json.dump(rec, open(os.path.join(REPO, "STRETCH_r05.json"), "w"), indent=1)
print("wrote STRETCH_r05.json")
