"""Round-5 TPU session E — trimmed-span v4 timing + pitch row refresh.

RESAMPLE_ATTR_r05 showed span construction = ~77% of resample wall; v4
now builds only smax+Wk lanes (~2.3x fewer span bytes). Re-time the
resampler at -7/+5 st, append to RESAMPLE_ATTR_r05.json, and re-run the
non-octave pitch rows into PITCH_r05.json.
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
    print("device:", jax.devices()[0], flush=True)

    sr, seconds, chain = 16000, 3600.0, 4
    rng = np.random.default_rng(0)
    attr = json.load(open(os.path.join(REPO, "RESAMPLE_ATTR_r05.json")))

    for s in (-7.0, 5.0):
        factor = 2.0 ** (s / 12.0)
        rfac = 1.0 / factor
        in_len = int(seconds * sr * factor)
        out_len = int(round(in_len * rfac))
        y = jax.device_put(
            jnp.asarray(rng.standard_normal(in_len).astype(np.float32))
        )

        def body(a):
            acc = jnp.float32(0.0)
            for j in range(chain):
                acc = acc + jnp.sum(
                    resample._resample_strided_select(
                        a[j:], rfac, out_len - j
                    )
                )
            return acc

        fn = jax.jit(body)
        float(fn(y))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(y))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        msps = round(chain * out_len / best / 1e6, 1)
        attr["rows"][f"{s:+g}st"]["mxu128_trimmed_spans"] = {
            "wall_s_best": round(best, 4),
            "msamp_per_s": msps,
        }
        print(f"{s:+g}st trimmed: {msps:.0f} Msamp/s", flush=True)

    attr["note"] = (
        "spans_only rows: the XLA superblock span construction alone — "
        "77% of the full v4 wall at full nr*stride width, which made it "
        "the binding stage. mxu128_trimmed_spans rows: v4 after capping "
        "construction at the smax+Wk lanes the kernel actually reads."
    )
    json.dump(attr, open(os.path.join(REPO, "RESAMPLE_ATTR_r05.json"), "w"),
              indent=1)
    print("wrote RESAMPLE_ATTR_r05.json", flush=True)

    # refresh the four non-octave pitch rows with the trimmed-span v4
    try:
        p_old = json.load(open(os.path.join(REPO, "PITCH_r05.json")))
        p_new = bench.run_pitch_bench(semitones=(-7.0, -5.0, 5.0, 7.0))
        p_old["semitones"].update(p_new["semitones"])
        p_old["resampler"] = "mxu128 trimmed-spans"
        json.dump(
            p_old, open(os.path.join(REPO, "PITCH_r05.json"), "w"), indent=1
        )
        print("wrote PITCH_r05.json", flush=True)
        for k, v in p_new["semitones"].items():
            print(k, v["audio_s_per_s"], "share",
                  v["resample_share_of_wall"], "rel",
                  v["rel_err_vs_golden"], flush=True)
    except Exception:
        traceback.print_exc()
    return 0


if __name__ == "__main__":
    sys.exit(main())
