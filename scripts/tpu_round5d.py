"""Round-5 TPU session D — v4 resampler attribution + variant A/B.

Times, at the -7/+5 st pitch steps (3600 s audio, chain 4):
  * spans-only (the XLA superblock construction, no kernel)
  * v4 default (3-dot), v4 one-dot, v4 R=256
  * v4 with the matmul ablated (alignment + weights only — attribution)
Writes RESAMPLE_ATTR_r05.json. Run under timeout, one process.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from phase_vocoder_tpu.ops import resample
    from phase_vocoder_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = str(jax.devices()[0])
    print("device:", dev, flush=True)

    sr, seconds, chain = 16000, 3600.0, 4
    rng = np.random.default_rng(0)
    rec = {"metric": "resample_attr_r05", "device": dev, "rows": {}}

    def timed(fn, y):
        jfn = jax.jit(fn)
        float(jfn(y))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(y))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for s in (-7.0, 5.0):
        factor = 2.0 ** (s / 12.0)
        rfac = 1.0 / factor
        in_len = int(seconds * sr * factor)
        out_len = int(round(in_len * rfac))
        y = jax.device_put(
            jnp.asarray(rng.standard_normal(in_len).astype(np.float32))
        )
        row = {}

        def run_variant(name, impl, rows, onedot):
            resample._SEL_IMPL = impl
            resample._MXU_ROWS = rows
            resample._MXU_ONEDOT = onedot
            jax.clear_caches()

            def body(a):
                acc = jnp.float32(0.0)
                for j in range(chain):
                    acc = acc + jnp.sum(
                        resample._resample_strided_select(
                            a[j:], rfac, out_len - j
                        )
                    )
                return acc

            try:
                best = timed(body, y)
                row[name] = {
                    "wall_s_best": round(best, 4),
                    "msamp_per_s": round(chain * out_len / best / 1e6, 1),
                }
                print(f"{s:+g}st {name}: {row[name]['msamp_per_s']:.0f} "
                      f"Msamp/s", flush=True)
            except Exception as e:
                traceback.print_exc()
                row[name] = {"error": f"{type(e).__name__}: {e}"[:300]}

        # spans-only: the XLA superblock span construction
        def spans_body(a):
            acc = jnp.float32(0.0)
            for j in range(chain):
                cst = resample._fused_sel_consts(
                    rfac, out_len - j, in_len - j
                )
                acc = acc + jnp.sum(resample._fused_spans(a[j:], cst))
            return acc

        try:
            best = timed(spans_body, y)
            row["spans_only"] = {
                "wall_s_best": round(best, 4),
                "msamp_per_s": round(chain * out_len / best / 1e6, 1),
            }
            print(f"{s:+g}st spans_only: "
                  f"{row['spans_only']['msamp_per_s']:.0f}", flush=True)
        except Exception as e:
            traceback.print_exc()
            row["spans_only"] = {"error": str(e)[:300]}

        run_variant("mxu128", "mxu", 128, False)
        run_variant("mxu128_onedot", "mxu", 128, True)
        run_variant("mxu256", "mxu", 256, False)
        rec["rows"][f"{s:+g}st"] = row

    resample._SEL_IMPL = "mxu"
    resample._MXU_ROWS = 128
    resample._MXU_ONEDOT = False
    jax.clear_caches()
    json.dump(rec, open(os.path.join(REPO, "RESAMPLE_ATTR_r05.json"), "w"),
              indent=1)
    print("wrote RESAMPLE_ATTR_r05.json", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
