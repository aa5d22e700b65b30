"""Assemble SCALING_r04.json from its three measurement parts.

  1. CPU-mesh weak-scaling rows      (bench.py --scaling, PVOC_PLATFORM=cpu)
  2. CPU-mesh collectives A/B        (utils.scaling.collectives_ablation_report)
  3. chip-side per-chip denominator  (scripts/tpu_round4.py --sections scaling
                                      -> SCALING_CHIP_r04.json)

Runs parts 1-2 itself (CPU only; pass --skip-cpu to reuse committed
partials) and merges with the chip part if present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds-per-device", type=float, default=120.0)
    ap.add_argument("--ablation-seconds", type=float, default=480.0)
    ap.add_argument("--skip-cpu", action="store_true")
    args = ap.parse_args(argv)

    out = {"metric": "scaling_r04"}

    cpu_part = os.path.join(REPO, "SCALING_CPU_r04.json")
    if args.skip_cpu and os.path.exists(cpu_part):
        with open(cpu_part) as f:
            cpu = json.load(f)
    else:
        os.environ.setdefault("PVOC_PLATFORM", "cpu")
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        from phase_vocoder_tpu.utils.scaling import (
            collectives_ablation_report,
            scaling_report,
        )

        weak = scaling_report(seconds_per_dev=args.seconds_per_device)
        print("weak rows done", flush=True)
        ab = collectives_ablation_report(seconds=args.ablation_seconds)
        print("collectives A/B done:", ab["collective_share_of_wall"],
              flush=True)
        cpu = {"weak_scaling": weak, "collectives_ablation": ab}
        with open(cpu_part, "w") as f:
            json.dump(cpu, f, indent=1)

    out.update(cpu)

    chip_part = os.path.join(REPO, "SCALING_CHIP_r04.json")
    if os.path.exists(chip_part):
        with open(chip_part) as f:
            out["chip_denominator"] = json.load(f)

    out["efficiency_argument"] = (
        "Real N>=2 hardware is absent (one chip behind the tunnel), so the "
        ">=80% target is argued from measurements: (a) the collectives "
        "inside the identical chunked shard_map program cost "
        "collectives_ablation.collective_share_of_wall of wall time on the "
        "8-device virtual mesh (an upper bound: host-thread collectives "
        "are far slower relative to compute than ICI); (b) per-device "
        "collective volume is constant (~17 KB) and independent of D and "
        "audio length while per-device compute grows with the chunk span; "
        "(c) the chip-side denominator (chunked program forced onto a "
        "1-device mesh) shows what fraction of monolithic throughput the "
        "sharded program retains per chip."
    )
    with open(os.path.join(REPO, "SCALING_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("[wrote SCALING_r04.json]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
