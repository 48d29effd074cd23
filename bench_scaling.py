"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8
from N to 4N executors, evidenced in-sandbox as local[8] vs local[32] on
identical input).

Runs the CPU-bound kernel workload of bench.py at both parallelism levels
as separate spark-submit-style subprocesses (fresh JVM each), computes
    efficiency = (throughput_32 / throughput_8) / 4
and writes BENCH_SCALING.json. Run with: python bench_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_at(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # fixed, CPU-heavy synthetic workload — identical input at both sizes
    env["BENCH_SYNTH_DOCS"] = os.environ.get("BENCH_SYNTH_DOCS", "1536")
    env["BENCH_SYNTH_LEN"] = os.environ.get("BENCH_SYNTH_LEN", "8192")
    # Pin the process tree to exactly `cpus` cores: an N-executor cluster
    # has N cores *total* — without the pin, the local[N] JVM's shuffle/
    # Arrow/GC threads spill onto the idle cores and inflate the small-
    # cluster baseline, understating true scaling.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "bench.py"]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo = run_at(8)
    hi = run_at(32)
    thr_lo = lo["mp_windows_per_sec"]
    thr_hi = hi["mp_windows_per_sec"]
    eff = (thr_hi / thr_lo) / 4.0
    result = {
        "workload": "mp_kernel_synth (self-join MPX over synthetic sequences, identical input)",
        "cpus_lo": 8,
        "cpus_hi": 32,
        "windows_per_sec_lo": thr_lo,
        "windows_per_sec_hi": thr_hi,
        "wall_sec_lo": lo["queries"]["mp_kernel_synth"],
        "wall_sec_hi": hi["queries"]["mp_kernel_synth"],
        "scaling_efficiency": round(eff, 3),
        "pipeline_rolled_points_per_sec_lo": lo["rolled_points_per_sec"],
        "pipeline_rolled_points_per_sec_hi": hi["rolled_points_per_sec"],
        "full_suite_sec_lo": lo["value"],
        "full_suite_sec_hi": hi["value"],
    }
    print(json.dumps(result, indent=2))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
