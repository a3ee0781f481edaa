#!/usr/bin/env python
"""Two-cluster-size scaling study (BASELINE.md protocol).

The north_rule's criterion — throughput scaling efficiency >= 0.8 from N to
4N executors — cannot use a real cluster in this sandbox; per the driver
instruction we run the IDENTICAL job on the IDENTICAL input at local[8] and
local[32] (fresh JVM per run, subprocess isolation) and report throughput
at both plus efficiency = (pages_per_sec_32 / pages_per_sec_8) / 4.

Writes BENCH/BASELINE.md and BENCH/scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

N_ROWS = int(os.environ.get("SCALING_ROWS", "6000000"))
DATA = os.environ.get(
    "SCALING_DATA",
    os.path.join(HERE, "data", f"pages_bench_{N_ROWS // 1_000_000}m"
                 if N_ROWS >= 1_000_000 else f"pages_bench_{N_ROWS}"),
)
CORES = (8, 32)


def ensure_data() -> None:
    if os.path.exists(os.path.join(DATA, "_SUCCESS")):
        return
    from humid_spark.session import get_spark
    from humid_spark.sources.bench_gen import generate_pages

    spark = get_spark("scaling-gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    generate_pages(spark, N_ROWS).write.mode("overwrite").parquet(DATA)
    spark.stop()


def run_once(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling_run.py"),
         "--cores", str(cores), "--path", DATA],
        capture_output=True, text=True, timeout=3600, check=False,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"run at {cores} cores produced no JSON:\n"
                       f"stdout={out.stdout[-2000:]}\nstderr={out.stderr[-2000:]}")


def main() -> None:
    ensure_data()
    results = {}
    for c in CORES:
        t0 = time.time()
        results[c] = run_once(c)
        print(f"[scaling] local[{c}]: {results[c]} "
              f"(wall incl. startup {time.time() - t0:.0f}s)", file=sys.stderr)

    lo, hi = CORES
    eff = (results[hi]["pages_per_sec"] / results[lo]["pages_per_sec"]) / (hi / lo)
    summary = {
        "rows": results[lo]["rows"],
        "low": results[lo],
        "high": results[hi],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "passes": eff >= 0.8,
    }
    with open(os.path.join(HERE, "scaling.json"), "w") as f:
        json.dump(summary, f, indent=1)

    md = f"""# BENCH/BASELINE.md — scaling evidence (north_rule protocol)

Job: full web-dedup pipeline (exact-collapse -> MinHash 128 perms ->
16x8 LSH -> signature verify -> connected components -> annotate sink),
identical input ({summary["rows"]:,} synthetic pages, deterministic
generator humid_spark/sources/bench_gen.py, seed-free row-derived), fresh
JVM per run via subprocess.

| parallelism | elapsed (s) | pages/sec |
|---|---|---|
| local[{lo}]  | {results[lo]["elapsed_sec"]} | {results[lo]["pages_per_sec"]} |
| local[{hi}] | {results[hi]["elapsed_sec"]} | {results[hi]["pages_per_sec"]} |

**Scaling efficiency ({lo} -> {hi} cores, 4x):**
(pages_per_sec_{hi} / pages_per_sec_{lo}) / 4 = **{summary["scaling_efficiency"]}**
(target >= 0.8: {"PASS" if summary["passes"] else "FAIL"})

Caveats: single machine (shared memory bandwidth and page cache — a real
4x-executor cluster adds network shuffle but removes memory-bandwidth
contention); local[8] still owns all 128 GiB of RAM.
"""
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
