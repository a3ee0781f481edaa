#!/usr/bin/env python
"""One scaling-measurement run: full web-dedup pipeline end-to-end on a
pre-generated pages parquet at a given core count and MinHash scheme.
Prints one JSON line.

Invoked as a SUBPROCESS per configuration by BENCH/scaling.py so each run
gets a fresh JVM (two local masters in one process would share/skew
state)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--path", required=True)
    ap.add_argument("--scheme", default="oph", choices=["oph", "kperm"])
    args = ap.parse_args()

    from humid_spark.config import DedupConfig
    from humid_spark.plans.webdedup import run_web_pipeline
    from humid_spark.session import get_spark

    spark = get_spark(
        f"scaling-{args.scheme}-{args.cores}", cores=args.cores,
        shuffle_partitions=max(args.cores * 2, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(args.path)
    rows = pages.count()  # warm the input + JVM before timing

    t0 = time.perf_counter()
    res = run_web_pipeline(pages, DedupConfig(minhash_scheme=args.scheme))
    res.annotated.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0

    print(json.dumps({
        "cores": args.cores,
        "scheme": args.scheme,
        "rows": rows,
        "elapsed_sec": round(elapsed, 2),
        "pages_per_sec": round(rows / elapsed, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
