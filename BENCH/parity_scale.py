#!/usr/bin/env python
"""Scale validation of the PARITY pipeline (reference semantics path):
500k rows of planted ACGT key families -> chunk-blocked Hamming-1 join ->
CC -> exact per-component greedy replay -> global cluster ids.

Every family is 5 rows: 4 exact copies of a random 24-mer plus one
Hamming-1 mutant -> expected: one cluster per family, size 5, representative
= the 4-copy word (count 4 > 1).  Prints one JSON line with wall time and
invariant-check results."""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def gen_pages(spark, n_rows: int):
    from humid_spark.sources.pages import PAGES_SCHEMA
    from datetime import datetime, timedelta, timezone

    epoch = datetime(2026, 1, 1, tzinfo=timezone.utc)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            fam = ids // 5
            member = ids % 5
            rng_states = np.random.default_rng(0)
            # deterministic per-family word: hash-seeded generator
            words = []
            for f, m in zip(fam, member):
                r = np.random.default_rng(int(f) * 1_000_003 + 17)
                w = acgt[r.integers(0, 4, 24)]
                if m == 4:  # hamming-1 mutant at a family-chosen position
                    pos = int(r.integers(0, 24))
                    w = w.copy()
                    w[pos] = acgt[(np.where(acgt == w[pos])[0][0] + 1) % 4]
                words.append(w.tobytes().decode())
            _ = rng_states
            yield pd.DataFrame(
                {
                    "url": [f"https://parity.example/{i}" for i in ids],
                    "warc_ts": [epoch + timedelta(seconds=int(i)) for i in ids],
                    "html": [None] * len(ids),
                    "text": words,
                    "lang": ["en"] * len(ids),
                }
            )

    return spark.range(n_rows, numPartitions=64).mapInPandas(gen, PAGES_SCHEMA)


def main() -> None:
    from pyspark.sql import functions as F

    from humid_spark.config import DedupConfig
    from humid_spark.plans.pipeline import run_pipeline
    from humid_spark.session import get_spark

    n_rows = int(os.environ.get("PARITY_ROWS", "500000"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("parity-scale", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    pages = gen_pages(spark, n_rows).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    res = run_pipeline(pages, DedupConfig(alphabet="ACGT"))
    hist = {
        int(r["size"]): int(r["frequency"])
        for r in res.cluster_hist.collect()
    }
    stats = res.stats.collect()[0]
    dedup_n = res.dedup.count()
    elapsed = time.perf_counter() - t0

    n_fam = n_rows // 5
    ok_sizes = hist.get(5, 0) >= n_fam * 0.999  # base-word collisions only
    print(json.dumps({
        "rows": n_rows,
        "elapsed_sec": round(elapsed, 1),
        "pages_per_sec": round(n_rows / elapsed, 1),
        "clusters": int(stats["clusters"]),
        "unique": int(stats["unique"]),
        "size5_clusters": hist.get(5, 0),
        "expected_families": n_fam,
        "dedup_rows": dedup_n,
        "invariants_ok": bool(
            ok_sizes and abs(dedup_n - int(stats["clusters"])) == 0
        ),
    }))
    spark.stop()
    _ = F


if __name__ == "__main__":
    main()
