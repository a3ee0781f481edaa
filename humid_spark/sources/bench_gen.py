"""Distributed deterministic bench-tier pages generator.

fx_bench (sources/pages.py) builds rows on the driver — fine for 20k rows,
not for the scaling tier.  Here every row is derived purely from its id
(group = id // 3 shares a base doc; members 1,2 are edit-variants), so
generation runs as mapInPandas over spark.range(n): embarrassingly
parallel, no driver bottleneck, identical output at any parallelism.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from humid_spark.sources.pages import PAGES_SCHEMA, _doc, _edit_doc

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _row_text(i: int) -> str:
    g, m = divmod(i, 3)
    rng = random.Random(10_000_019 * g + 7)
    base = _doc(rng)
    if m == 0:
        return base
    rng2 = random.Random(10_000_019 * g + m)
    return _edit_doc(rng2, base)


def generate_pages(spark: SparkSession, n_rows: int) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            texts = [_row_text(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "url": [f"https://bench.example/{i}" for i in ids],
                    "warc_ts": [EPOCH + timedelta(seconds=int(i)) for i in ids],
                    "html": [None] * len(ids),
                    "text": texts,
                    "lang": ["en"] * len(ids),
                }
            )

    parallelism = spark.sparkContext.defaultParallelism
    return spark.range(n_rows, numPartitions=max(parallelism * 2, 8)).mapInPandas(
        gen, PAGES_SCHEMA
    )
