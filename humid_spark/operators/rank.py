"""Scalable global dense ranking without a single-partition window.

`Window.orderBy(col)` with no partitioning funnels every row through ONE
task — fine for fixtures, fatal at web scale.  Instead: range-repartition by
the order column, sort within partitions, compute per-partition counts once
(tiny collect), and add `offset + local_row_number` via mapInPandas using
TaskContext.partitionId().  Two shuffle-free passes over a checkpointed
range-partitioned layout.

Used for the reference's sequential cluster-id numbering (ids 1,2,... in
seed walk order, src/humid.cc:177-187) over arbitrarily many clusters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame, order_col: str, rank_col: str, start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append `rank_col` = 1-based position of each row when the whole
    DataFrame is sorted by `order_col`.  Rows must be unique on `order_col`
    (callers rank distinct cluster seeds)."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    arranged = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .localCheckpoint(eager=True)   # freeze range bounds for both passes
    )
    sizes = {
        r["pid"]: r["cnt"]
        for r in arranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = start
    for pid in range(n):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)

    schema = df.schema.add(rank_col, "long", False)

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, start)
        for pdf in batches:
            out = pdf.copy()
            out[rank_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield out

    return arranged.mapInPandas(add_rank, schema)
