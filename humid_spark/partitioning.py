"""Scale-adaptive input spreading.

The optimization guide's input-skew rule (§2.5): one huge unsplittable
input (a single-row-group parquet file, a gzip member) leaves the scan —
and every narrow operator chained onto it, including expensive Arrow UDF
stages — running on one or two cores regardless of cluster size.  The fix
is a repartition IMMEDIATELY after the read, but only in that degenerate
case: on a well-partitioned production corpus the same repartition would
be a pure extra shuffle of the payload.

``spread`` makes the call from plan metadata (no job runs): repartition to
the session's default parallelism only when the current partitioning
cannot keep at least half the cores busy.  Row values, aggregation
results and sampling gates are all partition-independent in this engine,
so spreading never changes what a query computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_gain: int = 2) -> DataFrame:
    """Repartition ``df`` to the default parallelism iff its current plan
    yields fewer than ``parallelism / min_gain`` partitions.  Driver-side
    metadata only — no action is triggered."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - unplannable frames pass through
        return df
    if nparts * min_gain > target:
        return df
    return df.repartition(target)
