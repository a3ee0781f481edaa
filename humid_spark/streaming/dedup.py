"""Structured-Streaming incremental exact dedup.

The reference is a bounded batch tool (SURVEY.md §2.12: no streaming
operators), and so is the main engine; this module is the incremental-
ingest story a web-scale crawl pipeline needs: new pages arrive
continuously, exact duplicates (by content fingerprint) must be dropped
within a watermark window, and downstream near-dup batch jobs consume the
deduped stream output.

Uses only built-in stateful operators (`dropDuplicatesWithinWatermark`) —
state store partitioning scales with shuffle partitions; no custom state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from humid_spark.functions.textstats import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """pages stream -> stream with exact-duplicate rows (same normalized
    text fingerprint) dropped; late arrivals beyond the watermark are
    handled by the engine's state eviction."""
    return (
        stream.withColumn("fp", fingerprint(F.col("text")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
    )
