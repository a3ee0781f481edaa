"""Structured-Streaming incremental exact dedup.

The reference is a bounded batch tool (SURVEY.md §2.12: no streaming
operators), and so is the main engine; this module is the incremental-
ingest story a web-scale crawl pipeline needs: new pages arrive
continuously, exact duplicates (by content fingerprint) must be dropped
within a watermark window, and downstream near-dup batch jobs consume the
deduped stream output.

Two tiers:
- `streaming_exact_dedup`: the built-in stateful operator
  (`dropDuplicatesWithinWatermark`) — state store partitioning scales with
  shuffle partitions; no custom state.
- `stateful_first_seen`: a CUSTOM stateful operator via
  `applyInPandasWithState` for what the built-in can't express — per-key
  duplicate counters carried across micro-batches and the first-seen
  payload emitted exactly once per key.  State is (count,) per
  fingerprint; keys partition across the state store like any groupBy.
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


def stateful_first_seen(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Custom stateful streaming dedup: emit each content fingerprint's
    FIRST row (by (ts, url) within the batch / by arrival across batches)
    exactly once, while counting subsequent duplicates in per-key state.

    applyInPandasWithState: the custom-state surface for semantics the
    built-in operators can't express (dup counters surviving micro-batch
    boundaries, first-seen payload).  Output rows appear only in the batch
    where a key is first seen; later batches only bump the state counter.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        n_new = 0
        first = None
        # A hot key's micro-batch data arrives as MULTIPLE pandas chunks
        # (Arrow batch size, default 10k rows) — track the running
        # (ts, url) minimum across ALL of them, not just the first chunk.
        for pdf in pdfs:
            if len(pdf):
                cand = pdf.loc[pdf.sort_values([ts_col, url_col]).index[0]]
                if first is None or (
                    (cand[ts_col], cand[url_col])
                    < (first[ts_col], first[url_col])
                ):
                    first = cand
            n_new += len(pdf)
        if state.exists:
            (n,) = state.get
            state.update((n + n_new,))
            return
        state.update((n_new,))
        yield pd.DataFrame(
            [
                {
                    "fp": key[0],
                    "url": first[url_col],
                    ts_col: first[ts_col],
                    "n_dups": n_new - 1,
                }
            ]
        )

    keyed = stream.withColumn("fp", fingerprint(F.col(text_col)))
    return keyed.groupBy("fp").applyInPandasWithState(
        track,
        outputStructType=f"fp string, url string, {ts_col} timestamp, n_dups long",
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
