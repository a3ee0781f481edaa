"""Deterministic, stratified sampling for training-data curation.

`F.rand()` is seed-and-partitioning dependent — a re-run on a
repartitioned table samples a DIFFERENT subset, which poisons
reproducibility and makes incremental re-runs impossible to reconcile.
Hash-gate sampling fixes that: a row's inclusion depends only on its key
(bucket = md5(key) mod 1000), so any engine, any partitioning, any day
selects the same rows, appending a batch never re-flips earlier rows, and
raising a rate from 100 to 200 permille KEEPS the old sample (buckets are
nested: rate r selects buckets [0, r), so every smaller sample is a prefix
of every larger one — Bernoulli rates you can grow without churn).

md5 (not xxhash64) so the gate replays in any SQL engine: the DuckDB twin
is the same 12-hex-digit prefix trick the MinHash oracle already uses.
Same dual-formulation contract as functions/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sample_bucket(key: Column) -> Column:
    """[0, 1000) bucket from md5 of the key's string form — uniform,
    engine-independent, partitioning-independent."""
    h = F.substring(F.md5(key.cast("string")), 1, 12)
    return (F.conv(h, 16, 10).cast("long") % 1000).alias("bucket")


def sample_flag(key: Column, permille: Column | int) -> Column:
    """True for rows in the deterministic permille-sized sample."""
    rate = permille if isinstance(permille, Column) else F.lit(permille)
    return sample_bucket(key) < rate


def sql_sample_bucket(key: str) -> str:
    return (
        f"(cast(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 12)) "
        f"AS BIGINT) % 1000)"
    )


def sql_sample_flag(key: str, permille_expr: str) -> str:
    return f"({sql_sample_bucket(key)} < {permille_expr})"
