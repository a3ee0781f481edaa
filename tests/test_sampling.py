"""Deterministic sampling: partitioning invariance, nested rates, rough
uniformity, SQL parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from humid_spark.functions.sampling import (
    sample_bucket,
    sample_flag,
    sql_sample_bucket,
)


def test_sample_is_partitioning_invariant_and_nested(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    ids_1part = {
        r["k"] for r in df.coalesce(1)
        .filter(sample_flag(F.col("k"), 100)).collect()
    }
    ids_16part = {
        r["k"] for r in df.repartition(16)
        .filter(sample_flag(F.col("k"), 100)).collect()
    }
    assert ids_1part == ids_16part          # no F.rand() partition poison
    ids_300 = {
        r["k"] for r in df.filter(sample_flag(F.col("k"), 300)).collect()
    }
    assert ids_1part < ids_300              # nested: growing a rate only ADDS
    # rough uniformity: 100 permille of 2000 keys within a generous band
    assert 130 <= len(ids_1part) <= 270
    assert 450 <= len(ids_300) <= 750


def test_sample_bucket_sql_parity(spark):
    got = spark.range(0, 500).select(
        F.col("id"), sample_bucket(F.col("id")).alias("b")
    ).collect()
    con = duckdb.connect()
    want = dict(con.execute(
        f"SELECT i, {sql_sample_bucket('i')} FROM generate_series(0, 499) t(i)"
    ).fetchall())
    for r in got:
        assert r["b"] == want[r["id"]], (r["id"], r["b"], want[r["id"]])
