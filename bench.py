#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a noop write (full execution, no driver collect
bottleneck).  The scaling study (local[8] vs local[32], BASELINE.md
two-cluster-size rule) lives in BENCH/scaling.py — this file is the
single-config throughput snapshot the driver records per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _docs_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> None:
    """A1 + A4: exact-dup counting and count histogram on 24-char keys."""
    import __spark_entry__ as e

    _force(e.queries()["count_histogram"](spark, sf_dir))


def q_hamming_cc(spark: SparkSession, sf_dir: str) -> None:
    """J1 + G1 + K2: Hamming-1 chunk join, connected components, annotate."""
    import __spark_entry__ as e

    _force(e.queries()["annotate"](spark, sf_dir))


def q_hamming_cc_n12(spark: SparkSession, sf_dir: str) -> None:
    """Same chain at n=12 keys, where real Hamming-1 edges exist — the CC
    and representative stages actually merge (the n=24 run is edge-free on
    this corpus)."""
    import __spark_entry__ as e

    _force(e.queries()["annotate_n12"](spark, sf_dir))


def q_substring_dups(spark: SparkSession, sf_dir: str) -> None:
    """Exact substring duplicates: winnowing candidates + contains verify."""
    import __spark_entry__ as e

    _force(e.queries()["substring_dups"](spark, sf_dir))


def q_webdedup(spark: SparkSession, sf_dir: str) -> None:
    """Engine mode end-to-end: MinHash(128) -> LSH -> verify -> CC -> dedup.
    Scheme pinned to kperm explicitly (NOT the config default) so this
    headline stays comparable across rounds independent of which scheme
    ships as the default."""
    from humid_spark.config import DedupConfig
    from humid_spark.plans.webdedup import run_web_pipeline

    res = run_web_pipeline(
        _docs_as_pages(spark, sf_dir), DedupConfig(minhash_scheme="kperm")
    )
    _force(res.annotated)
    res.release()


def q_webdedup_oph(spark: SparkSession, sf_dir: str) -> None:
    """Same end-to-end chain with the OPH signature scheme (the
    absolute-throughput path; chunked cache-resident kernel)."""
    from humid_spark.config import DedupConfig
    from humid_spark.plans.webdedup import run_web_pipeline

    res = run_web_pipeline(
        _docs_as_pages(spark, sf_dir), DedupConfig(minhash_scheme="oph")
    )
    _force(res.annotated)
    res.release()


def q_text_analytics(spark: SparkSession, sf_dir: str) -> None:
    """token/quality/lang/fingerprint over documents."""
    import __spark_entry__ as e

    _force(e.queries()["text_stats"](spark, sf_dir))
    _force(e.queries()["quality_class_counts"](spark, sf_dir))


def q_minhash_sql(spark: SparkSession, sf_dir: str) -> None:
    """SQL-expression MinHash + LSH band join + exact Jaccard verify."""
    import __spark_entry__ as e

    _force(e.queries()["ngram_jaccard_pairs"](spark, sf_dir))


def q_ann(spark: SparkSession, sf_dir: str) -> None:
    """Brute-force cosine top-k, 50 queries over the embeddings corpus."""
    from humid_spark.operators.ann import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _force(cosine_topk(emb, emb.filter(F.col("vec_id") < 50), k=10))


QUERIES = {
    "exact_dedup": q_exact_dedup,
    "hamming_cc_annotate": q_hamming_cc,
    "hamming_cc_annotate_n12": q_hamming_cc_n12,
    "webdedup_minhash_lsh": q_webdedup,
    "webdedup_oph": q_webdedup_oph,
    "text_analytics": q_text_analytics,
    "minhash_sql_jaccard": q_minhash_sql,
    "substring_dups": q_substring_dups,
    "ann_cosine_topk": q_ann,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from humid_spark.session import get_spark

    spark = get_spark("humid_spark-bench", cores=cpus,
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/Python workers so q1 doesn't pay startup costs
    spark.range(1_000_000).select(F.sum("id")).collect()

    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir)
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
