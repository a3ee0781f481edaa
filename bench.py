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
    """A1 + A4: exact-dup counting and count histogram on 24-char keys.
    (The contract query folded the three histograms together in round 6;
    this headline keeps the r1-r5 plan — uniq + multiplicity histogram,
    no CC — so the timing series stays comparable.)"""
    import __spark_entry__ as e

    _force(
        e.queries()["exact_dup_counts"](spark, sf_dir)
        .groupBy("cnt").count()
    )


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


def q_webdedup_containment(spark: SparkSession, sf_dir: str) -> None:
    """End-to-end web dedup WITH the winnowing containment pass on top of
    LSH (VERDICT r4 item 7: the containment stage is a major cost center
    at 100 TB and needs a tracked perf number, not just correctness)."""
    from humid_spark.config import DedupConfig
    from humid_spark.plans.webdedup import run_web_pipeline

    res = run_web_pipeline(
        _docs_as_pages(spark, sf_dir),
        DedupConfig(minhash_scheme="kperm", use_containment=True),
    )
    _force(res.annotated)
    res.release()


_INCR_STATE: dict = {}


def q_incremental_build(spark: SparkSession, sf_dir: str) -> None:
    """Incremental tier, ingest side: build the persistent DedupIndex
    (signatures + exact collapse + initial cluster-map CC + parquet
    writes) from the corpus split doc_id % 3 != 0 — the cost paid ONCE
    per corpus, not per snapshot."""
    import tempfile

    from humid_spark.config import DedupConfig
    from humid_spark.plans.incremental import DedupIndex

    root = tempfile.mkdtemp(prefix="bench_incr_")
    _INCR_STATE["root"] = root
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index_pages = _docs_as_pages(spark, sf_dir).join(
        docs.filter(F.col("doc_id") % 3 != 0).select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
            .alias("url")
        ),
        "url",
        "semi",
    )
    _INCR_STATE["index"] = DedupIndex.build(
        index_pages, DedupConfig(minhash_scheme="kperm"), f"{root}/idx",
        with_clusters=True,
    )


def q_incremental_batch(spark: SparkSession, sf_dir: str) -> None:
    """Incremental tier, per-snapshot side: classify the doc_id % 3 == 0
    split against the on-disk index (fingerprint anti-join + asymmetric
    band join + verify) — the recurring cost at snapshot cadence.  The
    result is stashed for the cluster-update headline (the two run at the
    same cadence in production)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch_pages = _docs_as_pages(spark, sf_dir).join(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
            .alias("url")
        ),
        "url",
        "semi",
    )
    res = _INCR_STATE["index"].dedup_batch(batch_pages)
    _force(res.survivors)
    _force(res.near_pairs)
    _INCR_STATE["res"] = res


def q_incremental_cluster(spark: SparkSession, sf_dir: str) -> None:
    """Incremental tier, cluster maintenance: assign every fresh batch doc
    a persistent cluster id (within-batch pair join + cluster-map probe +
    small-graph CC) and produce the merge remap — the other recurring
    per-snapshot cost."""
    import shutil

    try:
        res = _INCR_STATE.pop("res")
        delta = _INCR_STATE["index"].cluster_batch(res)
        _force(delta.assignments)
        _force(delta.remap)
        delta.release()
        res.release()
    except BaseException:
        # failure here must not leak the temp index dir or executor
        # storage into the remaining headlines (success hands the index
        # to the delete/compact headline, which owns the teardown)
        root = _INCR_STATE.pop("root", None)
        if root:
            shutil.rmtree(root, ignore_errors=True)
        _INCR_STATE.clear()
        raise


def q_incremental_delete_compact(spark: SparkSession, sf_dir: str) -> None:
    """Incremental tier, operations: the takedown + maintenance costs a
    production index owner schedules.  Tombstones a 1-in-30 doc slice
    (identity + cluster-map scrub, versioned merge-on-read commit),
    re-runs the read path over the LIVE tombstones (uniq scan + broadcast
    anti-join), then compact() (physical fold of batch snapshots +
    tombstones + remap into one snapshot) and the post-fold read path."""
    import shutil

    try:
        idx = _INCR_STATE["index"]
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        dels = docs.filter(F.col("doc_id") % 30 == 1).select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
            .alias("url")
        )
        idx.delete(dels)                 # tombstone write (an action)
        _force(idx.uniq(spark))          # read path, live tombstones
        assert idx.compact(spark) is True  # physical fold
        _force(idx.uniq(spark))          # read path, folded
    finally:
        # unconditional teardown: end of the incremental chain
        root = _INCR_STATE.pop("root", None)
        if root:
            shutil.rmtree(root, ignore_errors=True)
        _INCR_STATE.clear()


def q_text_analytics(spark: SparkSession, sf_dir: str) -> None:
    """token/quality/lang/fingerprint over documents."""
    import __spark_entry__ as e

    _force(e.queries()["text_quality_stats"](spark, sf_dir))
    _force(e.queries()["doc_class_counts"](spark, sf_dir))


def q_minhash_sql(spark: SparkSession, sf_dir: str) -> None:
    """SQL-expression MinHash + LSH band join + exact Jaccard verify."""
    import __spark_entry__ as e

    _force(e.queries()["ngram_jaccard_pairs"](spark, sf_dir))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> None:
    """Benchmark n-gram decontamination (n=8 over the short synthetic
    docs; the library default is the GPT-3-style 13) + PII scrub over the
    documents corpus (round 6): the bench side is deduped+broadcast, the
    corpus side never shuffles for the flag."""
    import __spark_entry__ as e

    _force(e.queries()["decontaminate"](spark, sf_dir))
    _force(e.queries()["pii_scrub_stats"](spark, sf_dir))


def q_image_phash(spark: SparkSession, sf_dir: str) -> None:
    """Perceptual image dedup at corpus scale (VERDICT r5 item 8): one
    64x64 planted PPM per document (~12 KB blob; pixel = deterministic
    function of doc_id) plus a brightness-shifted copy for every 5th doc,
    decoded through the REAL stdlib codec -> aHash in one mapInPandas
    pass (blobs never shuffle) -> capped+salted band join.  Unlike the
    contract query (fixed 120 planted docs, correctness-sized), this
    scales with the corpus: 1.2x |documents| blobs at sf0.1."""
    import numpy as np
    import pandas as pd

    from humid_spark.functions.multimodal import encode_ppm, image_near_dups

    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    shifted = ids.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.lit(8).alias("shift")
    )
    plan = ids.select("doc_id", F.lit(0).alias("shift")).unionByName(shifted)

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, shift in zip(pdf["doc_id"], pdf["shift"]):
                y, x = np.mgrid[0:64, 0:64]
                base = (
                    int(did) * 31 + y * 7 + x * 3
                )[:, :, None] + np.arange(3) * 11
                px = ((base % 200) + int(shift)).clip(0, 255).astype(np.uint8)
                rows.append((f"{did}+{shift}", encode_ppm(px)))
            yield pd.DataFrame(rows, columns=["url", "blob"])

    blobs = plan.mapInPandas(gen, "url string, blob binary")
    _force(image_near_dups(blobs, blob_col="blob"))


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
    "webdedup_containment": q_webdedup_containment,
    "incremental_index_build": q_incremental_build,
    "incremental_batch_dedup": q_incremental_batch,
    "incremental_cluster_update": q_incremental_cluster,
    "incremental_delete_compact": q_incremental_delete_compact,
    "text_analytics": q_text_analytics,
    "decontaminate_pii": q_decontaminate,
    "image_phash_near_dups": q_image_phash,
    "minhash_sql_jaccard": q_minhash_sql,
    "substring_dups": q_substring_dups,
    "ann_cosine_topk": q_ann,
}


def _host_window_health() -> dict:
    """Host-window telemetry recorded INSIDE the bench JSON (VERDICT r4
    item 3): this VM's per-core grant decays with uptime (BENCH/BASELINE.md
    forensics — identical code measured 37.7s early-session vs 54-62s
    late), so cross-round comparisons are only interpretable with the
    window state attached.  The canary is a fixed single-process numpy
    OPH-kernel run (no Spark, ~2s): compare it against the same field in
    earlier BENCH_r{N}.json records — a 30-45% drop from the round's
    reference marks a decayed window, in which case the headline total is
    not comparable across rounds.  (It is also depressed while other
    load shares the box; bench normally runs alone.)"""
    out: dict = {}
    try:
        with open("/proc/uptime") as f:
            out["uptime_h"] = round(float(f.read().split()[0]) / 3600, 2)
    except OSError:
        out["uptime_h"] = None
    try:
        import random
        import time as _t

        from humid_spark.functions.signatures import oph_signatures_batch

        rng = random.Random(11)
        words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                         for _ in range(rng.randint(3, 9)))
                 for _ in range(5000)]
        texts = []
        for i in range(20_000):
            target, parts, ln = 200 + (i * 797) % 1800, [], 0
            while ln < target:
                w = words[(i * 31 + ln * 7) % len(words)]
                parts.append(w)
                ln += len(w) + 1
            texts.append(" ".join(parts))
        oph_signatures_batch(texts[:200], 5, 128)  # warm numpy
        t0 = _t.perf_counter()
        oph_signatures_batch(texts, 5, 128)
        out["canary_pages_per_sec"] = round(
            len(texts) / (_t.perf_counter() - t0), 1
        )
    except Exception as exc:
        out["canary_pages_per_sec"] = None
        out["canary_error"] = f"{type(exc).__name__}: {exc}"
    return out


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
        # suite size changes between rounds (round 5 added the two
        # incremental headlines): compare totals across rounds only over
        # the intersection of the per-query maps
        "n_queries": len(times),
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        **_host_window_health(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
