#!/usr/bin/env python
"""Dump .explain('formatted') for the headline bench query graphs to
plans/r07/<query>_<tag>.txt (tag = before/after).

Usage: python BENCH/plan_dump.py <tag> [query ...]

Covers the same query surface bench.py times (the round-7 optimization
targets): contract queries are taken from __spark_entry__.queries(), the
pipeline headlines (webdedup/incremental/image) explain their terminal
DataFrame.  Pure plan generation — nothing is executed except the tiny
eager materializations the plans themselves contain (localCheckpoint /
index build), so a dump does not perturb bench numbers.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from humid_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as e

    qs = e.queries()
    targets: dict[str, object] = {}

    def add(name, thunk):
        if not only or name in only:
            try:
                targets[name] = thunk()
            except Exception as exc:  # noqa: BLE001
                targets[name] = f"PLAN ERROR: {type(exc).__name__}: {exc}"

    pages = bench._docs_as_pages(spark, sf_dir)

    # contract queries the bench times directly
    for cq in ("exact_dup_counts", "annotate", "annotate_n12",
               "substring_dups", "text_quality_stats", "doc_class_counts",
               "ngram_jaccard_pairs", "decontaminate", "pii_scrub_stats"):
        add(cq, lambda cq=cq: qs[cq](spark, sf_dir))

    # pipeline headlines
    from humid_spark.config import DedupConfig
    from humid_spark.plans.webdedup import run_web_pipeline

    def web(scheme, containment=False):
        res = run_web_pipeline(
            pages, DedupConfig(minhash_scheme=scheme,
                               use_containment=containment)
        )
        return res.annotated

    add("webdedup_minhash_lsh", lambda: web("kperm"))
    add("webdedup_oph", lambda: web("oph"))
    add("webdedup_containment", lambda: web("kperm", True))

    def image():
        from humid_spark.functions.multimodal import image_near_dups

        ids = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id").limit(2000)
        blobs = ids.select(
            F.concat(F.col("doc_id").cast("string")).alias("url"),
            F.col("doc_id").cast("string").cast("binary").alias("blob"),
        )
        return image_near_dups(blobs, blob_col="blob")

    add("image_phash_near_dups", image)

    def ann():
        from humid_spark.operators.ann import cosine_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return cosine_topk(emb, emb.filter(F.col("vec_id") < 50), k=10)

    add("ann_cosine_topk", ann)

    for name, df in targets.items():
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            if isinstance(df, str):
                f.write(df + "\n")
            else:
                f.write(_plan(df))
        print("wrote", path)

    spark.stop()


if __name__ == "__main__":
    main()
