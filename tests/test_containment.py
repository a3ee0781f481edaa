"""Containment pass: winnowing must link docs embedded verbatim in larger
docs (the fixture's contain* rows), which MinHash-LSH misses by design."""

from __future__ import annotations

from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.operators.containment import containment_pairs, winnow
from humid_spark.plans.webdedup import run_web_pipeline
from humid_spark.sources import pages as fx
from humid_spark.sources.pages import to_spark


def test_winnow_containment_property():
    inner = "the quick brown fox jumps over the lazy dog " * 8
    outer = ("unrelated filler text with many words " * 20
             + inner + " trailing filler content here " * 20)
    fi = set(winnow(inner).tolist())
    fo = set(winnow(outer).tolist())
    assert fi, "inner doc must produce fingerprints"
    share = len(fi & fo) / len(fi)
    assert share >= 0.9, f"containment share {share:.2f}"


def test_containment_pairs_on_fixture(spark):
    rows = fx.fx_webtext(n_seeds=40)
    pages = to_spark(spark, rows)
    docs = pages.select(
        F.xxhash64("url").alias("doc_id"), "text", "url"
    )
    pairs = containment_pairs(docs)
    id_of = {r["url"]: r["doc_id"] for r in docs.collect()}
    url_of = {v: k for k, v in id_of.items()}
    got = {(r["src"], r["dst"]) for r in pairs.collect()}
    linked_urls = {
        frozenset((url_of[a], url_of[b])) for a, b in got
    }
    contain_urls = [r["url"] for r in rows if "/contain" in r["url"]]
    assert contain_urls, "fixture must have containment rows"
    hit = 0
    for cu in contain_urls:
        if any(cu in pair for pair in linked_urls):
            hit += 1
    assert hit / len(contain_urls) >= 0.8, f"{hit}/{len(contain_urls)} containments found"


def test_webdedup_with_containment_clusters_inner_and_outer(spark):
    rows = fx.fx_webtext(n_seeds=40)
    cfg = DedupConfig(use_containment=True)
    res = run_web_pipeline(to_spark(spark, rows), cfg)
    cluster_of = {r["url"]: r["cluster_id"] for r in res.annotated.collect()}
    # for each contain* row, its embedded seed should share a cluster
    by_text = {r["url"]: r["text"] for r in rows}
    contain_urls = [u for u in by_text if "/contain" in u]
    hit = 0
    for cu in contain_urls:
        inner_seeds = [
            u for u, t in by_text.items()
            if "/seed" in u and t is not None and t in by_text[cu] and u != cu
        ]
        if inner_seeds and any(cluster_of[u] == cluster_of[cu] for u in inner_seeds):
            hit += 1
    assert hit / len(contain_urls) >= 0.8


def test_substring_dups_exact_semantics(spark):
    """substring_dups == all-pairs contains() for inner docs >= k+w-1 chars
    (winnowing recall-1 guarantee + exact verify); equal texts emit both
    orientations; short inners are excluded."""
    from humid_spark.operators.containment import substring_dups

    base = ("the quick brown fox jumps over the lazy dog while "
            "seventeen astronauts compile spark plans in the rain")
    rows = [
        (1, base),
        (2, "PREFIX " + base + " SUFFIX"),         # contains 1
        (3, base[10:60]),                            # 50 chars, inside 1 and 2
        (4, "completely unrelated text about databases and query optimizers everywhere"),
        (5, base),                                   # exact dup of 1
        (6, base[20:40]),                            # 20 chars < 23: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["inner_doc"], r["outer_doc"])
        for r in substring_dups(df).collect()
    }
    expected = set()
    for a, ta in rows:
        for b, tb in rows:
            if a != b and len(ta) >= 23 and ta in tb:
                expected.add((a, b))
    assert got == expected
    assert (1, 5) in got and (5, 1) in got          # both orientations
    assert all(p[0] != 6 for p in got)              # short inner excluded
