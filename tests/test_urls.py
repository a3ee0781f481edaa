"""URL canonicalization: hand-expected results + Spark/DuckDB parity on a
battery of messy URLs (the Java-regex vs RE2 replacement-syntax split is
exactly the kind of thing only a battery catches)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from humid_spark.functions.urls import canonical_url, sql_canonical_url

CASES = [
    ("HTTP://Example.COM:80/Path/To?x=1#frag", "http://example.com/Path/To?x=1"),
    ("https://Host.org:443/", "https://host.org"),
    ("https://host.org:8443/a", "https://host.org:8443/a"),  # non-default kept
    ("http://a.b/p?utm_source=f&id=3&utm_medium=m", "http://a.b/p?id=3"),
    ("http://a.b/p?utm_source=f", "http://a.b/p"),
    ("http://a.b/p?gclid=xyz&fbclid=q&k=v", "http://a.b/p?k=v"),
    ("http://a.b/dir///", "http://a.b/dir"),
    # trailing-slash rule is PATH-scoped: a query value ending in '/' is a
    # different key (never merged); path slashes before '?' still collapse
    ("http://a.b/login?next=/home/", "http://a.b/login?next=/home/"),
    ("http://a.b/dir/?k=v", "http://a.b/dir?k=v"),
    ("HTTPS://UPPER.CASE/MiXeD/path", "https://upper.case/MiXeD/path"),
    ("http://plain.com/x?a=1&b=2", "http://plain.com/x?a=1&b=2"),
    # schemeless keys pass through UNCHANGED (round 6): the old behavior
    # glued '://' onto empty scheme/host extracts, garbling every
    # non-URL doc key that flows through canonicalize_urls
    ("example.com/Path?utm_source=f", "example.com/Path?utm_source=f"),
    ("just-an-opaque-doc-key-42", "just-an-opaque-doc-key-42"),
    ("", ""),
]


def test_canonical_url_hand_values(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    }
    for url, want in CASES:
        assert got[url] == want, (url, got[url], want)


def test_canonical_url_sql_parity(spark):
    con = duckdb.connect()
    for url, want in CASES:
        (row,) = con.execute(
            f"SELECT {sql_canonical_url('url')} FROM (SELECT ? AS url)", [url]
        ).fetchone()
        assert row == want, (url, row, want)


def test_canonicalize_urls_pipeline_flag(spark):
    """cfg.canonicalize_urls collapses variant fetches into ONE doc before
    ids are assigned — with the flag the two variant rows form a single
    exact-dup group; without it they are two docs."""
    from datetime import datetime

    from humid_spark.config import DedupConfig
    from humid_spark.plans.webdedup import run_web_pipeline
    from humid_spark.sources.pages import PAGES_SCHEMA

    text = "the same page body fetched twice through drifting urls " * 3
    ts = datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [("HTTP://Site.COM:80/a?utm_source=f", ts, None, text, "en"),
         ("http://site.com/a", ts, None, text, "en"),
         ("http://other.com/b", ts, None, "completely different body here",
          "en")],
        PAGES_SCHEMA,
    )
    on = run_web_pipeline(pages, DedupConfig(canonicalize_urls=True))
    assert on.docs.select("doc_id").distinct().count() == 2
    assert {r["count"] for r in on.uniq.collect()} == {2, 1}
    # the dedup sink emits ONE row per cluster even though two variant
    # rows share the rep doc_id (the doc_id-only semi join regression)
    assert on.dedup.count() == 2
    on.release()
    off = run_web_pipeline(pages, DedupConfig())
    assert off.docs.select("doc_id").distinct().count() == 3
    off.release()
