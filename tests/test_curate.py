"""Curation pipeline surface: tier composition, funnel identities,
deterministic sampling reproducibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.functions.sampling import sample_flag
from humid_spark.functions.textstats import quality_class
from humid_spark.plans.curate import run_curation_pipeline
from humid_spark.sources.pages import fx_webtext, to_spark


def test_curation_funnel_identities(spark):
    pages = to_spark(spark, fx_webtext(n_seeds=25))
    res = run_curation_pipeline(
        pages, DedupConfig(), sample_rates={"noisy": 700}
    )
    f = {r["metric"]: r["value"] for r in res.funnel().collect()}
    n = pages.count()
    assert f["n_input"] == n
    # the quality gate drops exactly the 'short' rows
    n_short = pages.filter(
        quality_class(F.col("text")) == "short"
    ).count()
    assert f["quality_removed"] == n_short
    # tiers chain: what the sample kept is what the dedup stage ingested
    assert (f["n_input"] - f["quality_removed"] - f["sample_removed"]
            == res.sampled.count())
    # web-funnel rows ride along and agree with the kept output
    assert f["kept"] == res.kept.count()
    assert f["total_usable"] <= res.sampled.count()
    res.release()


def test_curation_decontamination_tier(spark):
    pages = to_spark(spark, fx_webtext(n_seeds=15))
    # bench prompts sliced verbatim from two sampled seed pages: those
    # pages (and their near-dup variants sharing the 13-gram) must fall
    # at the decontamination tier, everything else must survive intact
    base = run_curation_pipeline(pages, DedupConfig())
    # fixture urls are https://fx-webtext.example/<hint>/<i>: match the
    # seed hints as path segments and prove the plant is non-empty (an
    # empty donor set would make every assertion below pass vacuously)
    donors = base.sampled.filter(
        F.col("url").contains("/seed3/") | F.col("url").contains("/seed7/")
    )
    donor_urls = {r["url"] for r in donors.select("url").collect()}
    assert len(donor_urls) == 2, donor_urls
    bench = donors.select(
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.col("text")), r"\s+"), 5, 20)
        ).alias("text")
    )
    res = run_curation_pipeline(pages, DedupConfig(), bench=bench)
    f = {r["metric"]: r["value"] for r in res.funnel().collect()}
    assert f["contaminated_removed"] >= 2  # at least the two donors
    assert res.clean.count() == res.sampled.count() - f["contaminated_removed"]
    surviving = {r["url"] for r in res.clean.select("url").collect()}
    assert not (donor_urls & surviving), "donor pages survived"
    # no-bench runs are unchanged: clean == sampled, tier count 0
    fb = {r["metric"]: r["value"] for r in base.funnel().collect()}
    assert fb["contaminated_removed"] == 0
    base.release()
    res.release()


def test_curation_sample_is_reproducible(spark):
    pages = to_spark(spark, fx_webtext(n_seeds=20))
    a = run_curation_pipeline(pages, DedupConfig(),
                              sample_rates={"noisy": 500})
    b = run_curation_pipeline(pages.repartition(16), DedupConfig(),
                              sample_rates={"noisy": 500})
    ua = {r["url"] for r in a.sampled.select("url").collect()}
    ub = {r["url"] for r in b.sampled.select("url").collect()}
    assert ua == ub  # partitioning-independent gate
    # nested: a larger noisy rate keeps a superset
    c = run_curation_pipeline(pages, DedupConfig(),
                              sample_rates={"noisy": 900})
    uc = {r["url"] for r in c.sampled.select("url").collect()}
    assert ua <= uc
    for r in (a, b, c):
        r.release()
    _ = sample_flag  # referenced for readers; gate logic lives in curate
