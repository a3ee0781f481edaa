"""E2E parity: Spark pipeline vs the pure-Python reference oracle.

Asserts FULL equality — membership, cluster-id numbering, representatives,
histograms, scalars — on every parity fixture, for Hamming and edit
distance, directional and maximum clustering.
"""

from __future__ import annotations

import pytest

from humid_spark.config import DedupConfig
from humid_spark.oracle import run_oracle
from humid_spark.plans.pipeline import run_pipeline
from humid_spark.sources import pages as fx
from humid_spark.sources.pages import to_spark

PARITY = DedupConfig(alphabet="ACGT")

FIXTURES = {
    "chain": fx.fx_cluster_chain,
    "chain_gap": fx.fx_cluster_chain_gap,
    "lone": fx.fx_cluster_lone,
    "word_distance": fx.fx_word_distance,
}


def _run_both(spark, rows, cfg: DedupConfig):
    ordered = sorted(rows, key=lambda r: (r["warc_ts"], r["url"]))
    oracle = run_oracle(
        [(r["url"], r["text"]) for r in ordered],
        word_length=cfg.word_length,
        mismatches=cfg.mismatches,
        use_edit=cfg.use_edit,
        maximum=cfg.max_clustering,
        alphabet=cfg.alphabet,
        pad=cfg.pad_char,
    )
    result = run_pipeline(to_spark(spark, rows), cfg)
    return oracle, result


def _assert_parity(oracle, result):
    got_annot = {
        r["url"]: r["cluster_id"] for r in result.annotated.collect()
    }
    assert got_annot == dict(oracle.annotated)

    got_dedup = {r["url"] for r in result.dedup.collect()}
    assert got_dedup == set(oracle.dedup_urls)

    got_count_hist = {
        r["multiplicity"]: r["frequency"] for r in result.count_hist.collect()
    }
    assert got_count_hist == oracle.count_hist

    got_neigh_hist = {
        r["degree"]: r["frequency"] for r in result.neigh_hist.collect()
    }
    assert got_neigh_hist == oracle.neigh_hist

    got_cluster_hist = {
        r["size"]: r["frequency"] for r in result.cluster_hist.collect()
    }
    assert got_cluster_hist == oracle.cluster_hist

    s = result.stats.collect()[0]
    assert (s["total"], s["usable"], s["unique"], s["clusters"]) == (
        oracle.total, oracle.usable, oracle.unique, len(oracle.clusters),
    )


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_parity_directional_hamming(spark, name):
    oracle, result = _run_both(spark, FIXTURES[name](), PARITY)
    _assert_parity(oracle, result)


@pytest.mark.parametrize("name", ["chain", "word_distance"])
def test_parity_max_clustering(spark, name):
    cfg = DedupConfig(alphabet="ACGT", max_clustering=True)
    oracle, result = _run_both(spark, FIXTURES[name](), cfg)
    _assert_parity(oracle, result)


def test_parity_edit_distance(spark):
    cfg = DedupConfig(alphabet="ACGT", use_edit=True)
    oracle, result = _run_both(spark, fx.fx_cluster_chain(), cfg)
    _assert_parity(oracle, result)


def test_umi_url_prefix_keys(spark):
    """URL-token key prefix (P1-P3 analogs) pins extractUMI_ semantics
    (reference tests/test_fastq.cc:9-46)."""
    from pyspark.sql import functions as F

    from humid_spark.functions.keys import extract_url_token

    df = spark.createDataFrame(
        [
            ("header_AATT",),
            ("header",),
            ("header with spaces",),
            ("header_with_many_underscores_AATT and space",),
            ("header_ignore_lowercase_umi_aatt",),
            ("header space then_underscore_AATT",),
            ("Instrument:RunID:FlowCellID:Lane:Tile:X:Y:ATCG",),
            ("Instrument:RunID:FlowCellID:Lane:Tile:X:Y more stuf",),
            ("Instrument:RunID:FlowCellID:Lane:Tile:X:Y:ATCG more_underscore",),
        ],
        "url string",
    )
    got = [
        r["tok"]
        for r in df.select(extract_url_token(F.col("url")).alias("tok")).collect()
    ]
    assert got == ["AATT", "", "", "AATT", "", "", "ATCG", "", "ATCG"]
