"""URL-token key-prefix mode (the reference's header-UMI path, P1-P3):
fx_umi_header pins that valid [ACGT]+ url suffixes contribute the key prefix
and invalid ones fall back to text-only keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.functions.keys import with_key_columns
from humid_spark.sources.pages import fx_umi_header, to_spark


def test_url_prefix_key_construction(spark):
    cfg = DedupConfig(alphabet="ACGT", url_key_prefix=True)
    pages = to_spark(spark, fx_umi_header())
    keyed = with_key_columns(pages, cfg)
    rows = {r["url"]: r for r in keyed.collect()}

    def hint(u):
        return u.split("/")[-2]

    by_hint = {hint(u): r for u, r in rows.items()}
    text = by_hint["plain"]["text"]

    # valid _AATT suffix -> key = AATT + first 20 text chars
    assert by_hint["u_AATT"]["key"] == ("AATT" + text)[:24]
    # valid :ATCG suffix -> key = ATCG + text
    assert by_hint["uc"]["key"] == ("ATCG" + text)[:24]
    # lowercase and N-containing suffixes are invalid -> text-only key
    assert by_hint["u_aatt"]["key"] == text[:24]
    assert by_hint["u_ATCGN"]["key"] == text[:24]
    assert by_hint["plain"]["key"] == text[:24]
    # all keys stay usable (pure ACGT)
    assert all(r["usable"] for r in rows.values())
    _ = F
