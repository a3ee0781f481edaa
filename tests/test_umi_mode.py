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


def test_peek_umi_size_measures_first_record(spark):
    """S2 probe: the token length comes from the FIRST record in doc order
    (warc_ts, url) — reference peekUMI reads exactly one record
    (src/humid.cc:24-33)."""
    from humid_spark.functions.keys import key_budget, peek_umi_size

    cfg = DedupConfig(alphabet="ACGT", url_key_prefix=True, peek_umi=True)
    pages = to_spark(spark, fx_umi_header())
    first = min(fx_umi_header(), key=lambda r: (r["warc_ts"], r["url"]))
    tok = first["url"].split(" ")[0]
    expected = 0
    for sep in ("_", ":"):
        cand = tok.rsplit(sep, 1)[-1] if sep in tok else ""
        if cand and all(c in "ACGT" for c in cand):
            expected = len(cand)
            break
    assert peek_umi_size(pages, cfg) == expected
    take_umi, take_text = key_budget(expected, cfg)
    assert take_umi == min(expected, 24) and take_umi + take_text == 24


def test_peeked_budget_poisons_invalid_tokens(spark):
    """With the peeked size fixed, EVERY row contributes exactly that many
    token chars — a row with an invalid token gets pad chars there and is
    filtered, like makeStringSize of an empty UMI (src/fastq.cc:57-66);
    the lenient umi_size=None mode instead falls back to text-only keys."""
    cfg = DedupConfig(alphabet="ACGT", url_key_prefix=True)
    pages = to_spark(spark, fx_umi_header())
    keyed = with_key_columns(pages, cfg, umi_size=4)
    rows = {r["url"].split("/")[-2]: r for r in keyed.collect()}
    text = rows["plain"]["text"]

    # valid 4-char tokens: token + first 20 text chars, usable
    assert rows["u_AATT"]["key"] == "AATT" + text[:20]
    assert rows["u_AATT"]["usable"]
    assert rows["uc"]["key"] == "ATCG" + text[:20]
    # invalid tokens ('' after extraction) are padded -> poisoned
    assert rows["u_aatt"]["key"] == "NNNN" + text[:20]
    assert not rows["u_aatt"]["usable"]
    assert not rows["u_ATCGN"]["usable"]
    assert not rows["plain"]["usable"]

    # umi_size=0 (no UMI in the first record) == text-only keys
    keyed0 = with_key_columns(pages, cfg, umi_size=0)
    for r in keyed0.collect():
        assert r["key"] == text[:24]


def test_peek_umi_requires_url_prefix():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        DedupConfig(peek_umi=True)
