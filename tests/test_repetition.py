"""Repetition signals: hand-computed values on crafted strings, Spark vs
the DuckDB formulation (the same parity bar as the rest of textstats)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from humid_spark.functions import textstats as ts

CASES = [
    # (text, dup3, top2, word_len) hand-computed
    ("a b c d e", 0, 250, 1000),        # 3 distinct 3-grams; 4 distinct
                                        # 2-grams each 1/4; 5 chars/5 words
    ("x y x y x y", 500, 600, 1000),    # 4 3-grams, 2 distinct -> 500;
                                        # "x y" 3 of 5 2-grams -> 600
    ("spam spam spam spam", 500, 1000, 4000),  # "spam spam" all 3 2-grams
    ("ab", 0, 0, 2000),                 # below n: no grams -> 0
    ("", 0, 0, 0),
    (None, 0, 0, 0),                    # NULL text -> 0, never NULL
]


def test_repetition_hand_values(spark):
    df = spark.createDataFrame([(t,) for t, *_ in CASES], "text string")
    got = df.select(
        "text",
        ts.dup_ngram_permille(F.col("text")).alias("d"),
        ts.top_ngram_share_permille(F.col("text")).alias("t2"),
        ts.mean_word_len_permille(F.col("text")).alias("w"),
    ).collect()
    by_text = {r["text"]: (r["d"], r["t2"], r["w"]) for r in got}
    for text, d, t2, w in CASES:
        assert by_text[text] == (d, t2, w), (text, by_text[text])


def test_repetition_sql_parity(spark):
    con = duckdb.connect()
    for text, *_ in CASES:
        sd, st2, sw = spark.createDataFrame([(text,)], "text string").select(
            ts.dup_ngram_permille(F.col("text")),
            ts.top_ngram_share_permille(F.col("text")),
            ts.mean_word_len_permille(F.col("text")),
        ).first()
        row = con.execute(
            f"SELECT {ts.sql_dup_ngram_permille('text')}, "
            f"{ts.sql_top_ngram_share_permille('text')}, "
            f"{ts.sql_mean_word_len_permille('text')} "
            f"FROM (SELECT ? AS text)", [text]
        ).fetchone()
        assert (sd, st2, sw) == row, (text, (sd, st2, sw), row)
