"""Benchmark decontamination: hand-built overlap topology, hashed-vs-
string join equivalence, full-schema survivor semantics, and the
broadcast plan shape (the bench side must be the build side — the corpus
never shuffles for the flag)."""

from __future__ import annotations

from pyspark.sql import functions as F

from humid_spark.operators.decontam import contamination_stats, decontaminate

# 5-token prompts; n=3 grams.  doc 1 contains prompt A verbatim, doc 2
# contains a 4-token infix of prompt B ("over the lazy dog" -> 2 shared
# grams: "over the lazy" and "the lazy dog"), doc 3 repeats a matching
# gram twice (distinct-count must still say 1), doc 4 is clean, doc 5 is
# NULL text, doc 6 is too short for any 3-gram.
DOCS = [
    (1, "x y the quick brown fox jumps z"),
    (2, "intro over the lazy dog outro"),
    (3, "the quick brown pad pad the quick brown"),
    (4, "totally unrelated clean document text here"),
    (5, None),
    (6, "two words"),
]
BENCH = [
    ("the quick brown fox jumps",),
    ("walks over the lazy dog",),
]
# doc -> (matched_3grams, contaminated)
EXPECT = {
    1: (3, True),   # all 3 grams of prompt A
    2: (2, True),   # 'over the lazy' + 'the lazy dog'
    3: (1, True),   # 'the quick brown', deduped within the doc
    4: (0, False),
    5: (0, False),
    6: (0, False),
}


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    return docs, bench


def test_contamination_stats_hand_topology(spark):
    docs, bench = _frames(spark)
    got = {
        r["doc_id"]: (r["matched_ngrams"], r["contaminated"])
        for r in contamination_stats(docs, bench, n=3).collect()
    }
    assert got == EXPECT


def test_hashed_join_matches_string_join(spark):
    docs, bench = _frames(spark)
    plain = contamination_stats(docs, bench, n=3).collect()
    hashed = contamination_stats(docs, bench, n=3, hashed=True).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, hashed))


def test_decontaminate_keeps_full_schema(spark):
    docs, bench = _frames(spark)
    out = decontaminate(docs, bench, n=3)
    assert out.columns == docs.columns
    assert sorted(r["doc_id"] for r in out.collect()) == [4, 5, 6]
    # hashed path drops the same docs
    out_h = decontaminate(docs, bench, n=3, hashed=True)
    assert sorted(r["doc_id"] for r in out_h.collect()) == [4, 5, 6]


def test_bench_side_is_broadcast(spark):
    import re

    docs, bench = _frames(spark)
    plan = contamination_stats(docs, bench, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    # the gram join builds on the bench side, so the corpus gram stream
    # feeds a BroadcastHashJoin directly and never hash-partitions.  The
    # only legitimate exchanges: doc_id aggregation/join exchanges, plus
    # at most one gram exchange — the eval-set-sized bench-side
    # distinct() inside the broadcast subtree.
    assert "BroadcastHashJoin" in plan
    ex_cols = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert all(c in ("doc_id", "g") for c in ex_cols), ex_cols
    assert ex_cols.count("g") <= 1, plan


def test_prompt_tokenization_is_case_insensitive(spark):
    docs = spark.createDataFrame(
        [(1, "THE QUICK BROWN FOX JUMPS")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(BENCH, "text string")
    row = contamination_stats(docs, bench, n=3).collect()[0]
    assert row["contaminated"] and row["matched_ngrams"] == 3
