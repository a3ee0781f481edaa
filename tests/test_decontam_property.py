"""Property test: contamination_stats equals a naive pure-python n-gram
overlap for arbitrary token soups (both join modes).

The example tests pin a hand topology; hypothesis searches the space of
overlap structures — shared grams at doc boundaries, repeated grams
within one doc, prompts shorter than n, empty docs.  One Spark job per
example, so examples are bounded and deadline-free."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from humid_spark.operators.decontam import contamination_stats

# tiny vocabulary so gram collisions — the interesting structure — are
# dense; lowercase only (tokenization lowercases anyway)
_word = st.sampled_from(["a", "b", "c", "dd", "ee"])
_text = st.lists(_word, max_size=12).map(" ".join)


def _grams(text: str, n: int) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_text, min_size=1, max_size=6),
    bench=st.lists(_text, max_size=3),
    n=st.integers(min_value=1, max_value=3),
    hashed=st.booleans(),
)
def test_contamination_matches_naive(spark, docs, bench, n, hashed):
    bgrams = set().union(*(_grams(p, n) for p in bench)) if bench else set()
    want = {
        i: len(_grams(t, n) & bgrams) for i, t in enumerate(docs)
    }
    ddf = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(p,) for p in bench], "text string"
    ) if bench else spark.createDataFrame([], "text string")
    got = {
        r["doc_id"]: r["matched_ngrams"]
        for r in contamination_stats(ddf, bdf, n, hashed=hashed).collect()
    }
    assert got == want
