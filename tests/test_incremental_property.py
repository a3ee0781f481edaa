"""Property test: cross_band_pairs equals the naive batch-x-index pair set
for ARBITRARY bucket layouts, across cap/salt settings.

The example-based tests pin specific hot/cold/demoted shapes; hypothesis
searches the space of layouts (duplicate memberships, buckets hit by only
one side, many-band rows, salt-threshold boundary sizes).  One Spark job
per example, so examples are bounded and deadline-free."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from humid_spark.operators.incremental import cross_band_pairs

# (doc_id, band, bucket) rows: few distinct bands/buckets so collisions —
# the interesting structure — are dense
_row = st.tuples(
    st.integers(min_value=0, max_value=30),   # doc id (offset per side)
    st.integers(min_value=0, max_value=2),    # band
    st.integers(min_value=0, max_value=3),    # bucket
)


def _naive(batch_rows, index_rows, cap):
    sizes: dict[tuple, int] = {}
    for _, b, v in index_rows:
        sizes[(b, v)] = sizes.get((b, v), 0) + 1
    want = set()
    for bid, bb, bv in batch_rows:
        for iid, ib, iv in index_rows:
            if (bb, bv) == (ib, iv) and sizes[(ib, iv)] <= cap:
                want.add((bid, iid))
    return want


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch=st.lists(_row, max_size=12),
    index=st.lists(_row, max_size=25),
    cap=st.integers(min_value=1, max_value=12),
    salts=st.integers(min_value=1, max_value=5),
)
def test_cross_band_pairs_matches_naive(spark, batch, index, cap, salts):
    bdf = spark.createDataFrame(
        [(i - 1000, b, v) for i, b, v in batch] or [(0, 0, 0)][:0],
        "doc_id long, band int, bucket long",
    )
    idf = spark.createDataFrame(
        [(i + 1000, b, v) for i, b, v in index] or [(0, 0, 0)][:0],
        "doc_id long, band int, bucket long",
    )
    got = {
        (r["src"], r["dst"])
        for r in cross_band_pairs(
            bdf, idf, bucket_cap=cap, salts=salts
        ).collect()
    }
    want = _naive(
        [(i - 1000, b, v) for i, b, v in batch],
        [(i + 1000, b, v) for i, b, v in index],
        cap,
    )
    assert got == want
