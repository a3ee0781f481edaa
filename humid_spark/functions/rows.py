"""Single-row DataFrame combinators shared by the pipeline funnels."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def combine_single_rows(parts: list[DataFrame]) -> DataFrame:
    """Combine several SINGLE-ROW aggregate DataFrames into one row
    carrying all their (uniquely named, numeric) columns — JOIN-FREE.

    Each part unpivots to (m, v) rows, the union re-aggregates with
    max(when(...)).  The obvious alternative — a 1x1 crossJoin, or an
    equi-join on a literal key, which Catalyst constant-folds back into
    one — plans as BroadcastNestedLoopJoin and would breach the
    repo-wide "no CartesianProduct anywhere" hygiene bar; this shape
    never joins.  Used by WebDedupResult.funnel, CurationResult.funnel
    and IncrementalResult.funnel, which format their own (metric, value)
    stacks over the combined row."""
    names: list[str] = []
    rows: DataFrame | None = None
    for df in parts:
        cols = df.columns
        piv = df.selectExpr(
            "stack({}, {}) AS (m, v)".format(
                len(cols), ", ".join(f"'{c}', {c}" for c in cols)
            )
        )
        rows = piv if rows is None else rows.unionByName(piv)
        names.extend(cols)
    assert rows is not None, "combine_single_rows needs at least one part"
    return rows.agg(
        *[
            F.max(F.when(F.col("m") == n, F.col("v"))).alias(n)
            for n in names
        ]
    )
