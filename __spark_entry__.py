"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` is an implemented operator from SURVEY.md §2
(or a training-data-pipeline extension), expressed through the engine's own
operator library (humid_spark.*); ``oracle_sql()`` gives an independent
ANSI-SQL formulation DuckDB executes over the same parquet tables.

Key-space convention for the dedup operators: the HUMID word analog over the
``documents`` table is key = first n chars of ``text`` (reference word
length -n, src/humid.cc:419), usable = length(text) >= n, doc order =
doc_id.  Hamming/edit neighbour distance m=1 (src/humid.cc:420).

Two key lengths run side by side:
- n=24 (the reference default): matches the reference CLI config exactly,
  but the driver's word-soup documents have ZERO Hamming-1 pairs at that
  length — the chain is correct but never merges.
- n=12 (``*_n12`` queries): 32 real Hamming-1 pairs / 28 multi-key
  components at sf0.01, so the neighbour join, CC merge, representative
  contest and dedup selection are all verified against DuckDB on real
  merges (non-vacuous oracle chain).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N = 24   # reference word length (src/humid.cc:419)
N12 = 12 # shorter key: real Hamming-1 edges exist in the driver's documents
P31 = (1 << 31) - 1
MH_K = 5       # shingle size for the SQL-parity signature queries
MH_PERMS = 8   # perms for the SQL-parity signature queries (engine uses 128)
FUNNEL_THRESH = 500  # Jaccard permille gate for web_dedup_funnel's
                     # near tier (the sf corpus is bimodal: real
                     # near-dup families sit at >= 900 permille, the
                     # band-join noise floor at <= ~200)
MH_BAND_R = 4  # rows per band (2 bands): r=2 was near-all-pairs on the
               # shared-vocabulary word-soup docs (3.1M candidates at sf0.1,
               # J^2 collision prob); r=4 keeps the banding selective so the
               # exact-Jaccard verify runs on a real candidate set


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ts(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`_t` + scale-adaptive spread (humid_spark.partitioning): the driver
    parquet is a single row-group, so expression-heavy per-doc projections
    chained narrowly onto the scan otherwise run on ONE core; on a
    well-partitioned corpus the spread is a no-op.  Row values and every
    aggregate downstream are partition-independent — results unchanged."""
    from humid_spark.partitioning import spread

    return spread(_t(spark, sf_dir, name))


def _doc_keys(spark: SparkSession, sf_dir: str, n: int = N) -> DataFrame:
    """documents -> (doc_id, key, usable): the with_key_columns analog for
    the driver's documents table (no padding needed for the oracle pair —
    usable rows always have >= n chars)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, n).alias("key"),
        (F.col("text").isNotNull() & (F.length("text") >= n)).alias("usable"),
    )


def _uniq(spark: SparkSession, sf_dir: str, n: int = N) -> DataFrame:
    """A1 exact-dup counting (humid_spark.operators.exact semantics)."""
    return (
        _doc_keys(spark, sf_dir, n)
        .filter("usable")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("first_doc_id"))
    )


def _sql_keys(n: int = N) -> str:
    return (
        f"SELECT doc_id, substr(text, 1, {n}) AS key FROM documents "
        f"WHERE text IS NOT NULL AND length(text) >= {n}"
    )


def _sql_uniq(n: int = N) -> str:
    return (
        f"SELECT key, count(*) AS cnt, min(doc_id) AS first_doc_id "
        f"FROM ({_sql_keys(n)}) GROUP BY key"
    )


def _sql_edges_h1(n: int = N) -> str:
    return (
        f"SELECT a.key AS src, b.key AS dst "
        f"FROM (SELECT DISTINCT key FROM ({_sql_keys(n)})) a "
        f"JOIN (SELECT DISTINCT key FROM ({_sql_keys(n)})) b "
        f"ON a.key < b.key AND hamming(a.key, b.key) <= 1"
    )


def _sql_cc(n: int = N) -> str:
    # min-reachable-key connected components as a recursive CTE
    return f"""
WITH RECURSIVE
uk AS (SELECT DISTINCT key FROM ({_sql_keys(n)})),
edges AS (
  SELECT a.key AS src, b.key AS dst FROM uk a JOIN uk b
  ON a.key <> b.key AND hamming(a.key, b.key) <= 1
),
reach(key, comp) AS (
  SELECT key, key FROM uk
  UNION
  SELECT e.src, r.comp FROM reach r JOIN edges e ON e.dst = r.key
)
SELECT key, min(comp) AS component FROM reach GROUP BY key
"""


_SQL_KEYS = _sql_keys(N)
_SQL_UNIQ = _sql_uniq(N)
_SQL_EDGES_H1 = _sql_edges_h1(N)
_SQL_CC = _sql_cc(N)


def _pairs_h1(spark: SparkSession, sf_dir: str, n: int = N) -> DataFrame:
    from humid_spark.operators.blocking import hamming_pairs

    return hamming_pairs(_uniq(spark, sf_dir, n).select("key"), n, 1)


def _components(spark: SparkSession, sf_dir: str, n: int = N) -> DataFrame:
    from humid_spark.operators.cc import assign_components

    uniq = _uniq(spark, sf_dir, n)
    return assign_components(uniq, _pairs_h1(spark, sf_dir, n))


def _sig_shingle_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh, h0..h7) materialized ONCE — the md5 shingle transform is
    the expensive projection; checkpointing it keeps the 4 band self-joins
    and the Jaccard verify from re-deriving it ~10x per doc."""
    from humid_spark.functions.signatures import sql_parity_sig_table

    # The driver parquet is a single row-group: without an explicit
    # repartition the md5-per-shingle projection (the expensive part)
    # materializes on ONE core and every downstream join inherits 1
    # partition.
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tbl = sql_parity_sig_table(docs, MH_K, MH_PERMS)
    return tbl.localCheckpoint(eager=True)


def _sig_sql_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from humid_spark.functions.signatures import sql_parity_sig_table

    return sql_parity_sig_table(
        _ts(spark, sf_dir, "documents"), MH_K, MH_PERMS
    ).drop("sh")


def _sig_sql_duck() -> str:
    from humid_spark.functions.signatures import minhash_sql_duckdb

    arr = minhash_sql_duckdb("text", MH_K, MH_PERMS)
    cols = ", ".join(f"sig[{j + 1}] AS h{j}" for j in range(MH_PERMS))
    return (
        f"SELECT doc_id, {cols} FROM "
        f"(SELECT doc_id, {arr} AS sig FROM documents)"
    )


def _band_join_spark(
    spark: SparkSession, sf_dir: str, sigs: DataFrame | None = None
) -> DataFrame:
    if sigs is None:
        sigs = _sig_shingle_table(spark, sf_dir).drop("sh")
    r = MH_BAND_R
    outs = []
    for b in range(MH_PERMS // r):
        hs = [f"h{r * b + i}" for i in range(r)]
        a = sigs.select(F.col("doc_id").alias("src"), *hs)
        c = sigs.select(F.col("doc_id").alias("dst"), *hs)
        outs.append(
            a.join(c, hs).filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
        )
    pairs = outs[0]
    for o in outs[1:]:
        pairs = pairs.union(o)
    return pairs.distinct()


def _band_join_duck() -> str:
    r = MH_BAND_R
    bands = " OR ".join(
        "(" + " AND ".join(
            f"a.h{r * b + i} = b.h{r * b + i}" for i in range(r)
        ) + ")"
        for b in range(MH_PERMS // r)
    )
    return (
        f"SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst "
        f"FROM ({_sig_sql_duck()}) a JOIN ({_sig_sql_duck()}) b "
        f"ON a.doc_id < b.doc_id AND ({bands})"
    )


# ---------------------------------------------------------------------------
# multimodal long-form fold (round 6, VERDICT r5 item 1): the per-modality
# stats tables stack into ONE recorded query each for decode / resize /
# near-dup by unpivoting every column to (modality, url, metric, value)
# rows — no information loss (every column survives as a metric row, values
# compared as exact strings: integer casts are canonical and booleans
# render 'true'/'false' identically in Spark and DuckDB).
# ---------------------------------------------------------------------------

_IMG_STATS_COLS = [
    "width", "height", "format", "decoded", "channels",
    "r_sum", "g_sum", "b_sum",
]
_AUD_STATS_COLS = [
    "decoded", "n_channels", "sample_rate", "n_samples",
    "duration_ms", "sumsq", "zero_crossings",
]
_VID_STATS_COLS = [
    "decoded", "width", "height", "n_frames", "fps_num", "fps_den",
    "duration_ms", "y_sum", "y_sumsq",
]
_IMG_RESIZE_COLS = ["width", "height", "r_sum", "g_sum", "b_sum"]
_VID_RESIZE_COLS = ["width", "height", "n_frames", "fps_num", "y_sum"]


def _unpivot_modal(df: DataFrame, modality: str, metrics: list[str]) -> DataFrame:
    pairs = ", ".join(f"'{m}', cast({m} as string)" for m in metrics)
    return df.selectExpr(
        f"'{modality}' as modality",
        "url",
        f"stack({len(metrics)}, {pairs}) as (metric, value)",
    )


def _unpivot_modal_sql(inner: str, modality: str, metrics: list[str]) -> str:
    return " UNION ALL ".join(
        f"SELECT '{modality}' AS modality, url, '{m}' AS metric, "
        f"CAST({m} AS VARCHAR) AS value FROM ({inner})"
        for m in metrics
    )


_SQL_SHINGLES = (
    f"SELECT doc_id, list_distinct(list_transform("
    f"generate_series(1, greatest(1, length(text) - {MH_K - 1})), "
    f"i -> cast(('0x' || substr(md5(substring(text, i, {MH_K})), 1, 14)) as bigint) % {P31}"
    f")) AS sh FROM documents WHERE text IS NOT NULL"
)


# ---------------------------------------------------------------------------
# entry / queries / oracle_sql
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: web-scale near-dup clustering of documents at sf0.001
    (n=12 keys so the neighbour join and CC actually merge)."""
    sf_dir = "/root/testdata/sf0.001"
    comps = _components(spark, sf_dir, N12)
    return (
        _doc_keys(spark, sf_dir, N12)
        .join(comps.select("key", "component"), "key", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.lit("")).alias("cluster"),
        )
    )


def _best(c: DataFrame) -> DataFrame:
    """Per-component argmax representative (max count, tie: min key).
    min(struct(-cnt, key)) is an exact argmax with deterministic tie-break,
    computed as one hash aggregate (no window, no extra shuffle)."""
    return c.groupBy("component").agg(
        F.min(
            F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("key").alias("key"))
        ).alias("b")
    )


def _register_dedup_chain(
    q: dict[str, Callable[[SparkSession, str], DataFrame]],
    n: int,
    suffix: str,
    with_ids: bool = False,
) -> None:
    """The full exact-count -> neighbour-join -> CC -> stats/sinks chain at
    key length `n`.  Registered twice: n=24 (reference config; vacuous on
    the driver's word-soup docs) and n=12 (real merges at sf0.01).

    Round 6 (VERDICT r5 item 1): the chain is FOLDED so the whole contract
    fits the driver's 50-query recorded budget with identical oracle
    strength — hamming1_pairs+edit1_pairs -> neighbour_pairs (kind column),
    the three histograms -> dedup_histograms (stacked metric/bucket rows),
    dedup_keep -> representatives.doc_id, and (n12) max_clusters ->
    components_n12.cluster_id/cluster_size.  README "Contract v6" records
    the old-name -> new-column mapping."""

    # --- A1: exact-dup counting (the trie insert) ---
    q[f"exact_dup_counts{suffix}"] = lambda s, d: _uniq(s, d, n)

    # --- J1 + J2: Hamming-1 (pigeonhole chunk blocking) and
    #     edit-distance-1 (PassJoin-style shifts) self-joins, stacked
    #     under a `kind` tag (fold of hamming1_pairs + edit1_pairs) ---
    def neighbour_pairs(s, d):
        from humid_spark.operators.blocking import edit_pairs

        h1 = _pairs_h1(s, d, n).select(
            F.lit("hamming1").alias("kind"), "src", "dst"
        )
        e1 = edit_pairs(_uniq(s, d, n).select("key"), n, 1).select(
            F.lit("edit1").alias("kind"), "src", "dst"
        )
        return h1.unionByName(e1)

    q[f"neighbour_pairs{suffix}"] = neighbour_pairs

    # --- A4 + A5 + A6: the three stats sinks (counts.dat multiplicity
    #     histogram, neigh.dat degree histogram with zero-degree keys
    #     included, cluster-size histogram) stacked as (metric, bucket,
    #     frequency) rows — identical information, one recorded query ---
    def histograms(s, d):
        from humid_spark.operators.stats import neighbour_histogram

        u = _uniq(s, d, n)
        cnt_h = (
            u.groupBy(F.col("cnt").cast("long").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("frequency"))
            .select(F.lit("multiplicity").alias("metric"), "bucket", "frequency")
        )
        deg_h = neighbour_histogram(u, _pairs_h1(s, d, n)).select(
            F.lit("degree").alias("metric"),
            F.col("degree").cast("long").alias("bucket"),
            "frequency",
        )
        sz_h = (
            _components(s, d, n)
            .groupBy("component")
            .agg(F.sum("cnt").alias("size"))
            .groupBy(F.col("size").cast("long").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("frequency"))
            .select(F.lit("cluster_size").alias("metric"), "bucket", "frequency")
        )
        return cnt_h.unionByName(deg_h).unionByName(sz_h)

    q[f"dedup_histograms{suffix}"] = histograms

    # --- G1: connected components (large-star/small-star); with_ids adds
    #     G1/-x + G3 — the REAL maximum-clustering engine path
    #     (per-component greedy replay, applyInPandas) and the global
    #     seed-rank cluster-id enumeration — as cluster_id/cluster_size
    #     columns (fold of the former max_clusters_n12) ---
    if with_ids:
        def components_ids(s, d):
            from humid_spark.operators.directional import cluster_keys

            uniq = _uniq(s, d, n).select(
                "key", F.col("cnt").alias("count"),
                F.lit(None).cast("timestamp").alias("first_ts"),
                F.col("first_doc_id").cast("string").alias("first_url"),
            )
            mx = cluster_keys(uniq, _pairs_h1(s, d, n), maximum=True).select(
                "key", "cluster_id", "cluster_size"
            )
            return (
                _components(s, d, n).select("key", "component").join(mx, "key")
            )

        q[f"components{suffix}"] = components_ids
    else:
        q[f"components{suffix}"] = lambda s, d: (
            _components(s, d, n).select("key", "component")
        )

    # --- A8 + K1: per-cluster argmax representative, carrying the kept
    #     first_doc_id (fold of dedup_keep: the dedup sink's output is
    #     exactly this query's doc_id column) ---
    def reps(s, d):
        c = _components(s, d, n)
        best = c.groupBy("component").agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("neg_cnt"),
                    F.col("key").alias("key"),
                    F.col("first_doc_id").alias("doc_id"),
                )
            ).alias("b")
        )
        return best.select(
            "component",
            F.col("b.key").alias("rep_key"),
            (-F.col("b.neg_cnt")).cast("long").alias("rep_cnt"),
            F.col("b.doc_id").alias("doc_id"),
        )

    q[f"representatives{suffix}"] = reps

    # --- K2/J3: annotate every doc with its cluster (point-lookup join) ---
    def annotate(s, d):
        comps = _components(s, d, n).select("key", "component")
        return (
            _doc_keys(s, d, n)
            .join(comps, "key", "left")
            .select(
                "doc_id",
                F.when(F.col("usable"), F.col("component"))
                .otherwise(F.lit("")).alias("cluster"),
            )
        )

    q[f"annotate{suffix}"] = annotate


def _register_dedup_chain_sql(
    o: dict[str, str], n: int, suffix: str, with_ids: bool = False
) -> None:
    """DuckDB oracles for the chain registered by _register_dedup_chain."""
    o[f"exact_dup_counts{suffix}"] = _sql_uniq(n)

    o[f"neighbour_pairs{suffix}"] = (
        f"SELECT 'hamming1' AS kind, src, dst FROM ({_sql_edges_h1(n)}) "
        f"UNION ALL "
        f"SELECT 'edit1' AS kind, a.key AS src, b.key AS dst "
        f"FROM (SELECT DISTINCT key FROM ({_sql_keys(n)})) a "
        f"JOIN (SELECT DISTINCT key FROM ({_sql_keys(n)})) b "
        f"ON a.key < b.key AND levenshtein(a.key, b.key) <= 1"
    )

    o[f"dedup_histograms{suffix}"] = f"""
        SELECT 'multiplicity' AS metric, CAST(cnt AS BIGINT) AS bucket,
               count(*) AS frequency
        FROM ({_sql_uniq(n)}) GROUP BY 2
        UNION ALL
        SELECT 'degree' AS metric, CAST(degree AS BIGINT) AS bucket, frequency
        FROM (
          WITH uk AS (SELECT DISTINCT key FROM ({_sql_keys(n)})),
          e AS (SELECT src AS key FROM ({_sql_edges_h1(n)})
                UNION ALL SELECT dst FROM ({_sql_edges_h1(n)})),
          deg AS (SELECT uk.key, count(e.key) AS degree
                  FROM uk LEFT JOIN e ON uk.key = e.key GROUP BY uk.key)
          SELECT degree, count(*) AS frequency FROM deg GROUP BY degree
        )
        UNION ALL
        SELECT 'cluster_size' AS metric, CAST(size AS BIGINT) AS bucket,
               frequency
        FROM (
          WITH cc AS ({_sql_cc(n)}), u AS ({_sql_uniq(n)}),
          sizes AS (SELECT cc.component, CAST(sum(u.cnt) AS BIGINT) AS size
                    FROM cc JOIN u ON cc.key = u.key GROUP BY cc.component)
          SELECT size, count(*) AS frequency FROM sizes GROUP BY size
        )
    """

    if with_ids:
        o[f"components{suffix}"] = f"""
            WITH cc AS ({_sql_cc(n)}), u AS ({_sql_uniq(n)}),
            j AS (SELECT cc.key, cc.component, u.cnt
                  FROM cc JOIN u ON cc.key = u.key),
            sz AS (SELECT component, CAST(sum(cnt) AS BIGINT) AS cluster_size
                   FROM j GROUP BY component),
            ids AS (SELECT component,
                           CAST(dense_rank() OVER (ORDER BY component)
                                AS BIGINT) AS cluster_id
                    FROM sz)
            SELECT j.key, j.component, ids.cluster_id, sz.cluster_size
            FROM j JOIN sz ON j.component = sz.component
                   JOIN ids ON j.component = ids.component
        """
    else:
        o[f"components{suffix}"] = _sql_cc(n)

    o[f"representatives{suffix}"] = f"""
        WITH cc AS ({_sql_cc(n)}), u AS ({_sql_uniq(n)}),
        j AS (SELECT cc.component, u.key, u.cnt, u.first_doc_id
              FROM cc JOIN u ON cc.key = u.key),
        r AS (SELECT component, key, cnt, first_doc_id,
                     row_number() OVER (PARTITION BY component
                                        ORDER BY cnt DESC, key) AS rn
              FROM j)
        SELECT component, key AS rep_key, cnt AS rep_cnt,
               first_doc_id AS doc_id
        FROM r WHERE rn = 1
    """

    o[f"annotate{suffix}"] = f"""
        WITH cc AS ({_sql_cc(n)})
        SELECT d.doc_id,
               CASE WHEN d.text IS NOT NULL AND length(d.text) >= {n}
                    THEN coalesce(cc.key_comp, '') ELSE '' END AS cluster
        FROM (SELECT doc_id, text, substr(text, 1, {n}) AS key FROM documents) d
        LEFT JOIN (SELECT key, component AS key_comp FROM cc) cc ON d.key = cc.key
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # Reference-default key length (n=24) ...
    _register_dedup_chain(q, N, "")
    # ... and the non-vacuous n=12 chain: real Hamming-1 merges at sf0.01,
    # so CC/representative/dedup semantics are checked on actual clusters.
    # with_ids folds the former max_clusters_n12 (REAL maximum-clustering
    # engine path + global seed-rank ids) into components_n12.
    _register_dedup_chain(q, N12, "_n12", with_ids=True)

    # --- A7: scalar stats ---
    def scalar_stats(s, d):
        keys = _doc_keys(s, d)
        return keys.agg(
            F.count(F.lit(1)).alias("total"),
            F.count_if(F.col("usable")).alias("usable"),
            F.count_distinct(F.when(F.col("usable"), F.col("key"))).alias("unique"),
        )

    q["scalar_stats"] = scalar_stats

    # --- signatures: SQL-parity MinHash + SimHash in ONE row per doc
    #     (round-6 fold of minhash_signatures + simhash_signatures; both
    #     kernels still run — the 8 OPH columns and the 16-bit SimHash are
    #     hash-checked side by side) ---
    def signatures_q(s, d):
        from humid_spark.functions.signatures import simhash_sql_spark

        sim = _ts(s, d, "documents").select(
            "doc_id", simhash_sql_spark("text", MH_K).alias("simhash16")
        )
        return _sig_sql_spark(s, d).join(sim, "doc_id")

    q["signatures"] = signatures_q

    # --- LSH band join on the SQL-parity signatures ---
    q["lsh_band_pairs"] = lambda s, d: _band_join_spark(s, d)

    # --- exact n-gram Jaccard verification on banded candidates (one
    #     materialized signature+shingle table feeds BOTH the band joins
    #     and the verify — no recompute of the md5 transform) ---
    def jaccard(s, d):
        tbl = _sig_shingle_table(s, d)
        # AQE coalesces the narrow (src,dst) candidate table to ~2
        # partitions by BYTES, but the per-row verify cost is the array
        # intersect of two ~|doc| shingle sets — compute-bound, not
        # byte-bound.  Spread it explicitly.
        pairs = _band_join_spark(s, d, sigs=tbl.drop("sh")).repartition(
            s.sparkContext.defaultParallelism
        )
        sh = tbl.select("doc_id", "sh")
        a = sh.select(F.col("doc_id").alias("src"), F.col("sh").alias("sh_a"))
        b = sh.select(F.col("doc_id").alias("dst"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        return (
            pairs.join(a, "src").join(b, "dst")
            .select(
                "src", "dst",
                F.floor(inter * 1000 / union).cast("long").alias("jaccard_permille"),
            )
        )

    q["ngram_jaccard_pairs"] = jaccard

    # --- END-TO-END web-dedup funnel, fully oracle-checked (round 5).
    #     The web pipeline's stages are each oracle-green individually
    #     (exact collapse, signatures, band join, Jaccard verify); this
    #     query chains them THROUGH the engine's connected-components
    #     operator and reports the tier funnel a training-data pipeline
    #     reads off a dedup run:
    #       total_usable -> exact_removed -> near_removed -> kept.
    #     The corpus has no full-text dups, so exact dups are PLANTED
    #     (doc_id % 10 == 0 re-enters as -doc_id - 1 — disjoint from the
    #     non-negative ids at any scale factor, the embedding_near_dups
    #     convention).  The DuckDB oracle replays the whole chain —
    #     grouping, md5-parity signatures, banding, Jaccard >= 0.5,
    #     recursive-CTE components — so CC-over-DOCUMENT-PAIRS is
    #     hash-checked end to end (previously only CC-over-parity-keys
    #     was).  Counts, not labels: immune to component-naming
    #     conventions, sensitive to any wrong merge. ---
    def web_funnel(s, d):
        from humid_spark.functions.signatures import sql_parity_sig_table
        from humid_spark.operators.cc import connected_components

        docs = _t(s, d, "documents").select("doc_id", "text")
        usable = docs.filter(
            F.col("text").isNotNull() & (F.length("text") >= MH_K)
        )
        planted = usable.filter(F.col("doc_id") % 10 == 0).select(
            (-F.col("doc_id") - 1).alias("doc_id"), "text"
        )
        corpus = usable.unionByName(planted)
        grp = corpus.groupBy("text").agg(
            F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("cnt")
        )
        # one materialization feeds both band self-joins, the verify and
        # (via connected_components' own eager checkpoint) the CC rounds
        tbl = sql_parity_sig_table(
            grp.select("doc_id", "text"), MH_K, MH_PERMS
        ).localCheckpoint(eager=True)
        pairs = _band_join_spark(s, d, sigs=tbl.drop("sh"))
        sh = tbl.select("doc_id", "sh")
        ver = (
            pairs
            .join(sh.select(F.col("doc_id").alias("src"),
                            F.col("sh").alias("sh_a")), "src")
            .join(sh.select(F.col("doc_id").alias("dst"),
                            F.col("sh").alias("sh_b")), "dst")
            .filter(
                F.floor(F.size(F.array_intersect("sh_a", "sh_b")) * 1000
                        / F.size(F.array_union("sh_a", "sh_b")))
                >= FUNNEL_THRESH
            )
            .select("src", "dst")
        )
        comp = connected_components(ver)
        # the three single-row aggregates combine JOIN-FREE (unpivot to
        # (m, v), union, re-aggregate): a crossJoin — or a literal-key
        # equi-join, which Catalyst constant-folds back into one — plans
        # as BroadcastNestedLoopJoin and would breach the repo-wide
        # "no CartesianProduct anywhere" hygiene assertion
        stats = grp.agg(
            F.sum("cnt").cast("long").alias("total_usable"),
            F.count(F.lit(1)).alias("exact_unique"),
        ).selectExpr(
            "stack(2, 'total_usable', total_usable, "
            "'exact_unique', exact_unique) AS (m, v)"
        )
        ecnt = ver.agg(
            F.count(F.lit(1)).alias("near_edges")
        ).selectExpr("stack(1, 'near_edges', near_edges) AS (m, v)")
        ccs = comp.agg(
            F.count(F.lit(1)).alias("cc_nodes"),
            F.countDistinct("component").alias("cc_comps"),
        ).selectExpr(
            "stack(2, 'cc_nodes', cc_nodes, 'cc_comps', cc_comps) AS (m, v)"
        )
        row = stats.unionByName(ecnt).unionByName(ccs).agg(
            *[
                F.max(F.when(F.col("m") == m_, F.col("v"))).alias(m_)
                for m_ in ("total_usable", "exact_unique", "near_edges",
                           "cc_nodes", "cc_comps")
            ]
        )
        return row.selectExpr(
            "stack(6, "
            "'total_usable', total_usable, "
            "'exact_unique', exact_unique, "
            "'exact_removed', total_usable - exact_unique, "
            "'near_edges', near_edges, "
            "'near_removed', cc_nodes - cc_comps, "
            "'kept', exact_unique - (cc_nodes - cc_comps)"
            ") AS (metric, value)"
        )

    q["web_dedup_funnel"] = web_funnel

    # --- INCREMENTAL (snapshot-N+1) dedup: the production shape the
    #     batch-only reference cannot express (src/humid.cc:443-452
    #     re-reads the full input per run).  The corpus splits into an
    #     already-ingested INDEX (doc_id % 3 != 0) and a NEW BATCH
    #     (doc_id % 3 == 0); each tier plants its own dups so the result
    #     is non-vacuous at any scale factor (planted ids are -doc_id - 1,
    #     disjoint from the non-negative id space):
    #     - exact tier: index docs with doc_id % 10 == 1 re-enter the
    #       batch verbatim -> fingerprint anti-join drops them;
    #     - near tier: the same donors re-enter with ' near dup copy'
    #       appended -> asymmetric band join + exact-Jaccard verify
    #       finds them against their index originals. ---
    def incr_exact(s, d):
        from humid_spark.functions import textstats as ts
        from humid_spark.operators.incremental import exact_survivors

        docs = _t(s, d, "documents").filter(F.col("text").isNotNull())
        index = docs.filter(F.col("doc_id") % 3 != 0)
        planted = index.filter(F.col("doc_id") % 10 == 1).select(
            (-F.col("doc_id") - 1).alias("doc_id"), "text"
        )
        batch = (
            docs.filter(F.col("doc_id") % 3 == 0)
            .select("doc_id", "text")
            .unionByName(planted)
        )
        fp = ts.fingerprint(F.col("text")).alias("fp")
        return exact_survivors(
            batch.select("doc_id", fp), index.select(fp)
        ).select("doc_id")

    q["incremental_exact_dedup"] = incr_exact

    def incr_near(s, d):
        from humid_spark.functions.signatures import sql_parity_sig_table
        from humid_spark.operators.incremental import cross_band_pairs

        docs = _t(s, d, "documents").filter(
            F.col("text").isNotNull() & (F.length("text") >= MH_K)
        )
        planted = docs.filter(
            (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 10 == 1)
        ).select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" near dup copy")).alias("text"),
        )
        corpus = (
            docs.filter(F.col("doc_id") % 3 == 0)
            .select("doc_id", "text")
            .unionByName(planted)
            .unionByName(
                docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
            )
        )
        # one checkpointed table feeds batch buckets, index buckets AND
        # the Jaccard verify; side is recoverable from the id (planted
        # ids are negative, batch originals are % 3 == 0)
        tbl = sql_parity_sig_table(
            corpus.repartition(s.sparkContext.defaultParallelism),
            MH_K, MH_PERMS,
        ).localCheckpoint(eager=True)
        is_batch = (F.col("doc_id") < 0) | (F.col("doc_id") % 3 == 0)

        def bands_of(sigs):
            r = MH_BAND_R
            arr = F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":", *[F.col(f"h{r * b + i}") for i in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(MH_PERMS // r)
                ]
            )
            return sigs.select("doc_id", F.explode(arr).alias("bb")).select(
                "doc_id", "bb.band", "bb.bucket"
            )

        sigs = tbl.drop("sh")
        pairs = cross_band_pairs(
            bands_of(sigs.filter(is_batch)),
            bands_of(sigs.filter(~is_batch)),
            bucket_cap=2000,
        )
        sh = tbl.select("doc_id", "sh")
        return (
            pairs
            .join(sh.select(F.col("doc_id").alias("src"),
                            F.col("sh").alias("sh_a")), "src")
            .join(sh.select(F.col("doc_id").alias("dst"),
                            F.col("sh").alias("sh_b")), "dst")
            .select(
                "src", "dst",
                F.floor(
                    F.size(F.array_intersect("sh_a", "sh_b")) * 1000
                    / F.size(F.array_union("sh_a", "sh_b"))
                ).cast("long").alias("jaccard_permille"),
            )
            .filter(F.col("jaccard_permille") >= FUNNEL_THRESH)
        )

    q["incremental_near_dups"] = incr_near

    # --- incremental_clusters: the persistent-cluster-map tier
    #     (plans/incremental.py cluster_batch) replayed over the same
    #     index/batch split — index clusters from an index-internal CC,
    #     then ONE batch assigned from batch-bounded edges only
    #     (within-batch pairs + (src, cluster-of-dst) cross edges), with
    #     merges relabeling index clusters (merge-on-read remap).  For a
    #     single snapshot this equals a full CC over the union pair set
    #     (the parity theorem tests/test_incremental_clusters.py pins on
    #     the engine), which is exactly what the DuckDB oracle replays —
    #     so the incremental composition is hash-checked end to end.
    #     Plants: index donors (%10==1) re-enter near-dup'd at -2*id-1
    #     (cross edges); batch donors (%3==0, %10==3) gain a variant at
    #     -2*id-2 (within-batch edges, the family dedup_batch alone never
    #     sees). ---
    def incr_clusters(s, d):
        from humid_spark.functions.signatures import sql_parity_sig_table
        from humid_spark.operators.cc import connected_components
        from humid_spark.operators.incremental import cross_band_pairs

        docs = _t(s, d, "documents").filter(
            F.col("text").isNotNull() & (F.length("text") >= MH_K)
        )
        index_docs = docs.filter(F.col("doc_id") % 3 != 0).select(
            "doc_id", "text"
        )
        batch_docs = (
            docs.filter(F.col("doc_id") % 3 == 0)
            .select("doc_id", "text")
            .unionByName(
                index_docs.filter(F.col("doc_id") % 10 == 1).select(
                    (-F.col("doc_id") * 2 - 1).alias("doc_id"),
                    F.concat("text", F.lit(" near dup copy")).alias("text"),
                )
            )
            .unionByName(
                docs.filter(
                    (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 10 == 3)
                ).select(
                    (-F.col("doc_id") * 2 - 2).alias("doc_id"),
                    F.concat(
                        "text", F.lit(" second variant tail")
                    ).alias("text"),
                )
            )
        )
        # incremental exact collapse: index keeps first-seen identity;
        # batch collapses internally; batch texts already indexed drop
        igrp = index_docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        bgrp = batch_docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        fresh = bgrp.join(igrp.select("text"), "text", "anti")
        tbl = sql_parity_sig_table(
            igrp.select("doc_id", "text")
            .unionByName(fresh.select("doc_id", "text"))
            .repartition(s.sparkContext.defaultParallelism),
            MH_K,
            MH_PERMS,
        ).localCheckpoint(eager=True)
        is_batch = (F.col("doc_id") < 0) | (F.col("doc_id") % 3 == 0)
        sigs = tbl.drop("sh")
        sh = tbl.select("doc_id", "sh")

        def _verify(pairs):
            return (
                pairs.join(
                    sh.select(F.col("doc_id").alias("src"),
                              F.col("sh").alias("sh_a")), "src")
                .join(
                    sh.select(F.col("doc_id").alias("dst"),
                              F.col("sh").alias("sh_b")), "dst")
                .filter(
                    F.floor(
                        F.size(F.array_intersect("sh_a", "sh_b")) * 1000
                        / F.size(F.array_union("sh_a", "sh_b"))
                    ) >= FUNNEL_THRESH
                )
                .select("src", "dst")
            )

        def bands_of(sg):
            r = MH_BAND_R
            arr = F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":", *[F.col(f"h{r * b + i}") for i in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(MH_PERMS // r)
                ]
            )
            return sg.select("doc_id", F.explode(arr).alias("bb")).select(
                "doc_id", "bb.band", "bb.bucket"
            )

        bsig = sigs.filter(is_batch)
        isig = sigs.filter(~is_batch)
        # the three incremental edge families: index self (paid at build),
        # within-batch self, batch-vs-index cross
        index_pairs = _verify(_band_join_spark(s, d, sigs=isig))
        internal = _verify(_band_join_spark(s, d, sigs=bsig))
        cross = _verify(
            cross_band_pairs(bands_of(bsig), bands_of(isig), bucket_cap=2000)
        )

        icomp = connected_components(index_pairs)
        imap = (
            igrp.select("doc_id")
            .join(icomp, F.col("doc_id") == F.col("node"), "left")
            .select(
                "doc_id", F.coalesce("component", "doc_id").alias("cluster")
            )
            .localCheckpoint(eager=True)
        )
        edges2 = (
            cross.join(
                imap.withColumnRenamed("doc_id", "dst"), "dst"
            ).select("src", F.col("cluster").alias("dst"))
            .unionByName(internal)
        )
        comp2 = connected_components(edges2)
        bmap = (
            fresh.select("doc_id")
            .join(comp2, F.col("doc_id") == F.col("node"), "left")
            .select(
                "doc_id", F.coalesce("component", "doc_id").alias("cluster")
            )
        )
        iresolved = imap.join(
            comp2, imap["cluster"] == comp2["node"], "left"
        ).select(
            "doc_id",
            F.coalesce("component", "cluster").alias("cluster"),
        )
        return iresolved.unionByName(bmap)

    q["incremental_clusters"] = incr_clusters

    def stream_incr(s, d):
        """REAL Structured-Streaming ingest over a persistent DedupIndex:
        two micro-batch files drain through stream_ingest's foreachBatch
        loop (classify -> write survivors -> append to the index), so
        batch 1 deduplicates against what batch 0 ingested.  The near
        tier is disabled (jaccard_threshold > 1) so the run is exactly
        the fingerprint tier — text-equality semantics DuckDB replays
        verbatim (the near tier is hash-checked by incremental_near_dups;
        xxhash64 ids are unreplayable, so survivors map back to
        min(original doc_id) per surviving text group).  Plants: index
        docs (%10==2) re-enter in batch 0; batch-0 docs (%10==1) re-enter
        in batch 1 — the latter are dropped ONLY if batch 0's append took
        effect."""
        import os
        import tempfile

        from humid_spark.config import DedupConfig
        from humid_spark.plans.incremental import DedupIndex
        from humid_spark.streaming.incremental import stream_ingest

        docs = _t(s, d, "documents").filter(
            F.col("text").isNotNull() & (F.length("text") >= 5)
        )
        idx_docs = docs.filter(F.col("doc_id") % 3 == 2)
        b0 = (
            docs.filter(F.col("doc_id") % 3 == 1)
            .select("doc_id", "text")
            .unionByName(
                idx_docs.filter(F.col("doc_id") % 10 == 2).select(
                    (-F.col("doc_id") - 1).alias("doc_id"), "text"
                )
            )
        )
        b1 = (
            docs.filter(F.col("doc_id") % 3 == 0)
            .select("doc_id", "text")
            .unionByName(
                docs.filter(
                    (F.col("doc_id") % 3 == 1) & (F.col("doc_id") % 10 == 1)
                ).select((-F.col("doc_id") - 1).alias("doc_id"), "text")
            )
        )

        def pagify(df):
            return df.select(
                F.concat(
                    F.lit("doc://"), F.col("doc_id").cast("string")
                ).alias("url"),
                F.timestamp_seconds(F.lit(1767225600)).alias("warc_ts"),
                F.lit(None).cast("binary").alias("html"),
                "text",
                F.lit("en").alias("lang"),
            )

        tmp = tempfile.mkdtemp(prefix="incr_stream_")
        cfg = DedupConfig(jaccard_threshold=1.01)  # exact tier only
        index = DedupIndex.build(pagify(idx_docs), cfg, f"{tmp}/idx")
        pagify(b0).coalesce(1).write.parquet(f"{tmp}/src/f0")
        pagify(b1).coalesce(1).write.parquet(f"{tmp}/src/f1")
        # pin micro-batch order: the file source processes oldest-first
        for i, sub in enumerate(("f0", "f1")):
            base = f"{tmp}/src/{sub}"
            for fn in os.listdir(base):
                os.utime(os.path.join(base, fn), (1700000000 + i * 60,) * 2)
        stream = (
            s.readStream.schema(pagify(b0).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/src/f*")
        )
        qy = (
            stream_ingest(stream, index, f"{tmp}/out", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination(300)

        outs = []
        for bi, src in ((0, b0), (1, b1)):
            sv = s.read.parquet(f"{tmp}/out/batch_id={bi}/survivors").select(
                "text_hash"
            )
            outs.append(
                src.withColumn("th", F.xxhash64("text"))
                .join(sv, F.col("th") == F.col("text_hash"))
                .groupBy("text_hash")
                .agg(F.min("doc_id").alias("keep_id"))
                .select(F.lit(bi).cast("long").alias("batch"), "keep_id")
            )
        return outs[0].unionByName(outs[1])

    q["streaming_incremental_ingest"] = stream_incr

    # --- text analytics: token/punct/stopword stats + the C4/Gopher
    #     repetition signals (duplicated word-3-gram share, top-2-gram
    #     share, mean word length) in ONE row per doc — pure JVM
    #     expressions, integer permille, bit-identical SQL (round-6 fold
    #     of text_stats + repetition_stats; repetition columns are NULL
    #     for NULL text, matching the old filter) ---
    def text_quality_stats(s, d):
        from humid_spark.functions import textstats as ts

        t = F.col("text")
        nn = t.isNotNull()
        return _ts(s, d, "documents").select(
            "doc_id",
            ts.token_count(t).cast("long").alias("tokens"),
            ts.token_estimate(t).alias("token_est"),
            ts.punct_permille(t).alias("punct_permille"),
            ts.stopword_permille(t).alias("stopword_permille"),
            F.when(nn, ts.dup_ngram_permille(t)).alias("dup3_permille"),
            F.when(nn, ts.top_ngram_share_permille(t)).alias("top2_permille"),
            F.when(nn, ts.mean_word_len_permille(t)).alias("word_len_permille"),
        )

    q["text_quality_stats"] = text_quality_stats

    def url_canonical(s, d):
        """Key-space dedup: the same fetch reachable through case drift,
        default ports, tracking params, fragments and trailing slashes
        collapses under functions/urls.canonical_url BEFORE content dedup
        ever runs.  URLs are planted deterministically from doc_id (the
        driver tables carry no url column); variant rows get id
        -doc_id-1, so every dup group's keep_doc_id pins the grouping."""
        from humid_spark.functions.urls import canonical_url

        ids = _t(s, d, "documents").select("doc_id")
        site = F.col("doc_id") % 50
        page = F.col("doc_id")

        def u(*parts):
            return F.concat(*[
                p if isinstance(p, F.Column) else F.lit(p) for p in parts
            ])

        base = ids.select(
            "doc_id",
            u("http://site", site.cast("string"), ".example.com/page/",
              page.cast("string")).alias("url"),
        )
        v1 = ids.filter(F.col("doc_id") % 4 == 1).select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            u("HTTP://SITE", site.cast("string"), ".EXAMPLE.COM:80/page/",
              page.cast("string"), "?utm_source=crawl").alias("url"),
        )
        v2 = ids.filter(F.col("doc_id") % 4 == 2).select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            u("http://site", site.cast("string"), ".example.com/page/",
              page.cast("string"), "/#section-2").alias("url"),
        )
        return (
            base.unionByName(v1).unionByName(v2)
            .select("doc_id", canonical_url(F.col("url")).alias("canon"))
            .groupBy("canon")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("doc_id").alias("keep_doc_id"))
        )

    q["url_canonical_dups"] = url_canonical

    def stratified_sample(s, d):
        """Curation-style downsampling: keep all 'good' docs, half the
        'short', a tenth of the 'noisy' — the inclusion gate is a
        deterministic md5 bucket of doc_id (functions/sampling.py), so
        the selected set is identical across engines, partitionings and
        re-runs (and nested: raising a rate only ADDS rows)."""
        from humid_spark.functions import textstats as ts
        from humid_spark.functions.sampling import sample_flag

        t = F.col("text")
        rate = (
            F.when(ts.quality_class(t) == "good", F.lit(1000))
            .when(ts.quality_class(t) == "short", F.lit(500))
            .otherwise(F.lit(100))
        )
        return (
            _t(s, d, "documents")
            .filter(t.isNotNull())
            .filter(sample_flag(F.col("doc_id"), rate))
            .select("doc_id", ts.quality_class(t).alias("quality"))
        )

    q["stratified_sample"] = stratified_sample

    def curation_funnel(s, d):
        """The END-TO-END training-data curation chain, composed from the
        library's own tiers and hash-checked as one funnel:

          input (+ planted url variants and exact re-entries)
          -> url-canonical collapse        (functions/urls.py)
          -> quality gate (drop 'short')   (functions/textstats.py)
          -> stratified deterministic sample (good 1000 / rest 700
             permille; functions/sampling.py)
          -> exact text dedup
          -> near dedup (parity MinHash -> bands -> Jaccard >= 0.5
             -> connected components)

        Plants: doc_id % 4 == 1 re-enters under a tracking-param/case
        variant url (id -2*doc_id-1; removed by the url tier);
        doc_id % 10 == 3 re-enters with identical text under a DIFFERENT
        url (id -2*doc_id-2; survives the url tier, removed by the exact
        tier when both copies survive the gates).  Disjoint odd/even
        negative id spaces — collision-free at any scale factor."""
        from humid_spark.functions import textstats as ts
        from humid_spark.functions.sampling import sample_flag
        from humid_spark.functions.signatures import sql_parity_sig_table
        from humid_spark.functions.urls import canonical_url
        from humid_spark.operators.cc import connected_components

        docs = _t(s, d, "documents").filter(
            F.col("text").isNotNull() & (F.length("text") >= MH_K)
        ).select("doc_id", "text")
        site = F.col("doc_id") % 50

        def u(*parts):
            return F.concat(*[
                p if isinstance(p, F.Column) else F.lit(p) for p in parts
            ])

        base = docs.select(
            F.col("doc_id").alias("rid"), "text",
            u("http://site", site.cast("string"), ".example.com/page/",
              F.col("doc_id").cast("string")).alias("url"),
        )
        v_url = docs.filter(F.col("doc_id") % 4 == 1).select(
            (-F.col("doc_id") * 2 - 1).alias("rid"), "text",
            u("HTTP://SITE", site.cast("string"), ".EXAMPLE.COM:80/page/",
              F.col("doc_id").cast("string"), "?utm_source=crawl")
            .alias("url"),
        )
        v_exact = docs.filter(F.col("doc_id") % 10 == 3).select(
            (-F.col("doc_id") * 2 - 2).alias("rid"), "text",
            u("http://site", site.cast("string"), ".example.com/page/",
              F.col("doc_id").cast("string"), "-alt").alias("url"),
        )
        rows = base.unionByName(v_url).unionByName(v_exact)

        url_kept = (
            rows.groupBy(canonical_url(F.col("url")).alias("canon"))
            .agg(F.min(F.struct("rid", "text")).alias("first"))
            .select(F.col("first.rid").alias("rid"),
                    F.col("first.text").alias("text"))
        )
        quality_kept = url_kept.filter(
            ts.quality_class(F.col("text")) != "short"
        )
        rate = F.when(
            ts.quality_class(F.col("text")) == "good", F.lit(1000)
        ).otherwise(F.lit(700))
        sampled = quality_kept.filter(sample_flag(F.col("rid"), rate))
        grp = sampled.groupBy("text").agg(
            F.min("rid").alias("doc_id"), F.count(F.lit(1)).alias("cnt")
        )
        tbl = sql_parity_sig_table(
            grp.select("doc_id", "text").repartition(
                s.sparkContext.defaultParallelism
            ),
            MH_K, MH_PERMS,
        ).localCheckpoint(eager=True)
        pairs = _band_join_spark(s, d, sigs=tbl.drop("sh"))
        sh = tbl.select("doc_id", "sh")
        ver = (
            pairs
            .join(sh.select(F.col("doc_id").alias("src"),
                            F.col("sh").alias("sh_a")), "src")
            .join(sh.select(F.col("doc_id").alias("dst"),
                            F.col("sh").alias("sh_b")), "dst")
            .filter(
                F.floor(F.size(F.array_intersect("sh_a", "sh_b")) * 1000
                        / F.size(F.array_union("sh_a", "sh_b")))
                >= FUNNEL_THRESH
            )
            .select("src", "dst")
        )
        comp = connected_components(ver)

        def one(df, *pairs_):
            return df.agg(*[
                expr.alias(name) for name, expr in pairs_
            ]).selectExpr(
                f"stack({len(pairs_)}, "
                + ", ".join(f"'{n}', {n}" for n, _ in pairs_)
                + ") AS (m, v)"
            )

        stages = (
            one(rows, ("n_input", F.count(F.lit(1))))
            .unionByName(one(url_kept, ("url_kept", F.count(F.lit(1)))))
            .unionByName(
                one(quality_kept, ("quality_kept", F.count(F.lit(1)))))
            .unionByName(one(sampled, ("sampled", F.count(F.lit(1)))))
            .unionByName(one(grp, ("exact_unique", F.count(F.lit(1)))))
            .unionByName(one(ver, ("near_edges", F.count(F.lit(1)))))
            .unionByName(one(comp, (
                "cc_nodes", F.count(F.lit(1))), (
                "cc_comps", F.countDistinct("component"))))
        )
        names = ("n_input", "url_kept", "quality_kept", "sampled",
                 "exact_unique", "near_edges", "cc_nodes", "cc_comps")
        row = stages.agg(*[
            F.max(F.when(F.col("m") == n, F.col("v"))).alias(n)
            for n in names
        ])
        return row.selectExpr(
            "stack(8, "
            "'n_input', n_input, "
            "'url_removed', n_input - url_kept, "
            "'quality_removed', url_kept - quality_kept, "
            "'sample_removed', quality_kept - sampled, "
            "'exact_removed', sampled - exact_unique, "
            "'near_edges', near_edges, "
            "'near_removed', cc_nodes - cc_comps, "
            "'kept', exact_unique - (cc_nodes - cc_comps)"
            ") AS (metric, value)"
        )

    q["curation_funnel"] = curation_funnel

    # --- document classification counts: quality classes and
    #     declared-lang x n-gram-heuristic lang-guess confusion cells,
    #     stacked under a `kind` tag (round-6 fold of quality_class_counts
    #     + lang_guess_counts; both classifiers still run) ---
    def doc_class_counts(s, d):
        from humid_spark.functions import textstats as ts

        docs = _ts(s, d, "documents")
        qc = (
            docs.groupBy(ts.quality_class(F.col("text")).alias("cls"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("quality").alias("kind"), "cls", "n")
        )
        lg = (
            docs.groupBy(
                F.concat(
                    F.coalesce(F.col("lang"), F.lit("")),
                    F.lit(":"),
                    F.coalesce(ts.lang_guess(F.col("text")), F.lit("")),
                ).alias("cls")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("lang").alias("kind"), "cls", "n")
        )
        return qc.unionByName(lg)

    q["doc_class_counts"] = doc_class_counts

    def fp_dups(s, d):
        from humid_spark.functions import textstats as ts

        return (
            _ts(s, d, "documents")
            .groupBy(ts.fingerprint(F.col("text")).alias("fp"))
            .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keep_doc_id"))
        )

    q["fingerprint_exact_dups"] = fp_dups

    # --- decontamination: benchmark n-gram overlap (round 6) ---
    def decontaminate_q(s, d):
        """GPT-3-style eval decontamination over the documents table.
        The benchmark is synthesized deterministically from the corpus
        itself: every doc_id % 23 == 3 contributes a 20-token prompt
        sliced from the middle of its own text (tokens 11..30), so each
        source doc is contaminated by construction whenever it has
        >= 11+8 tokens, shorter docs exercise the empty-gram path, and
        any additional hits are genuine cross-doc 8-gram repeats — all
        replayable in SQL gram-for-gram (functions/textstats twins)."""
        from humid_spark.functions.textstats import _tokens
        from humid_spark.operators.decontam import contamination_stats

        docs = _ts(s, d, "documents")
        prompt = F.concat_ws(
            " ", F.slice(_tokens(F.coalesce(F.col("text"), F.lit(""))),
                         11, 20)
        )
        bench = docs.filter(F.col("doc_id") % 23 == 3).select(
            prompt.alias("prompt")
        )
        return contamination_stats(docs, bench, n=8, prompt_col="prompt")

    q["decontaminate"] = decontaminate_q

    # --- PII scrub: emails / IPv4 / SSN-shaped ids (round 6) ---
    def pii_scrub_stats(s, d):
        """Counts + scrubbed-text digest per doc.  The corpus is lorem
        text (no real PII), so PII is PLANTED deterministically from
        doc_id: % 11 == 4 docs get two emails, % 13 == 6 docs get an
        IPv4 + an SSN-shaped id (docs ≡ 58 mod 143 get both tails).
        scrubbed_md5
        hash-checks the full redacted text without shipping it."""
        from humid_spark.functions import pii

        t = F.coalesce(F.col("text"), F.lit(""))
        planted = F.concat(
            t,
            F.when(
                F.col("doc_id") % 11 == 4,
                F.concat(F.lit(" contact user"),
                         F.col("doc_id").cast("string"),
                         F.lit("@example.org or admin@mail.example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 6,
                F.concat(F.lit(" host 10.0."),
                         (F.col("doc_id") % 256).cast("string"),
                         F.lit(".7 ssn 123-45-6789")),
            ).otherwise(F.lit("")),
        )
        return _ts(s, d, "documents").select(
            "doc_id", planted.alias("pt")
        ).select(
            "doc_id",
            pii.email_count(F.col("pt")).alias("n_emails"),
            pii.ipv4_count(F.col("pt")).alias("n_ips"),
            pii.ssn_count(F.col("pt")).alias("n_ssns"),
            F.md5(pii.scrub_pii(F.col("pt"))).alias("scrubbed_md5"),
        )

    q["pii_scrub_stats"] = pii_scrub_stats

    # --- relational coverage (agg / join / window over TPC-H-ish tables) ---
    def pricing(s, d):
        li = _t(s, d, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                # decimal sums are exact -> bit-identical across engines
                F.sum(F.col("l_quantity").cast("decimal(20,2)"))
                .cast("double").alias("sum_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(20,2)"))
                .cast("double").alias("sum_base_price"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    q["pricing_summary"] = pricing

    def top_customers(s, d):
        o = _t(s, d, "orders")
        c = _t(s, d, "customer")
        agg = o.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("order_count"),
        )
        return (
            agg.join(c, agg["o_custkey"] == c["c_custkey"])
            .filter(F.col("order_count") >= 12)
            .select(
                F.col("c_custkey").alias("custkey"),
                F.col("c_name").alias("name"),
                "order_count",
            )
        )

    q["top_customers"] = top_customers

    def events_daily(s, d):
        e = _t(s, d, "events")
        return (
            e.groupBy(
                F.date_format("ts", "yyyy-MM-dd").alias("day"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                # integer-ize per row BEFORE summing: float-sum ordering is
                # engine-dependent, integer sums are exact
                F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("value_millis"),
            )
        )

    q["events_daily"] = events_daily

    # --- window functions: sessionization over the events stream table ---
    def user_sessions(s, d):
        from pyspark.sql import Window

        e_ = _t(s, d, "events")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        es = F.col("ts").cast("timestamp").cast("long")
        prev = F.lag(es).over(w)
        new_sess = F.when(
            prev.isNull() | ((es - prev) > 1800), 1
        ).otherwise(0)
        return (
            e_.withColumn("new_sess", new_sess)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("new_sess").cast("long").alias("n_sessions"),
            )
        )

    q["user_sessions"] = user_sessions

    # --- SimHash near-dup pairs: 64-bit engine fingerprints, bit-band
    #     blocking.  Oracle-checked since round 3: the full mix64 +
    #     per-bit-majority math is re-expressed in DuckDB HUGEINT
    #     arithmetic (see oracle_sql), and the band blocking is exactly
    #     equivalent to brute-force hamming<=max_bits by pigeonhole. ---
    def simhash_pairs_q(s, d):
        from humid_spark.functions.signatures import make_simhash_udf
        from humid_spark.operators.lsh import simhash_pairs

        sims = _t(s, d, "documents").select(
            "doc_id", make_simhash_udf(MH_K)(F.col("text")).alias("simhash")
        )
        return simhash_pairs(sims).withColumn(
            "bit_dist", F.col("bit_dist").cast("long")
        )

    q["simhash_near_dups"] = simhash_pairs_q

    # --- similarity search: exact brute-force cosine top-k (strict
    #     left-to-right double summation -> engine-reproducible ranks) ---
    def ann_topk(s, d):
        from humid_spark.operators.ann import cosine_topk

        emb = _t(s, d, "embeddings")
        return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)

    q["ann_cosine_topk"] = ann_topk

    # --- similarity search: hyperplane-sketch blocked ANN (scale path;
    #     approximate -> rows-only check, recall pinned in pytest) ---
    def ann_lsh(s, d):
        from humid_spark.operators.ann import hyperplane_topk

        emb = _t(s, d, "embeddings")
        # dim is derived executor-side from the batches themselves —
        # building this query issues NO driver action (VERDICT r2 item 7)
        return hyperplane_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)

    q["ann_hyperplane_topk"] = ann_lsh

    # --- SRP-LSH with INTEGER planes (VERDICT r4 item 4): same blocking
    #     machinery, but the sketch is splitmix64-derived int64 math, so
    #     the DuckDB oracle replays sketch -> (table, bucket) equi-join ->
    #     exact rerank bit-identically.  The gaussian variant above stays
    #     rows-only (float planes aren't SQL-replayable); with this query
    #     the MACHINERY is hash-checked and only recall — inherent to any
    #     LSH — remains approximate. ---
    def ann_lsh_int(s, d):
        from humid_spark.operators.ann import hyperplane_topk

        emb = _t(s, d, "embeddings")
        return hyperplane_topk(emb, emb.filter(F.col("vec_id") < 5), k=10,
                               integer_planes=True)

    q["ann_hyperplane_int"] = ann_lsh_int

    # --- similarity search: IVF (spherical-kmeans inverted lists; the
    #     clustered-data scale path; approximate -> rows-only check,
    #     recall + full-probe-exactness pinned in tests/test_ann.py) ---
    def ann_ivf(s, d):
        from humid_spark.operators.ann import ivf_topk

        emb = _t(s, d, "embeddings")
        return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=10,
                        n_centroids=32, n_probe=8)

    q["ann_ivf_topk"] = ann_ivf

    # --- IVF with n_probe == n_centroids: every query probes every cell,
    #     so the cell-assignment + candidate equi-join + rerank machinery
    #     runs in full yet the result is EXACTLY brute-force cosine top-k
    #     — which has a DuckDB oracle.  Hash-matches the IVF plumbing;
    #     only the probe-subset selection stays rows-only (ann_ivf_topk).
    def ann_ivf_full(s, d):
        from humid_spark.operators.ann import ivf_topk

        emb = _t(s, d, "embeddings")
        return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=10,
                        n_centroids=32, n_probe=32)

    q["ann_ivf_full_probe"] = ann_ivf_full

    # --- embedding-cosine near-dup dedup: ALL-INTEGER hyperplane SimHash
    #     (quantized embeddings x splitmix64-derived integer planes) ->
    #     band-blocked hamming filter -> exact cosine verify.  The sf
    #     corpus is near-orthogonal (max cos ~0.51), so the queries PLANT
    #     deterministic near-dups inline — vec_id < 100 re-enters with
    #     dims d % 7 == 0 scaled by 1.08 (cos ~0.9995) and the NEGATED id
    #     -vec_id - 1, which is disjoint from the non-negative corpus ids
    #     at ANY scale factor (ADVICE r4: a fixed +1000000 offset collides
    #     once the corpus holds >= 1M embeddings) — with the oracle
    #     replaying the identical construction; the pair set is then
    #     hash-checked end to end (operators/embdedup.py docstring has the
    #     integer-reproducibility argument).
    #     Two variants: the 16-bit/4-band/hamming<=3 config is
    #     pigeonhole-EXHAUSTIVE, so its oracle is cheap brute-force
    #     hamming; the library-DEFAULT config (60-bit/15-bit bands,
    #     the scale-safe widths) is probabilistic, so its oracle replays
    #     the BANDING itself — both hash-checked. ---
    def _emb_planted(s, d):
        emb = _t(s, d, "embeddings")
        base = emb.select(
            "vec_id",
            F.transform(F.col("embedding"),
                        lambda x: x.cast("double")).alias("embedding"),
        )
        pert = emb.filter(F.col("vec_id") < 100).select(
            (-F.col("vec_id") - 1).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x.cast("double")
                * F.when(i % 7 == 0, F.lit(1.08)).otherwise(F.lit(1.0)),
            ).alias("embedding"),
        )
        return base.unionByName(pert)

    def emb_near_dups(s, d):
        """Round-6 fold of embedding_near_dups + embedding_near_dups_wide
        (one recorded row, both configs hash-checked): mode 'bf16' is the
        16-bit/4-band/max_bits=3 pigeonhole-exhaustive config (oracle =
        brute-force hamming), mode 'wide60' is the library default
        (60-bit/15-bit bands, oracle replays the banding itself)."""
        from humid_spark.operators.embdedup import embedding_near_dup_pairs

        base = _emb_planted(s, d)

        def tagged(mode, **kw):
            return embedding_near_dup_pairs(
                base, cos_threshold=0.99, **kw
            ).select(
                F.lit(mode).alias("mode"), "src", "dst",
                F.col("bit_dist").cast("long").alias("bit_dist"),
                "cos_permille",
            )

        return tagged("bf16", bits=16, n_bands=4, max_bits=3).unionByName(
            tagged("wide60")
        )

    q["embedding_near_dups"] = emb_near_dups

    def emb_incremental(s, d):
        """Incremental tier for EMBEDDINGS: a batch of vectors
        (vec_id % 3 == 0, plus perturbed re-entries of index vectors)
        deduplicates against the already-ingested index (vec_id % 3 != 0)
        — integer SimHash signatures, the asymmetric cross_band_pairs
        join (one-sided index caps/salting), hamming <= 3 over 4 four-bit
        bands (pigeonhole-exhaustive, so the brute-force batch-x-index
        SQL is the exact pair set), exact-cosine verify at 0.99."""
        from humid_spark.functions.signatures import hamming64
        from humid_spark.operators.ann import _norm, dot_double
        from humid_spark.operators.embdedup import embedding_simhash_udf
        from humid_spark.operators.incremental import cross_band_pairs

        emb = _t(s, d, "embeddings")
        dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        base = emb.select("vec_id", dbl.alias("v"))
        pert = emb.filter(
            (F.col("vec_id") % 3 != 0) & (F.col("vec_id") % 10 == 1)
        ).select(
            (-F.col("vec_id") - 1).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x.cast("double")
                * F.when(i % 7 == 0, F.lit(1.08)).otherwise(F.lit(1.0)),
            ).alias("v"),
        )
        corpus = base.unionByName(pert)
        bits, n_bands, max_bits = 16, 4, 3
        sigs = corpus.select(
            "vec_id", "v",
            embedding_simhash_udf(bits, 1)(F.col("v")).alias("esig"),
        ).localCheckpoint(eager=True)
        width = bits // n_bands

        def bands_of(df):
            arr = F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("esig"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
            return df.select(
                F.col("vec_id").alias("doc_id"), F.explode(arr).alias("bb")
            ).select("doc_id", "bb.band", "bb.bucket")

        is_batch = (F.col("vec_id") < 0) | (F.col("vec_id") % 3 == 0)
        cand = cross_band_pairs(
            bands_of(sigs.filter(is_batch)),
            bands_of(sigs.filter(~is_batch)),
            bucket_cap=200000,  # 16 buckets/band at 4-bit widths: sf0.01
                                # never caps; real corpora use wide bands
        )
        av = sigs.select(F.col("vec_id").alias("src"),
                         F.col("v").alias("av"),
                         F.col("esig").alias("sa"))
        bv = sigs.select(F.col("vec_id").alias("dst"),
                         F.col("v").alias("bv"),
                         F.col("esig").alias("sb"))
        cos = dot_double(F.col("av"), F.col("bv")) / (
            _norm(F.col("av")) * _norm(F.col("bv"))
        )
        return (
            cand.join(av, "src").join(bv, "dst")
            .withColumn("bit_dist",
                        hamming64(F.col("sa"), F.col("sb")).cast("long"))
            .filter(F.col("bit_dist") <= max_bits)
            .withColumn("cos", cos)
            .filter(F.col("cos") >= F.lit(0.99))
            .select(
                "src", "dst", "bit_dist",
                F.floor(F.col("cos") * 1000 + F.lit(0.5))
                .cast("long").alias("cos_permille"),
            )
        )

    q["incremental_embedding_dedup"] = emb_incremental

    # --- containment/substring dups: winnowing fingerprints (batched
    #     numpy UDF; oracle-checked — the full winnowing pass is
    #     re-expressed in DuckDB list ops, see oracle_sql) ---
    def containment_q(s, d):
        from humid_spark.operators.containment import containment_pairs

        return containment_pairs(_t(s, d, "documents"), min_share=0.6)

    q["containment_pairs"] = containment_q

    # --- directional clustering: non-SQL-expressible (sequential greedy,
    #     src/cluster.cc:39-87) -> rows-only check; exact parity is pinned by
    #     tests/test_pipeline.py against the pure-Python oracle. ---
    def directional(s, d):
        from humid_spark.operators.directional import cluster_keys

        uniq = _uniq(s, d).select(
            "key", F.col("cnt").alias("count"),
            F.lit(None).cast("timestamp").alias("first_ts"),
            F.col("first_doc_id").cast("string").alias("first_url"),
        )
        return cluster_keys(uniq, _pairs_h1(s, d)).select(
            "key", "cluster_id", "cluster_size", "max_key"
        )

    q["directional_clusters"] = directional

    # (max_clusters_n12 folded into components_n12 — see
    #  _register_dedup_chain(with_ids=True): flood fill covers the whole
    #  connected component (src/cluster.cc:72-80), so membership, size and
    #  the global seed-rank id are all SQL-expressible; the REAL engine
    #  path — per-component greedy replay in applyInPandas + global seed
    #  rank — runs inside that query.)

    # --- G2 invariants: the directional greedy is sequential (not SQL-
    #     expressible), but its OUTPUT obeys hard invariants DuckDB can pin:
    #     clusters partition the keys (size_sum == total_count), every
    #     cluster stays inside one connected component, cluster_size /
    #     max_key / max_count / seed are internally consistent, ids are
    #     dense from 1.  The Spark side measures violation counts on the
    #     real replay output; the oracle states the expected constants. ---
    def directional_invariants_n12(s, d):
        from humid_spark.operators.directional import cluster_keys

        uniq = _uniq(s, d, N12).select(
            "key", F.col("cnt").alias("count"),
            F.lit(None).cast("timestamp").alias("first_ts"),
            F.col("first_doc_id").cast("string").alias("first_url"),
        )
        cl = cluster_keys(uniq, _pairs_h1(s, d, N12))
        per = cl.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count_distinct("component").alias("n_comp"),
            F.max("cluster_size").alias("sz_max"),
            F.min("cluster_size").alias("sz_min"),
            F.sum("count").alias("cnt_sum"),
            F.count_distinct("max_key").alias("n_maxkey"),
            F.max(
                F.when(F.col("key") == F.col("max_key"), F.col("count"))
            ).alias("maxkey_cnt"),
            F.max("max_count").alias("mc"),
            F.max("count").alias("member_max_cnt"),
            F.max(
                F.when(F.col("key") == F.col("cluster_seed"), 1).otherwise(0)
            ).alias("seed_member"),
        )
        return per.agg(
            F.sum("n_members").cast("long").alias("n_keys"),
            F.sum("cnt_sum").cast("long").alias("total_count"),
            F.sum("sz_max").cast("long").alias("size_sum"),
            (
                (F.min("cluster_id") == 1)
                & (F.max("cluster_id") == F.count(F.lit(1)))
            ).alias("ids_dense"),
            F.count_if(F.col("n_comp") > 1).alias("cross_component"),
            F.count_if(
                (F.col("sz_max") != F.col("sz_min"))
                | (F.col("cnt_sum") != F.col("sz_max"))
            ).alias("size_bad"),
            F.count_if(
                (F.col("n_maxkey") != 1)
                | F.col("maxkey_cnt").isNull()
                | (F.col("maxkey_cnt") != F.col("mc"))
                | (F.col("mc") != F.col("member_max_cnt"))
            ).alias("maxkey_bad"),
            F.count_if(F.col("seed_member") == 0).alias("seed_bad"),
        )

    q["directional_invariants_n12"] = directional_invariants_n12

    # --- multimodal: exact dedup on a BINARY payload (A1 over an opaque
    #     blob column; JVM-side sha2, no UDF).  The driver tables carry no
    #     binary column, so the text bytes stand in as the blob — the
    #     operator under test is humid_spark.functions.multimodal.
    #     binary_exact_dups, unchanged. ---
    def binary_dups(s, d):
        from humid_spark.functions.multimodal import binary_exact_dups

        docs = _t(s, d, "documents").select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
            F.col("text").cast("binary").alias("blob"),
        )
        return binary_exact_dups(docs, blob_col="blob")

    q["binary_exact_dups"] = binary_dups

    # --- multimodal: REAL image decode (VERDICT r4 item 6).  The driver
    #     tables carry no image column, so the query PLANTS deterministic
    #     P6 PPM blobs (dims and every pixel byte a pure function of
    #     doc_id) and pushes them through the engine's stdlib decoder
    #     (multimodal.decode_ppm via image_stats — real header parse +
    #     raster read, decoded=True).  The oracle never builds a blob: it
    #     computes the SAME dims and exact integer channel sums straight
    #     from the planting formula, so a decoder that misreads header,
    #     stride or channel order hash-mismatches. ---
    def image_decode_stats(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.multimodal import image_stats

        # doc_id < 200: formula-pixel PPMs through the netpbm decoder;
        # doc_id in [200, 280): 8x8-BLOCK-CONSTANT grayscale baseline
        # JPEGs (round 6) through the REAL stdlib Huffman+IDCT decoder —
        # block-constant + all-ones quant round-trips BIT-EXACTLY
        # (functions/jpeg.py docstring), so the oracle replays the pixel
        # sums from the block formula v = (did*31 + by*7 + bx*3) % 200.
        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 280
        )

        def gen(batches):
            from humid_spark.functions.jpeg import encode_jpeg

            for pdf in batches:
                urls, blobs = [], []
                for did in pdf["doc_id"]:
                    did = int(did)
                    urls.append(str(did))
                    if did < 200:
                        w, h = 4 + did % 5, 3 + did % 3
                        px = bytes(
                            (did * 31 + y * 7 + x * 3 + c * 11) % 256
                            for y in range(h)
                            for x in range(w)
                            for c in range(3)
                        )
                        blobs.append(b"P6\n%d %d\n255\n" % (w, h) + px)
                        continue
                    bw, bh = 2 + did % 3, 1 + did % 2
                    by, bx = _np.mgrid[0:bh, 0:bw]
                    bv = (did * 31 + by * 7 + bx * 3) % 200
                    gray = bv.repeat(8, axis=0).repeat(8, axis=1)
                    blobs.append(encode_jpeg(gray.astype(_np.uint8)))
                yield _pd.DataFrame({"url": urls, "blob": blobs})

        planted = ids.mapInPandas(
            gen, "url string, blob binary"
        )
        return image_stats(planted, blob_col="blob")


    # --- audio: REAL WAV decode + exact integer features (round 5).
    #     Planted 16-bit PCM blobs (every sample a pure function of
    #     doc_id) go through the engine's stdlib RIFF chunk walker
    #     (functions/audio.py); the oracle computes the same
    #     n_samples / energy (sum of squares) / zero-crossings straight
    #     from the planting formula — a decoder that misparses fmt,
    #     drops frames or mis-signs samples hash-mismatches. ---
    def audio_decode_stats(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.audio import audio_stats, encode_wav

        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 200
        )

        def gen(batches):
            for pdf in batches:
                urls, blobs = [], []
                for did in pdf["doc_id"]:
                    did = int(did)
                    n = 200 + did % 100
                    rate = 8000 + (did % 3) * 4000
                    sm = ((_np.arange(n, dtype=_np.int64) * 101 + did * 37)
                          % 2001 - 1000).astype(_np.int16)
                    urls.append(str(did))
                    blobs.append(encode_wav(sm, rate))
                yield _pd.DataFrame({"url": urls, "blob": blobs})

        planted = ids.mapInPandas(gen, "url string, blob binary")
        return audio_stats(planted, blob_col="blob")


    # --- acoustic near-dup (round 5): planted PCM clips (sample
    #     v(did,i) = (did*37 + i*101) % 2001 - 1000, n = 130 + did%70)
    #     plus volume-DOUBLED copies (exact at |v| <= 1000, id
    #     's<did>') flow through the REAL chain — WAV decode -> 65-
    #     segment energy-envelope fingerprint (bit k iff E[k+1] >
    #     E[k]) -> the capped SimHash band join.  max_bits=3 <
    #     n_bands=4 keeps blocking pigeonhole-EXHAUSTIVE; the oracle
    #     replays segment energies from the formula (segment of sample
    #     i is (65*i + 64) // n — the floor-boundary inverse), packs
    #     the envelope bits as HUGEINT with the signed wrap, and
    #     brute-forces hamming <= 3.  Doubled copies land at distance
    #     0 because every energy scales by exactly 4. ---
    def audio_fp_near_dups(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.audio import audio_near_dups, encode_wav

        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 150
        )

        def gen(batches):
            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    n = 130 + did % 70
                    sm = ((_np.arange(n, dtype=_np.int64) * 101 + did * 37)
                          % 2001 - 1000).astype(_np.int16)
                    rows.append((str(did), encode_wav(sm, 8000)))
                    if did % 5 == 0:
                        rows.append(
                            ("s" + str(did), encode_wav(sm * 2, 8000))
                        )
                yield _pd.DataFrame(rows, columns=["url", "blob"])

        planted = ids.mapInPandas(gen, "url string, blob binary")
        return audio_near_dups(planted, blob_col="blob").withColumn(
            "bit_dist", F.col("bit_dist").cast("long")
        )


    # --- perceptual image dedup (round 5): planted 16x16 PPMs (pixel =
    #     (doc_id*31 + y*7 + x*3 + c*11) % 200) plus brightness-shifted
    #     copies (+8 on every pixel, id 's<doc_id>') flow through the
    #     REAL chain — stdlib decode -> all-integer 64-bit average hash
    #     -> the engine's capped SimHash band join.  max_bits=3 <
    #     n_bands=4 keeps the blocking pigeonhole-EXHAUSTIVE, so the
    #     oracle replays the aHash from the planting formula (block-sum
    #     cross-multiplication, HUGEINT bit packing, signed int64 wrap)
    #     and brute-forces hamming <= 3 — the shifted copies land at
    #     distance 0 because aHash is provably brightness-shift
    #     invariant (both sides of blk*npx > total*pb shift equally). ---
    def image_phash_near_dups(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.multimodal import image_near_dups

        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 120
        )

        def gen(batches):
            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    y, x, c = _np.meshgrid(
                        _np.arange(16), _np.arange(16), _np.arange(3),
                        indexing="ij",
                    )
                    px = ((did * 31 + y * 7 + x * 3 + c * 11) % 200
                          ).astype(_np.uint8)
                    hdr = b"P6\n16 16\n255\n"
                    rows.append((str(did), hdr + px.tobytes()))
                    if did % 4 == 0:
                        rows.append(("s" + str(did),
                                     hdr + (px + 8).tobytes()))
                yield _pd.DataFrame(rows, columns=["url", "blob"])

        planted = ids.mapInPandas(gen, "url string, blob binary")
        return image_near_dups(planted, blob_col="blob").withColumn(
            "bit_dist", F.col("bit_dist").cast("long")
        )


    # --- exact-integer resize (round 5): the planted 16x16 PPMs resize
    #     to 8x8 by block mean (output pixel = floor(2x2-block sum / 4)),
    #     re-encode as P6, and ROUND-TRIP through the engine's own
    #     decoder into channel sums — hash-checking decode, the resize
    #     arithmetic, and encode at once.  The oracle computes the block
    #     means straight from the pixel formula. ---
    def image_resize_stats(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.multimodal import image_resize, image_stats

        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 150
        )

        def gen(batches):
            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    y, x, c = _np.meshgrid(
                        _np.arange(16), _np.arange(16), _np.arange(3),
                        indexing="ij",
                    )
                    px = ((did * 31 + y * 7 + x * 3 + c * 11) % 200
                          ).astype(_np.uint8)
                    rows.append((str(did), b"P6\n16 16\n255\n" + px.tobytes()))
                yield _pd.DataFrame(rows, columns=["url", "blob"])

        planted = ids.mapInPandas(gen, "url string, blob binary")
        resized = image_resize(planted, out_w=8, out_h=8, blob_col="blob")
        return image_stats(resized, blob_col="resized").select(
            "url", "width", "height", "r_sum", "g_sum", "b_sum"
        )


    # --- video (round 5): REAL Y4M decode + exact luma stats.  Planted
    #     mono YUV4MPEG2 streams (pixel = (doc_id*53 + t*17 + y*7 + x*3)
    #     % 200 over 16x16 frames, n_frames = 4 + doc_id%4, fps
    #     12 + doc_id%3) go through the stdlib stream parser
    #     (functions/video.py); the oracle recomputes frame count,
    #     duration and the luma sum/sum-of-squares straight from the
    #     formula — a parser that misreads the header, drops frames or
    #     mis-offsets planes hash-mismatches. ---
    def video_decode_stats(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.video import encode_y4m, video_stats

        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 150
        )

        def gen(batches):
            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    n = 4 + did % 4
                    t, y, x = _np.meshgrid(
                        _np.arange(n), _np.arange(16), _np.arange(16),
                        indexing="ij",
                    )
                    f = ((did * 53 + t * 17 + y * 7 + x * 3) % 200
                         ).astype(_np.uint8)
                    rows.append(
                        (str(did), encode_y4m(f, fps=(12 + did % 3, 1)))
                    )
                yield _pd.DataFrame(rows, columns=["url", "blob"])

        planted = ids.mapInPandas(gen, "url string, blob binary")
        return video_stats(planted, blob_col="blob")


    # --- perceptual video dedup (round 5): the same planting formula
    #     at fixed n_frames=6 plus brightness-shifted copies (+8 every
    #     luma sample, id 's<doc_id>') flows through the REAL chain —
    #     Y4M decode -> frame-sample every 2nd frame (t = 0,2,4) ->
    #     per-frame 64-bit aHash -> majority-combined video signature
    #     -> the capped SimHash band join.  max_bits=3 < n_bands=4
    #     keeps blocking pigeonhole-EXHAUSTIVE, so the oracle replays
    #     the sampled-frame aHashes from the formula (HUGEINT), takes
    #     the per-bit 2-of-3 majority, packs with the signed int64
    #     wrap, and brute-forces hamming <= 3. ---
    def video_phash_near_dups(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.video import encode_y4m, video_near_dups

        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 80
        )

        def gen(batches):
            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    t, y, x = _np.meshgrid(
                        _np.arange(6), _np.arange(16), _np.arange(16),
                        indexing="ij",
                    )
                    f = ((did * 53 + t * 17 + y * 7 + x * 3) % 200
                         ).astype(_np.uint8)
                    rows.append((str(did), encode_y4m(f)))
                    if did % 5 == 0:
                        rows.append(("s" + str(did), encode_y4m(f + 8)))
                yield _pd.DataFrame(rows, columns=["url", "blob"])

        planted = ids.mapInPandas(gen, "url string, blob binary")
        return video_near_dups(planted, blob_col="blob", every=2).withColumn(
            "bit_dist", F.col("bit_dist").cast("long")
        )


    # --- video sub-clip containment (round 5): base videos from the
    #     same luma formula at n = 8 + doc_id%4 frames; for doc_id%4==0
    #     a re-posted CLIP (frames 2..7 cut contiguously, id
    #     'c<doc_id>') re-enters.  The chain is decode -> per-frame
    #     aHash -> k-gram Horner hash (base 1000003, exact uint64
    #     wraparound) -> window-min winnow (k=3, w=4) -> the text
    #     containment backend (capped inverted fp index, post-cap
    #     sizes).  Clips score share_permille exactly 1000 by the
    #     winnowing subset property.  The oracle replays every step in
    #     HUGEINT mod-2^64 arithmetic — frame hashes from the pixel
    #     formula (the clip's frame j is the base's frame j+2), Horner
    #     grams via lead(), window mins, DISTINCT fingerprints, and
    #     the share join. ---
    def video_subclip_containment(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.video import (
            encode_y4m,
            video_subclip_pairs,
        )

        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 40
        )

        def gen(batches):
            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    n = 8 + did % 4
                    t, y, x = _np.meshgrid(
                        _np.arange(n), _np.arange(16), _np.arange(16),
                        indexing="ij",
                    )
                    f = ((did * 53 + t * 17 + y * 7 + x * 3) % 200
                         ).astype(_np.uint8)
                    rows.append((str(did), encode_y4m(f)))
                    if did % 4 == 0:
                        rows.append(("c" + str(did), encode_y4m(f[2:8])))
                yield _pd.DataFrame(rows, columns=["url", "blob"])

        planted = ids.mapInPandas(gen, "url string, blob binary")
        return video_subclip_pairs(planted, blob_col="blob")

    q["video_subclip_containment"] = video_subclip_containment

    # --- video resize round-trip (round 5): the planted videos resize
    #     to 8x8 per frame (luma block mean, floor division), sampling
    #     every 2nd frame, re-encode as mono Y4M, and ROUND-TRIP
    #     through the engine's own stream parser into luma sums — the
    #     video analog of image_resize_stats.  Oracle: sum over output
    #     pixels of floor(2x2-block sum / 4) for t in (0, 2, ...). ---
    def video_resize_stats(s, d):
        import numpy as _np
        import pandas as _pd

        from humid_spark.functions.video import encode_y4m, video_resize, video_stats

        ids = _t(s, d, "documents").select("doc_id").filter(
            F.col("doc_id") < 100
        )

        def gen(batches):
            for pdf in batches:
                rows = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    n = 4 + did % 4
                    t, y, x = _np.meshgrid(
                        _np.arange(n), _np.arange(16), _np.arange(16),
                        indexing="ij",
                    )
                    f = ((did * 53 + t * 17 + y * 7 + x * 3) % 200
                         ).astype(_np.uint8)
                    rows.append(
                        (str(did), encode_y4m(f, fps=(12 + did % 3, 1)))
                    )
                yield _pd.DataFrame(rows, columns=["url", "blob"])

        planted = ids.mapInPandas(gen, "url string, blob binary")
        resized = video_resize(planted, out_w=8, out_h=8, every=2,
                               blob_col="blob")
        return video_stats(resized, blob_col="resized").select(
            "url", "width", "height", "n_frames", "fps_num", "y_sum"
        )

    # --- round-6 folds: the whole perceptual tier in THREE recorded
    #     queries (decode / near-dup / resize), every per-modality column
    #     preserved as a long-form metric row.  All three real codec
    #     paths (PPM/WAV/Y4M), all three fingerprint kernels (aHash /
    #     energy envelope / frame-majority aHash) and both resize paths
    #     still run — only the row shape changed. ---
    def multimodal_decode_stats(s, d):
        return (
            _unpivot_modal(image_decode_stats(s, d), "image", _IMG_STATS_COLS)
            .unionByName(
                _unpivot_modal(audio_decode_stats(s, d), "audio",
                               _AUD_STATS_COLS)
            )
            .unionByName(
                _unpivot_modal(video_decode_stats(s, d), "video",
                               _VID_STATS_COLS)
            )
        )

    q["multimodal_decode_stats"] = multimodal_decode_stats

    def multimodal_near_dups(s, d):
        def tag(df, m):
            return df.select(
                F.lit(m).alias("modality"), "src", "dst", "bit_dist"
            )

        return (
            tag(image_phash_near_dups(s, d), "image")
            .unionByName(tag(audio_fp_near_dups(s, d), "audio"))
            .unionByName(tag(video_phash_near_dups(s, d), "video"))
        )

    q["multimodal_near_dups"] = multimodal_near_dups

    def multimodal_resize_stats(s, d):
        return _unpivot_modal(
            image_resize_stats(s, d), "image", _IMG_RESIZE_COLS
        ).unionByName(
            _unpivot_modal(video_resize_stats(s, d), "video",
                           _VID_RESIZE_COLS)
        )

    q["multimodal_resize_stats"] = multimodal_resize_stats

    # --- streaming dedup, batch-mode analog: the Structured-Streaming
    #     operator (dropDuplicatesWithinWatermark, streaming/dedup.py)
    #     keeps the first event per key per time window; the bounded-batch
    #     equivalent is first-per-(key, tumbling-window), which DuckDB can
    #     check exactly. ---
    def events_dedup(s, d):
        e = _t(s, d, "events")
        es = F.col("ts").cast("timestamp").cast("long")
        win = F.floor(es / 600).cast("long")
        return (
            e.withColumn("es", es)
            .withColumn("win", win)
            .groupBy("user_id", "event_type", "win")
            .agg(
                F.min(
                    F.struct(F.col("es").alias("es"), F.col("event_id").alias("eid"))
                ).alias("first"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select(
                "user_id", "event_type", "win",
                F.col("first.eid").alias("keep_event_id"),
                "n_events",
            )
        )

    q["events_dedup_windowed"] = events_dedup

    # --- exact substring duplicates (the north-star's suffix-array pass;
    #     winnowing-candidate + contains() verify, recall-1 argument in
    #     humid_spark.operators.containment.substring_dups).  The word-soup
    #     docs contain no natural substring dups, so both engines derive
    #     the SAME augmented table: every 7th doc contributes a 150-char
    #     snippet (id + 1,000,000) — real contained pairs, non-vacuous. ---
    def substring_q(s, d):
        from humid_spark.operators.containment import substring_dups

        docs = _t(s, d, "documents").select("doc_id", "text")
        snip = (
            docs.filter((F.col("doc_id") % 7 == 0) & F.col("text").isNotNull())
            .select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.substring("text", 31, 150).alias("text"),
            )
        )
        return substring_dups(docs.union(snip))

    q["substring_dups"] = substring_q

    # --- REAL end-to-end Structured Streaming run (round-2 VERDICT item
    #     6): the events table is split into four (ts, url)-ordered files,
    #     replayed as micro-batches (maxFilesPerTrigger=1, availableNow)
    #     through the CUSTOM applyInPandasWithState operator
    #     (streaming/dedup.py stateful_first_seen), and the memory-sink
    #     result is returned for the DuckDB oracle.  Because the file
    #     split is ordered by (warc_ts, url), the first micro-batch that
    #     contains a fingerprint also contains its global minimum row, so
    #     the emitted set equals the batch-expressible "first row per
    #     fingerprint" regardless of how state spreads across batches
    #     (n_dups IS split-dependent, so it is not part of the checked
    #     output — its cross-batch counter semantics are pinned in
    #     tests/test_multimodal_streaming.py). ---
    def streaming_first_seen_q(s, d):
        import os
        import tempfile
        import uuid

        from pyspark.sql import Window

        from humid_spark.streaming.dedup import stateful_first_seen

        ev = _t(s, d, "events").select(
            F.col("event_id").cast("string").alias("url"),
            F.col("ts").cast("timestamp").alias("warc_ts"),
            F.col("props").alias("text"),
        )
        tmp = tempfile.mkdtemp(prefix="hs_stream_")
        data_dir = os.path.join(tmp, "data")
        os.makedirs(data_dir)
        tiles = ev.withColumn(
            "tile", F.ntile(4).over(Window.orderBy("warc_ts", "url"))
        )
        for t in range(1, 5):
            stage = os.path.join(tmp, f"stage{t}")
            (tiles.filter(F.col("tile") == t).drop("tile")
             .coalesce(1).write.mode("overwrite").parquet(stage))
            part = next(p for p in os.listdir(stage)
                        if p.endswith(".parquet"))
            dst = os.path.join(data_dir, f"batch{t}.parquet")
            os.rename(os.path.join(stage, part), dst)
            os.utime(dst, (1_700_000_000 + t, 1_700_000_000 + t))
        stream = (
            s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data_dir)
        )
        sink = f"first_seen_{uuid.uuid4().hex[:8]}"
        query = (
            stateful_first_seen(stream)
            .writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        return s.table(sink).select("fp", "url", "warc_ts")

    q["streaming_first_seen"] = streaming_first_seen_q

    missing = [k for k in _ORDER if k not in q]
    extra = [k for k in q if k not in _ORDER]
    assert not missing and not extra, (missing, extra)
    return {k: q[k] for k in _ORDER}


# The driver records the FIRST 50 registered queries (registration order =
# this list).  Round 6 (VERDICT r5 item 1): never-driver-checked queries
# lead, the 8 queries that overflowed r5's record follow, and the single
# over-budget query (#51, ann_ivf_topk) is a documented approximate
# operator whose exact twin (ann_ivf_full_probe) IS recorded — see README
# "Contract v6".
_ORDER = [
    # never driver-checked before round 6 — recorded first
    "multimodal_decode_stats",
    "multimodal_near_dups",
    "multimodal_resize_stats",
    "video_subclip_containment",
    "incremental_embedding_dedup",
    # absent from the r5 record (registry overflow) — restored
    "binary_exact_dups",
    "containment_pairs",
    "substring_dups",
    "directional_clusters",
    "directional_invariants_n12",
    "events_dedup_windowed",
    "streaming_first_seen",
    # n=24 reference-config dedup chain (folded, see _register_dedup_chain)
    "exact_dup_counts", "neighbour_pairs", "dedup_histograms",
    "components", "representatives", "annotate",
    # n=12 chain — real merges at sf0.01; components_n12 carries the
    # maximum-clustering ids (former max_clusters_n12)
    "exact_dup_counts_n12", "neighbour_pairs_n12", "dedup_histograms_n12",
    "components_n12", "representatives_n12", "annotate_n12",
    # core web-dedup + incremental tiers
    "scalar_stats", "signatures", "lsh_band_pairs", "ngram_jaccard_pairs",
    "simhash_near_dups", "web_dedup_funnel",
    "incremental_exact_dedup", "incremental_near_dups",
    "incremental_clusters", "streaming_incremental_ingest",
    # curation / text analysis (round 6 adds decontamination + PII scrub)
    "text_quality_stats", "doc_class_counts", "url_canonical_dups",
    "stratified_sample", "curation_funnel", "fingerprint_exact_dups",
    "decontaminate", "pii_scrub_stats",
    # relational coverage (agg / join / window)
    "pricing_summary", "top_customers", "events_daily", "user_sessions",
    # embeddings / ANN (embedding_near_dups carries bf16 + wide60 modes —
    # round-6 fold of the former embedding_near_dups_wide row)
    "embedding_near_dups",
    "ann_cosine_topk", "ann_hyperplane_int", "ann_ivf_full_probe",
    # documented-approximate tail (pytest recall + exact twins above)
    "ann_hyperplane_topk",
    "ann_ivf_topk",
]


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    _register_dedup_chain_sql(o, N, "")
    _register_dedup_chain_sql(o, N12, "_n12", with_ids=True)

    o["scalar_stats"] = (
        "SELECT count(*) AS total, "
        "count(*) FILTER (WHERE text IS NOT NULL AND length(text) >= 24) AS usable, "
        "count(DISTINCT CASE WHEN text IS NOT NULL AND length(text) >= 24 "
        "THEN substr(text, 1, 24) END) AS \"unique\" FROM documents"
    )

    from humid_spark.functions.signatures import simhash_sql_duckdb

    o["signatures"] = (
        f"SELECT m.*, x.simhash16 FROM ({_sig_sql_duck()}) m JOIN "
        f"(SELECT doc_id, {simhash_sql_duckdb('text', MH_K)} AS simhash16 "
        f"FROM documents) x USING (doc_id)"
    )

    o["lsh_band_pairs"] = _band_join_duck()

    o["ngram_jaccard_pairs"] = f"""
        WITH sh AS ({_SQL_SHINGLES}), p AS ({_band_join_duck()})
        SELECT p.src, p.dst,
               (1000 * len(list_intersect(a.sh, b.sh)))
                 // len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard_permille
        FROM p JOIN sh a ON p.src = a.doc_id JOIN sh b ON p.dst = b.doc_id
    """

    # --- web_dedup_funnel: the full dedup chain replayed in SQL —
    #     planted exact dups -> text grouping -> md5-parity signatures ->
    #     band join -> Jaccard >= FUNNEL_THRESH -> recursive-CTE
    #     connected components -> tier counts.  Hash-matching this checks
    #     the engine's CC over document pairs end to end (counts are
    #     labeling-convention-free but break on any wrong merge/split). ---
    from humid_spark.functions.signatures import P31 as _P31
    from humid_spark.functions.signatures import _sql_perm_coeffs

    _fsh = (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(1, length(text) - {MH_K - 1})), "
        f"i -> cast(('0x' || substr(md5(substring(text, i, {MH_K})), 1, 14))"
        f" as bigint) % {_P31}))"
    )
    _fmins = ", ".join(
        f"list_min(list_transform(sh, h -> ((h * {a}) % {_P31} + {b})"
        f" % {_P31})) AS h{j}"
        for j, (a, b) in enumerate(_sql_perm_coeffs(MH_PERMS))
    )
    _fbands = " OR ".join(
        "(" + " AND ".join(
            f"a.h{MH_BAND_R * b + i} = b.h{MH_BAND_R * b + i}"
            for i in range(MH_BAND_R)
        ) + ")"
        for b in range(MH_PERMS // MH_BAND_R)
    )
    o["web_dedup_funnel"] = f"""
        WITH RECURSIVE
        corpus AS (
          SELECT doc_id, text FROM documents
          WHERE text IS NOT NULL AND length(text) >= {MH_K}
          UNION ALL
          SELECT -doc_id - 1, text FROM documents
          WHERE doc_id % 10 = 0 AND text IS NOT NULL
            AND length(text) >= {MH_K}
        ),
        grp AS (SELECT min(doc_id) AS doc_id, any_value(text) AS text,
                       count(*) AS cnt
                FROM corpus GROUP BY text),
        shg AS (SELECT doc_id, {_fsh} AS sh FROM grp),
        sigs AS (SELECT doc_id, {_fmins} FROM shg),
        cand AS (
          SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({_fbands})
        ),
        ver AS (
          SELECT c.src, c.dst
          FROM cand c JOIN shg x ON c.src = x.doc_id
                      JOIN shg y ON c.dst = y.doc_id
          WHERE (1000 * len(list_intersect(x.sh, y.sh)))
                // len(list_distinct(list_concat(x.sh, y.sh)))
                >= {FUNNEL_THRESH}
        ),
        edges AS (SELECT src, dst FROM ver
                  UNION ALL SELECT dst, src FROM ver),
        nodes AS (SELECT DISTINCT src AS n FROM edges),
        reach(n, comp) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.src, r.comp FROM reach r JOIN edges e ON e.dst = r.n
        ),
        cc AS (SELECT n, min(comp) AS comp FROM reach GROUP BY n),
        agg AS (
          SELECT (SELECT CAST(sum(cnt) AS BIGINT) FROM grp) AS total_usable,
                 (SELECT count(*) FROM grp) AS exact_unique,
                 (SELECT count(*) FROM ver) AS near_edges,
                 (SELECT count(*) FROM cc) AS cc_nodes,
                 (SELECT count(DISTINCT comp) FROM cc) AS cc_comps
        )
        SELECT metric, CAST(value AS BIGINT) AS value FROM (
          SELECT 'total_usable' AS metric, total_usable AS value FROM agg
          UNION ALL SELECT 'exact_unique', exact_unique FROM agg
          UNION ALL SELECT 'exact_removed', total_usable - exact_unique
            FROM agg
          UNION ALL SELECT 'near_edges', near_edges FROM agg
          UNION ALL SELECT 'near_removed', cc_nodes - cc_comps FROM agg
          UNION ALL SELECT 'kept', exact_unique - (cc_nodes - cc_comps)
            FROM agg
        )
    """

    from humid_spark.functions import textstats as ts

    o["text_quality_stats"] = (
        f"SELECT doc_id, {ts.sql_token_count('text')} AS tokens, "
        f"(length(coalesce(text, '')) + 3) // 4 AS token_est, "
        f"{ts.sql_punct_permille('text')} AS punct_permille, "
        f"{ts.sql_stopword_permille('text')} AS stopword_permille, "
        f"CASE WHEN text IS NOT NULL THEN "
        f"{ts.sql_dup_ngram_permille('text')} END AS dup3_permille, "
        f"CASE WHEN text IS NOT NULL THEN "
        f"{ts.sql_top_ngram_share_permille('text')} END AS top2_permille, "
        f"CASE WHEN text IS NOT NULL THEN "
        f"{ts.sql_mean_word_len_permille('text')} END AS word_len_permille "
        f"FROM documents"
    )

    from humid_spark.functions.urls import sql_canonical_url

    o["url_canonical_dups"] = f"""
        WITH planted AS (
          SELECT doc_id,
                 'http://site' || CAST(doc_id % 50 AS VARCHAR) ||
                 '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents
          UNION ALL
          SELECT -doc_id - 1,
                 'HTTP://SITE' || CAST(doc_id % 50 AS VARCHAR) ||
                 '.EXAMPLE.COM:80/page/' || CAST(doc_id AS VARCHAR) ||
                 '?utm_source=crawl'
          FROM documents WHERE doc_id % 4 = 1
          UNION ALL
          SELECT -doc_id - 1,
                 'http://site' || CAST(doc_id % 50 AS VARCHAR) ||
                 '.example.com/page/' || CAST(doc_id AS VARCHAR) ||
                 '/#section-2'
          FROM documents WHERE doc_id % 4 = 2
        )
        SELECT {sql_canonical_url('url')} AS canon, count(*) AS n,
               min(doc_id) AS keep_doc_id
        FROM planted GROUP BY 1
    """

    from humid_spark.functions.sampling import sql_sample_flag

    _q_rate = (
        f"(case when {ts.sql_quality_class('text')} = 'good' then 1000 "
        f"when {ts.sql_quality_class('text')} = 'short' then 500 "
        f"else 100 end)"
    )
    o["stratified_sample"] = (
        f"SELECT doc_id, {ts.sql_quality_class('text')} AS quality "
        f"FROM documents WHERE text IS NOT NULL "
        f"AND {sql_sample_flag('doc_id', _q_rate)}"
    )

    # curation_funnel: every tier is individually SQL-replayable (canonical
    # url, quality class, md5 sample gate, text grouping, parity sigs,
    # banding, Jaccard, recursive-CTE components) — this replays the whole
    # COMPOSITION.  The url tier keeps arg-min-by-rid (Spark: min over
    # struct(rid, text); rid is unique per group, so it is the same pick).
    _cur_rate = (
        f"(case when {ts.sql_quality_class('text')} = 'good' "
        f"then 1000 else 700 end)"
    )
    o["curation_funnel"] = f"""
        WITH RECURSIVE
        d AS (SELECT doc_id, text FROM documents
              WHERE text IS NOT NULL AND length(text) >= {MH_K}),
        rows_ AS (
          SELECT doc_id AS rid, text,
                 'http://site' || CAST(doc_id % 50 AS VARCHAR) ||
                 '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url
          FROM d
          UNION ALL
          SELECT -doc_id * 2 - 1, text,
                 'HTTP://SITE' || CAST(doc_id % 50 AS VARCHAR) ||
                 '.EXAMPLE.COM:80/page/' || CAST(doc_id AS VARCHAR) ||
                 '?utm_source=crawl'
          FROM d WHERE doc_id % 4 = 1
          UNION ALL
          SELECT -doc_id * 2 - 2, text,
                 'http://site' || CAST(doc_id % 50 AS VARCHAR) ||
                 '.example.com/page/' || CAST(doc_id AS VARCHAR) || '-alt'
          FROM d WHERE doc_id % 10 = 3
        ),
        uk AS (
          SELECT min(rid) AS rid, arg_min(text, rid) AS text
          FROM rows_ GROUP BY {sql_canonical_url('url')}
        ),
        qk AS (SELECT rid, text FROM uk
               WHERE {ts.sql_quality_class('text')} != 'short'),
        sk AS (SELECT rid, text FROM qk
               WHERE {sql_sample_flag('rid', _cur_rate)}),
        grp AS (SELECT text, min(rid) AS doc_id, count(*) AS cnt
                FROM sk GROUP BY text),
        shg AS (SELECT doc_id, {_fsh} AS sh FROM grp),
        sigs AS (SELECT doc_id, {_fmins} FROM shg),
        cand AS (
          SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({_fbands})
        ),
        ver AS (
          SELECT c.src, c.dst
          FROM cand c JOIN shg x ON c.src = x.doc_id
                      JOIN shg y ON c.dst = y.doc_id
          WHERE (1000 * len(list_intersect(x.sh, y.sh)))
                // len(list_distinct(list_concat(x.sh, y.sh)))
                >= {FUNNEL_THRESH}
        ),
        edges AS (SELECT src, dst FROM ver
                  UNION ALL SELECT dst, src FROM ver),
        nodes AS (SELECT DISTINCT src AS n FROM edges),
        reach(n, comp) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.src, r.comp FROM reach r JOIN edges e ON e.dst = r.n
        ),
        cc AS (SELECT n, min(comp) AS comp FROM reach GROUP BY n),
        agg AS (
          SELECT (SELECT count(*) FROM rows_) AS n_input,
                 (SELECT count(*) FROM uk) AS url_kept,
                 (SELECT count(*) FROM qk) AS quality_kept,
                 (SELECT count(*) FROM sk) AS sampled,
                 (SELECT count(*) FROM grp) AS exact_unique,
                 (SELECT count(*) FROM ver) AS near_edges,
                 (SELECT count(*) FROM cc) AS cc_nodes,
                 (SELECT count(DISTINCT comp) FROM cc) AS cc_comps
        )
        SELECT metric, CAST(value AS BIGINT) AS value FROM (
          SELECT 'n_input' AS metric, n_input AS value FROM agg
          UNION ALL SELECT 'url_removed', n_input - url_kept FROM agg
          UNION ALL SELECT 'quality_removed', url_kept - quality_kept
            FROM agg
          UNION ALL SELECT 'sample_removed', quality_kept - sampled
            FROM agg
          UNION ALL SELECT 'exact_removed', sampled - exact_unique FROM agg
          UNION ALL SELECT 'near_edges', near_edges FROM agg
          UNION ALL SELECT 'near_removed', cc_nodes - cc_comps FROM agg
          UNION ALL SELECT 'kept', exact_unique - (cc_nodes - cc_comps)
            FROM agg
        )
    """

    o["doc_class_counts"] = (
        f"SELECT 'quality' AS kind, {ts.sql_quality_class('text')} AS cls, "
        f"count(*) AS n FROM documents GROUP BY 2 "
        f"UNION ALL "
        f"SELECT 'lang' AS kind, coalesce(lang, '') || ':' || "
        f"coalesce({ts.sql_lang_guess('text')}, '') AS cls, "
        f"count(*) AS n FROM documents GROUP BY 2"
    )

    # streaming_first_seen: the streamed result equals "first (ts, url)
    # row per props-fingerprint" because the micro-batch file split is
    # (ts, url)-ordered (see queries()) — batch-expressible exactly.
    _ev_fp = __import__(
        "humid_spark.functions.textstats", fromlist=["sql_fingerprint"]
    ).sql_fingerprint("props")
    o["streaming_first_seen"] = f"""
        SELECT fp, url, warc_ts FROM (
          SELECT {_ev_fp} AS fp,
                 CAST(event_id AS VARCHAR) AS url, ts AS warc_ts,
                 row_number() OVER (PARTITION BY {_ev_fp}
                                    ORDER BY ts, CAST(event_id AS VARCHAR)) AS rn
          FROM events)
        WHERE rn = 1
    """

    o["fingerprint_exact_dups"] = (
        f"SELECT {ts.sql_fingerprint('text')} AS fp, count(*) AS n, "
        f"min(doc_id) AS keep_doc_id FROM documents GROUP BY 1"
    )

    # --- decontamination: gram-for-gram replay of the benchmark-overlap
    #     broadcast join (operators/decontam.py).  The prompt is the
    #     lowercased token slice 11..30 of every doc_id % 23 == 3 doc;
    #     matched_ngrams counts DISTINCT doc 8-grams hitting the distinct
    #     benchmark gram set. ---
    _toks = ts._sql_tokens("coalesce(text, '')")
    o["decontaminate"] = f"""
        WITH bench AS (
          SELECT array_to_string({_toks}[11:30], ' ') AS prompt
          FROM documents WHERE doc_id % 23 = 3
        ),
        bgrams AS (
          SELECT DISTINCT unnest({ts.sql_word_ngrams('prompt', 8)}) AS g
          FROM bench
        ),
        dgrams AS (
          SELECT doc_id,
                 unnest(list_distinct({ts.sql_word_ngrams('text', 8)})) AS g
          FROM documents
        ),
        m AS (
          SELECT dg.doc_id, count(*) AS c
          FROM dgrams dg JOIN bgrams b USING (g) GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(m.c, 0) AS BIGINT) AS matched_ngrams,
               coalesce(m.c, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN m USING (doc_id)
    """

    from humid_spark.functions import pii as _pii

    o["pii_scrub_stats"] = f"""
        WITH planted AS (
          SELECT doc_id,
                 coalesce(text, '')
                 || CASE WHEN doc_id % 11 = 4
                    THEN ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.org or admin@mail.example.com'
                    ELSE '' END
                 || CASE WHEN doc_id % 13 = 6
                    THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                         || '.7 ssn 123-45-6789'
                    ELSE '' END AS pt
          FROM documents)
        SELECT doc_id,
               {_pii.sql_email_count('pt')} AS n_emails,
               {_pii.sql_ipv4_count('pt')} AS n_ips,
               {_pii.sql_ssn_count('pt')} AS n_ssns,
               md5({_pii.sql_scrub_pii('pt')}) AS scrubbed_md5
        FROM planted
    """

    # --- incremental (batch-vs-index) dedup: replay the index/batch split
    #     and the planted re-entries, then the anti-join / asymmetric band
    #     join in SQL.  bucket_cap=2000 never fires at sf<=0.01 (the whole
    #     index is smaller than one cap), so the uncapped SQL join is the
    #     exact pair set; salting is pair-set-invariant by construction
    #     (pinned by tests/test_incremental.py). ---
    o["incremental_exact_dedup"] = f"""
        WITH idx AS (
          SELECT doc_id, text FROM documents
          WHERE text IS NOT NULL AND doc_id % 3 != 0
        ),
        batch AS (
          SELECT doc_id, text FROM documents
          WHERE text IS NOT NULL AND doc_id % 3 = 0
          UNION ALL
          SELECT -doc_id - 1, text FROM idx WHERE doc_id % 10 = 1
        )
        SELECT b.doc_id FROM batch b
        WHERE {ts.sql_fingerprint('b.text')} NOT IN
              (SELECT {ts.sql_fingerprint('text')} FROM idx)
    """

    o["incremental_near_dups"] = f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          WHERE text IS NOT NULL AND length(text) >= {MH_K}
          UNION ALL
          SELECT -doc_id - 1, text || ' near dup copy' FROM documents
          WHERE doc_id % 3 != 0 AND doc_id % 10 = 1
            AND text IS NOT NULL AND length(text) >= {MH_K}
        ),
        shg AS (SELECT doc_id, {_fsh} AS sh FROM corpus),
        sigs AS (SELECT doc_id, {_fmins} FROM shg),
        bsig AS (SELECT * FROM sigs WHERE doc_id < 0 OR doc_id % 3 = 0),
        isig AS (SELECT * FROM sigs
                 WHERE doc_id >= 0 AND doc_id % 3 != 0),
        cand AS (
          SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
          FROM bsig a JOIN isig b ON ({_fbands})
        )
        SELECT c.src, c.dst,
               (1000 * len(list_intersect(x.sh, y.sh)))
                 // len(list_distinct(list_concat(x.sh, y.sh)))
                 AS jaccard_permille
        FROM cand c JOIN shg x ON c.src = x.doc_id
                    JOIN shg y ON c.dst = y.doc_id
        WHERE (1000 * len(list_intersect(x.sh, y.sh)))
                // len(list_distinct(list_concat(x.sh, y.sh)))
                >= {FUNNEL_THRESH}
    """

    # incremental_clusters: for ONE snapshot the incremental composition
    # (index CC, then batch-bounded edges + merge-on-read relabel) equals
    # a full CC over the union pair set — every unordered pair is either
    # index-index (paid at build), batch-batch (within-batch family) or
    # batch-index (cross family).  The replay is therefore one
    # recursive-CTE CC over the exact-collapsed union, singletons kept
    # with cluster = own id.
    o["incremental_clusters"] = f"""
        WITH RECURSIVE
        d AS (SELECT doc_id, text FROM documents
              WHERE text IS NOT NULL AND length(text) >= {MH_K}),
        idx AS (SELECT doc_id, text FROM d WHERE doc_id % 3 != 0),
        batch AS (
          SELECT doc_id, text FROM d WHERE doc_id % 3 = 0
          UNION ALL
          SELECT -doc_id * 2 - 1, text || ' near dup copy'
          FROM idx WHERE doc_id % 10 = 1
          UNION ALL
          SELECT -doc_id * 2 - 2, text || ' second variant tail'
          FROM d WHERE doc_id % 3 = 0 AND doc_id % 10 = 3
        ),
        igrp AS (SELECT min(doc_id) AS doc_id, text FROM idx
                 GROUP BY text),
        bgrp AS (SELECT min(doc_id) AS doc_id, text FROM batch
                 GROUP BY text),
        fresh AS (SELECT doc_id, text FROM bgrp
                  WHERE text NOT IN (SELECT text FROM igrp)),
        allr AS (SELECT doc_id, text FROM igrp
                 UNION ALL SELECT doc_id, text FROM fresh),
        shg AS (SELECT doc_id, {_fsh} AS sh FROM allr),
        sigs AS (SELECT doc_id, {_fmins} FROM shg),
        cand AS (
          SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({_fbands})
        ),
        ver AS (
          SELECT c.src, c.dst
          FROM cand c JOIN shg x ON c.src = x.doc_id
                      JOIN shg y ON c.dst = y.doc_id
          WHERE (1000 * len(list_intersect(x.sh, y.sh)))
                // len(list_distinct(list_concat(x.sh, y.sh)))
                >= {FUNNEL_THRESH}
        ),
        edges AS (SELECT src, dst FROM ver
                  UNION ALL SELECT dst, src FROM ver),
        nodes AS (SELECT DISTINCT src AS n FROM edges),
        reach(n, comp) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT e.src, r.comp FROM reach r JOIN edges e ON e.dst = r.n
        ),
        cc AS (SELECT n, min(comp) AS comp FROM reach GROUP BY n)
        SELECT a.doc_id, COALESCE(cc.comp, a.doc_id) AS cluster
        FROM allr a LEFT JOIN cc ON a.doc_id = cc.n
    """

    # streaming_incremental_ingest: the exact tier is text-equality, so
    # the two-micro-batch ingest replays as set algebra — batch-1
    # survivors exclude BOTH the index and every batch-0 text (batch 0's
    # survivors were appended; its non-survivors were in the index
    # already).
    o["streaming_incremental_ingest"] = """
        WITH d AS (SELECT doc_id, text FROM documents
                   WHERE text IS NOT NULL AND length(text) >= 5),
        idx AS (SELECT doc_id, text FROM d WHERE doc_id % 3 = 2),
        b0 AS (SELECT doc_id, text FROM d WHERE doc_id % 3 = 1
               UNION ALL
               SELECT -doc_id - 1, text FROM idx WHERE doc_id % 10 = 2),
        b1 AS (SELECT doc_id, text FROM d WHERE doc_id % 3 = 0
               UNION ALL
               SELECT -doc_id - 1, text FROM d
               WHERE doc_id % 3 = 1 AND doc_id % 10 = 1)
        SELECT CAST(0 AS BIGINT) AS batch, min(doc_id) AS keep_id FROM b0
        WHERE text NOT IN (SELECT text FROM idx) GROUP BY text
        UNION ALL
        SELECT CAST(1 AS BIGINT), min(doc_id) FROM b1
        WHERE text NOT IN (SELECT text FROM idx)
          AND text NOT IN (SELECT text FROM b0) GROUP BY text
    """

    o["pricing_summary"] = (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    )

    o["top_customers"] = (
        "SELECT c_custkey AS custkey, c_name AS name, order_count "
        "FROM (SELECT o_custkey, count(*) AS order_count FROM orders "
        "      GROUP BY o_custkey) a "
        "JOIN customer ON o_custkey = c_custkey WHERE order_count >= 12"
    )

    o["events_daily"] = (
        "SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, "
        "count(*) AS n, "
        "CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS value_millis "
        "FROM events GROUP BY 1, 2"
    )

    o["user_sessions"] = """
        WITH x AS (
          SELECT user_id,
                 CASE WHEN prev IS NULL OR (es - prev) > 1800 THEN 1 ELSE 0 END AS new_sess
          FROM (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
                   lag(CAST(floor(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events) t)
        SELECT user_id, count(*) AS n_events,
               CAST(sum(new_sess) AS BIGINT) AS n_sessions
        FROM x GROUP BY user_id
    """

    o["ann_cosine_topk"] = """
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        dots AS (
          SELECT q.vec_id AS qid, e.vec_id AS cid,
            list_sum(list_transform(generate_series(1, len(e.embedding)),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) AS dot,
            sqrt(list_sum(list_transform(generate_series(1, len(q.embedding)),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) AS qn,
            sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) AS cn
          FROM embeddings e, q WHERE e.vec_id <> q.vec_id
        ),
        r AS (SELECT qid, cid,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY dot / (qn * cn) DESC, cid) AS rank
              FROM dots)
        SELECT qid, cid, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
    """

    # IVF at n_probe == n_centroids degenerates to exact brute-force cosine
    # (every cell probed), so the full-probe query shares the exact oracle —
    # hash-matching the cell-assign/equi-join/rerank machinery end to end.
    o["ann_ivf_full_probe"] = o["ann_cosine_topk"]

    # --- ann_hyperplane_int: the INTEGER SRP sketch is exact int64 math
    #     (quantize -> int plane dots -> packed sign-bit buckets), so the
    #     sketch AND the (table, bucket) candidate equi-join replay
    #     bit-identically in DuckDB; the rerank reuses the strict
    #     left-to-right double scoring the exact ANN oracle already
    #     hash-matches.  Dim fixed at 64 (the driver embeddings table);
    #     defaults n_tables=16, bits=8, seed=42. ---
    from humid_spark.functions.signatures import mix64_duckdb as _mx
    from humid_spark.operators.embdedup import QUANT as _Q
    from humid_spark.operators.embdedup import WEIGHT_MOD as _WM

    _srp_mix = _mx("(42 * 4294967296::HUGEINT + i)")
    o["ann_hyperplane_int"] = f"""
        WITH ve AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        qt AS (
          SELECT vec_id,
            list_transform(v, x -> CAST(floor(x * {_Q}.0 + 0.5) AS BIGINT)) AS qv
          FROM ve
        ),
        planes AS (
          SELECT i // 64 AS p, i % 64 AS d,
            CAST(({_srp_mix}) % {_WM} AS BIGINT) - {_WM // 2} AS w
          FROM (SELECT unnest(generate_series(0, {16 * 8 * 64 - 1})) AS i)
        ),
        dots AS (
          SELECT qt.vec_id, planes.p, sum(qt.qv[planes.d + 1] * planes.w) AS dot
          FROM qt, planes GROUP BY 1, 2
        ),
        sk AS (
          SELECT vec_id, p // 8 AS tbl,
            CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << (p % 8)) ELSE 0 END)
                 AS BIGINT) AS bucket
          FROM dots GROUP BY 1, 2
        ),
        cand AS (
          SELECT DISTINCT skq.vec_id AS qid, skc.vec_id AS cid
          FROM sk skc JOIN sk skq
            ON skc.tbl = skq.tbl AND skc.bucket = skq.bucket
          WHERE skq.vec_id < 5 AND skc.vec_id <> skq.vec_id
        ),
        scored AS (
          SELECT c.qid, c.cid,
            list_sum(list_transform(generate_series(1, len(x.v)),
              i -> x.v[i] * y.v[i]))
            / (sqrt(list_sum(list_transform(generate_series(1, len(x.v)),
                 i -> x.v[i] * x.v[i])))
               * sqrt(list_sum(list_transform(generate_series(1, len(y.v)),
                 i -> y.v[i] * y.v[i])))) AS score
          FROM cand c
          JOIN ve x ON x.vec_id = c.qid
          JOIN ve y ON y.vec_id = c.cid
        ),
        r AS (
          SELECT qid, cid,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, cid) AS rank
          FROM scored
        )
        SELECT qid, cid, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
    """

    # --- embedding_near_dups: the integer hyperplane SimHash is exact
    #     int64 math (quantize -> int plane dot -> sign bits), so DuckDB
    #     replays it bit-identically: planes from mix64 over the flat
    #     index (seed*2^32 + p*dim + d) mod 2001 - 1000, quantization
    #     floor(x*1024 + 0.5) (identical float64 semantics), brute-force
    #     hamming<=3 == the band-blocked set by pigeonhole (3 < 4 bands),
    #     cosine via the same strict left-to-right double sums as the ANN
    #     oracle.  Dim fixed at 64 (the driver embeddings table); the
    #     planted near-dups replicate the Spark query's construction. ---
    from humid_spark.functions.signatures import mix64_duckdb
    from humid_spark.operators.embdedup import QUANT, WEIGHT_MOD

    _edim, _eseed = 64, 1
    _emix = mix64_duckdb(f"({_eseed} * 4294967296::HUGEINT + i)")

    _EMB_PERTURB = """
            list_transform(generate_series(1, len(embedding)), i ->
              CAST(embedding[i] AS DOUBLE) *
              (CASE WHEN (i - 1) % 7 = 0 THEN 1.08 ELSE 1.0 END))"""

    def _emb_sig_ctes(bits: int, ve_sql: str | None = None) -> str:
        """Shared CTEs: planted corpus (negated ids — collision-free at any
        scale, ADVICE r4; override via ve_sql), quantization, integer
        planes, signatures."""
        ve = ve_sql or f"""
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
          UNION ALL
          SELECT -vec_id - 1, {_EMB_PERTURB}
          FROM embeddings WHERE vec_id < 100
        """
        return f"""
        ve AS ({ve}),
        q AS (
          SELECT vec_id,
            list_transform(v, x -> CAST(floor(x * {QUANT}.0 + 0.5) AS BIGINT)) AS qv
          FROM ve
        ),
        planes AS (
          SELECT i // {_edim} AS p, i % {_edim} AS d,
            CAST(({_emix}) % {WEIGHT_MOD} AS BIGINT) - {WEIGHT_MOD // 2} AS w
          FROM (SELECT unnest(generate_series(0, {bits * _edim - 1})) AS i)
        ),
        dots AS (
          SELECT q.vec_id, planes.p, sum(q.qv[planes.d + 1] * planes.w) AS dot
          FROM q, planes GROUP BY 1, 2
        ),
        sigs AS (
          SELECT vec_id,
            CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)
                 AS BIGINT) AS esig
          FROM dots GROUP BY 1
        )"""

    _emb_verify_sql = """
        ver AS (
          SELECT c.src, c.dst, c.bit_dist,
            list_sum(list_transform(generate_series(1, len(x.v)),
              i -> x.v[i] * y.v[i])) AS dot,
            sqrt(list_sum(list_transform(generate_series(1, len(x.v)),
              i -> x.v[i] * x.v[i]))) AS xn,
            sqrt(list_sum(list_transform(generate_series(1, len(y.v)),
              i -> y.v[i] * y.v[i]))) AS yn
          FROM cand c
          JOIN ve x ON x.vec_id = c.src
          JOIN ve y ON y.vec_id = c.dst
        )
        SELECT src, dst, bit_dist,
               CAST(floor(dot / (xn * yn) * 1000 + 0.5) AS BIGINT)
                 AS cos_permille
        FROM ver WHERE dot / (xn * yn) >= 0.99
    """

    # 16-bit variant: hamming<=3 over 4 bands is pigeonhole-exhaustive, so
    # brute-force hamming IS the band-blocked set — the cheap oracle.
    _emb_bf16_sql = f"""
        WITH {_emb_sig_ctes(16)},
        cand AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 CAST(bit_count(xor(a.esig, b.esig)) AS BIGINT) AS bit_dist
          FROM sigs a, sigs b
          WHERE a.vec_id < b.vec_id
            AND bit_count(xor(a.esig, b.esig)) <= 3
        ),
        {_emb_verify_sql}
    """

    # Library-default widths (60-bit sig, 4 bands of 15 bits, hamming<=11):
    # max_bits >= n_bands, so blocking is probabilistic and brute-force
    # hamming would OVER-approximate the engine's pair set.  The oracle
    # instead replays the BANDING itself — band value extraction is plain
    # integer shift/mask (the 60-bit signature is non-negative, so
    # arithmetic and unsigned shifts agree between Spark and DuckDB) —
    # hash-checking the exact candidate machinery the library default runs.
    _emb_wide_sql = f"""
        WITH {_emb_sig_ctes(60)},
        bands AS (
          SELECT s.vec_id, s.esig, b.b AS band,
                 (s.esig >> (b.b * 15)) & 32767 AS val
          FROM sigs s, (SELECT unnest([0, 1, 2, 3]) AS b) b
        ),
        cand0 AS (
          SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.val = b.val AND a.vec_id < b.vec_id
        ),
        cand AS (
          SELECT c.src, c.dst,
                 CAST(bit_count(xor(sa.esig, sb.esig)) AS BIGINT) AS bit_dist
          FROM cand0 c
          JOIN sigs sa ON sa.vec_id = c.src
          JOIN sigs sb ON sb.vec_id = c.dst
          WHERE bit_count(xor(sa.esig, sb.esig)) <= 11
        ),
        {_emb_verify_sql}
    """

    # round-6 fold: one recorded row carries BOTH configs (see the
    # emb_near_dups docstring in queries())
    o["embedding_near_dups"] = f"""
        SELECT 'bf16' AS mode, * FROM ({_emb_bf16_sql})
        UNION ALL
        SELECT 'wide60' AS mode, * FROM ({_emb_wide_sql})
    """

    # incremental embedding dedup: batch (vec_id % 3 == 0 + perturbed
    # re-entries of index vectors) vs index (% 3 != 0).  hamming <= 3
    # over 4 bands is pigeonhole-exhaustive, so brute-force batch-x-index
    # hamming IS the cross-band-blocked set; signatures replay via the
    # shared integer CTEs over the split corpus.
    _ve_incr = f"""
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
          UNION ALL
          SELECT -vec_id - 1, {_EMB_PERTURB}
          FROM embeddings WHERE vec_id % 3 != 0 AND vec_id % 10 = 1
        """
    o["incremental_embedding_dedup"] = f"""
        WITH {_emb_sig_ctes(16, _ve_incr)},
        cand AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 CAST(bit_count(xor(a.esig, b.esig)) AS BIGINT) AS bit_dist
          FROM (SELECT * FROM sigs WHERE vec_id < 0 OR vec_id % 3 = 0) a,
               (SELECT * FROM sigs WHERE vec_id >= 0 AND vec_id % 3 != 0) b
          WHERE bit_count(xor(a.esig, b.esig)) <= 3
        ),
        {_emb_verify_sql}
    """

    # --- containment_pairs: winnowing IS deterministic integer math, so
    #     the whole pass (k-gram polynomial hash mod P31, window-w minima,
    #     per-doc distinct, inverted index with the fp_cap, containment
    #     share) is expressible in DuckDB list ops.  The engine hashes
    #     UTF-8 BYTES; the SQL uses ascii() per char — identical because
    #     the driver's documents are pure ASCII (checked; a non-ASCII
    #     corpus would need a blob-based formulation). ---
    wk, ww, wcap = 8, 16, 500   # containment_pairs defaults
    wpow = [0] * wk
    _p = 1
    for _i in range(wk - 1, -1, -1):
        wpow[_i] = _p
        _p = (_p * 131) % P31
    wterms = " + ".join(
        f"CAST(ascii(substring(text, i+{j}, 1)) AS BIGINT) * {wpow[j]}"
        for j in range(wk)
    )
    o["containment_pairs"] = f"""
        WITH fps AS (
          SELECT doc_id,
            list_distinct(
              CASE WHEN len(h) <= {ww} THEN [list_min(h)]
                   ELSE list_transform(generate_series(1, len(h) - {ww - 1}),
                                       p -> list_min(h[p:p+{ww - 1}]))
              END) AS fps
          FROM (
            SELECT doc_id,
              list_transform(generate_series(1, length(text) - {wk - 1}),
                             i -> ({wterms}) % {P31}) AS h
            FROM documents WHERE text IS NOT NULL AND length(text) >= {wk})
        ),
        inv AS (SELECT doc_id AS doc, unnest(fps) AS fp FROM fps),
        cold AS (SELECT fp FROM inv GROUP BY fp HAVING count(*) <= {wcap}),
        inv2 AS (SELECT doc, fp FROM inv JOIN cold USING (fp)),
        -- sizes over the POST-cap index, matching the engine (demoted
        -- fingerprints leave numerator and denominator consistently)
        sizes AS (SELECT doc, count(*) AS n_fp FROM inv2 GROUP BY doc),
        shared AS (
          SELECT a.doc AS src, b.doc AS dst, count(*) AS shared
          FROM inv2 a JOIN inv2 b ON a.fp = b.fp AND a.doc < b.doc
          GROUP BY a.doc, b.doc)
        SELECT s.src, s.dst,
               (s.shared * 1000) // least(na.n_fp, nb.n_fp) AS share_permille
        FROM shared s
        JOIN sizes na ON s.src = na.doc
        JOIN sizes nb ON s.dst = nb.doc
        WHERE (s.shared * 1000) // least(na.n_fp, nb.n_fp) >= 600
    """

    # --- simhash_near_dups: the engine's full 64-bit SimHash is
    #     deterministic integer math, so it is DuckDB-expressible end to
    #     end: same ascii()-byte k-gram polynomial hashes as the winnowing
    #     oracle, per-doc distinct, the splitmix64 avalanche in HUGEINT
    #     (mod-2^64 wrap emulated — signatures.mix64_duckdb, verified
    #     bit-identical to numpy), per-bit majority votes as 64 aggregate
    #     terms over the unnested (doc, mixed) rows, signed-int64 wrap to
    #     match Spark LongType.  Pair generation is brute-force
    #     hamming<=3 — exactly the engine's band-blocked + verified +
    #     distinct pair set, by the pigeonhole argument in
    #     lsh.simhash_pairs.
    #     VALIDITY: ASCII-only corpora.  The engine hashes UTF-8 BYTES
    #     (np.frombuffer over text.encode) while ascii(substring(..)) here
    #     hashes CODEPOINTS over char positions — identical iff every char
    #     is single-byte.  The driver's documents table is pure ASCII
    #     (checked, same caveat as the winnowing oracle above); a
    #     non-ASCII corpus needs a blob/encode()-based reformulation
    #     before this oracle's hash-match means anything. ---
    from humid_spark.functions.signatures import mix64_duckdb

    sh_terms = " + ".join(
        f"CAST(ascii(substring(text, i+{j}, 1)) AS BIGINT) * "
        f"{pow(131, MH_K - 1 - j, P31)}"
        for j in range(MH_K)
    )
    sh_bit_aggs = " + ".join(
        f"CASE WHEN sum(CAST((m >> {b}) % 2 AS BIGINT)) * 2 > count(*) "
        f"THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END"
        for b in range(64)
    )
    o["simhash_near_dups"] = f"""
        WITH sh AS (
          SELECT doc_id,
            CASE WHEN text IS NULL OR length(text) < {MH_K} THEN []
                 ELSE list_distinct(list_transform(
                     generate_series(1, length(text) - {MH_K - 1}),
                     i -> ({sh_terms}) % {P31}))
            END AS hu
          FROM documents),
        mixed AS (
          SELECT doc_id, {mix64_duckdb('cast(m as hugeint)')} AS m
          FROM (SELECT doc_id, unnest(hu) AS m FROM sh)),
        words AS (
          SELECT doc_id, ({sh_bit_aggs}) AS w
          FROM mixed GROUP BY doc_id),
        sims AS (
          SELECT s.doc_id,
                 CAST(CASE WHEN COALESCE(w.w, 0) >= 9223372036854775808
                      THEN COALESCE(w.w, 0) - 18446744073709551616
                      ELSE COALESCE(w.w, 0) END AS BIGINT) AS sim
          FROM sh s LEFT JOIN words w USING (doc_id))
        SELECT a.doc_id AS src, b.doc_id AS dst,
               CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS bit_dist
        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= 3
    """

    o["directional_invariants_n12"] = f"""
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(cnt) AS BIGINT) AS total_count,
               CAST(sum(cnt) AS BIGINT) AS size_sum,
               true AS ids_dense,
               CAST(0 AS BIGINT) AS cross_component,
               CAST(0 AS BIGINT) AS size_bad,
               CAST(0 AS BIGINT) AS maxkey_bad,
               CAST(0 AS BIGINT) AS seed_bad
        FROM ({_sql_uniq(N12)})
    """

    o["binary_exact_dups"] = (
        "SELECT sha256(text) AS sha256, count(*) AS n, "
        "min('doc://' || CAST(doc_id AS VARCHAR)) AS keep_url "
        "FROM documents WHERE text IS NOT NULL GROUP BY 1"
    )

    # Channel sums computed from the planting formula, never from bytes:
    # sum over (x, y) of (doc_id*31 + y*7 + x*3 + c*11) % 256 per channel.
    _img_decode_sql = """
        WITH ids AS (
          SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 3 AS h
          FROM documents WHERE doc_id < 200
        ),
        px AS (
          SELECT i.doc_id, i.w, i.h, y.y, x.x
          FROM ids i,
               unnest(generate_series(0, i.h - 1)) AS y(y),
               unnest(generate_series(0, i.w - 1)) AS x(x)
        ),
        sums AS (
          SELECT doc_id, any_value(w) AS w, any_value(h) AS h,
            sum((doc_id * 31 + y * 7 + x * 3) % 256) AS r_sum,
            sum((doc_id * 31 + y * 7 + x * 3 + 11) % 256) AS g_sum,
            sum((doc_id * 31 + y * 7 + x * 3 + 22) % 256) AS b_sum
          FROM px GROUP BY doc_id
        )
        SELECT CAST(doc_id AS VARCHAR) AS url,
               CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
               'PPM' AS format, TRUE AS decoded,
               CAST(3 AS INTEGER) AS channels,
               CAST(r_sum AS BIGINT) AS r_sum,
               CAST(g_sum AS BIGINT) AS g_sum,
               CAST(b_sum AS BIGINT) AS b_sum
        FROM sums
        UNION ALL
        SELECT url, width, height, format, decoded, channels,
               r_sum, g_sum, b_sum
        FROM (
          WITH jids AS (
            SELECT doc_id, 2 + doc_id % 3 AS bw, 1 + doc_id % 2 AS bh
            FROM documents WHERE doc_id >= 200 AND doc_id < 280
          ),
          blocks AS (
            SELECT j.doc_id, j.bw, j.bh,
                   (j.doc_id * 31 + by.by * 7 + bx.bx * 3) % 200 AS v
            FROM jids j,
                 unnest(generate_series(0, j.bh - 1)) AS by(by),
                 unnest(generate_series(0, j.bw - 1)) AS bx(bx)
          ),
          agg AS (
            SELECT doc_id, any_value(bw) AS bw, any_value(bh) AS bh,
                   CAST(64 * sum(v) AS BIGINT) AS s
            FROM blocks GROUP BY doc_id
          )
          SELECT CAST(doc_id AS VARCHAR) AS url,
                 CAST(bw * 8 AS INTEGER) AS width,
                 CAST(bh * 8 AS INTEGER) AS height,
                 'JPEG' AS format, TRUE AS decoded,
                 CAST(1 AS INTEGER) AS channels,
                 s AS r_sum,
                 CAST(NULL AS BIGINT) AS g_sum,
                 CAST(NULL AS BIGINT) AS b_sum
          FROM agg
        )
    """

    # Audio features computed from the planting formula, never from
    # bytes: sample v(doc_id, i) = (doc_id*37 + i*101) % 2001 - 1000.
    _aud_decode_sql = """
        WITH ids AS (
          SELECT doc_id, 200 + doc_id % 100 AS n,
                 8000 + (doc_id % 3) * 4000 AS rate
          FROM documents WHERE doc_id < 200
        ),
        s AS (
          SELECT i.doc_id, i.n, i.rate, t.i,
                 (i.doc_id * 37 + t.i * 101) % 2001 - 1000 AS v
          FROM ids i, unnest(generate_series(0, i.n - 1)) AS t(i)
        ),
        lagged AS (
          SELECT *, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
          FROM s
        ),
        agg AS (
          SELECT doc_id, any_value(n) AS n, any_value(rate) AS rate,
                 sum(v * v) AS sumsq,
                 sum(CASE WHEN prev IS NOT NULL
                          AND ((v < 0) <> (prev < 0))
                     THEN 1 ELSE 0 END) AS zc
          FROM lagged GROUP BY doc_id
        )
        SELECT CAST(doc_id AS VARCHAR) AS url, TRUE AS decoded,
               CAST(1 AS INTEGER) AS n_channels,
               CAST(rate AS INTEGER) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
               CAST(sumsq AS BIGINT) AS sumsq,
               CAST(zc AS BIGINT) AS zero_crossings
        FROM agg
    """

    # Envelope fingerprint replayed from the sample formula: segment of
    # sample i at clip length n is (65*i + 64) // n (inverse of the
    # floor boundary k*n//65); energies sum v^2 per segment (the scaled
    # copy uses 2v, so every energy is exactly 4x); bit k iff
    # E[k+1] > E[k]; HUGEINT packing, signed wrap, hamming <= 3 pairs.
    _aud_nd_sql = """
        WITH clips AS (
          SELECT CAST(doc_id AS VARCHAR) AS url, doc_id,
                 130 + doc_id % 70 AS n, 1 AS scale
          FROM documents WHERE doc_id < 150
          UNION ALL
          SELECT 's' || CAST(doc_id AS VARCHAR) AS url, doc_id,
                 130 + doc_id % 70 AS n, 2 AS scale
          FROM documents WHERE doc_id < 150 AND doc_id % 5 = 0
        ),
        s AS (
          SELECT c.url, (65 * t.i + 64) // c.n AS seg,
                 ((c.doc_id * 37 + t.i * 101) % 2001 - 1000) * c.scale AS v
          FROM clips c, unnest(generate_series(0, c.n - 1)) AS t(i)
        ),
        e AS (
          SELECT url, seg, sum(v * v) AS energy FROM s GROUP BY url, seg
        ),
        delta AS (
          SELECT url, seg,
                 lead(energy) OVER (PARTITION BY url ORDER BY seg) AS nxt,
                 energy
          FROM e
        ),
        fp AS (
          SELECT url,
                 sum(CASE WHEN nxt > energy
                          THEN CAST(1 AS HUGEINT) << seg
                          ELSE CAST(0 AS HUGEINT) END) AS p
          FROM delta WHERE seg < 64 GROUP BY url
        ),
        sh AS (
          SELECT url,
                 CAST(CASE WHEN p >= CAST(1 AS HUGEINT) << 63
                           THEN p - (CAST(1 AS HUGEINT) << 64)
                           ELSE p END AS BIGINT) AS afp
          FROM fp
        )
        SELECT a.url AS src, b.url AS dst,
               CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS bit_dist
        FROM sh a JOIN sh b ON a.url < b.url
        WHERE bit_count(xor(a.afp, b.afp)) <= 3
    """

    # Resized-image channel sums from the pixel formula: output pixel
    # (oy, ox, c) = floor(sum of the 2x2 input block / 4); sums per
    # channel over the 8x8 output.  width/height echo the SOURCE dims.
    _img_resize_sql = """
        WITH ids AS (
          SELECT doc_id FROM documents WHERE doc_id < 150
        ),
        px AS (
          SELECT i.doc_id, y.y // 2 AS oy, x.x // 2 AS ox, c.c,
                 (i.doc_id*31 + y.y*7 + x.x*3 + c.c*11) % 200 AS v
          FROM ids i,
               unnest(generate_series(0, 15)) AS y(y),
               unnest(generate_series(0, 15)) AS x(x),
               unnest([0, 1, 2]) AS c(c)
        ),
        blocks AS (
          SELECT doc_id, oy, ox, c, sum(v) // 4 AS out_v
          FROM px GROUP BY doc_id, oy, ox, c
        ),
        sums AS (
          SELECT doc_id,
                 sum(CASE WHEN c = 0 THEN out_v ELSE 0 END) AS r_sum,
                 sum(CASE WHEN c = 1 THEN out_v ELSE 0 END) AS g_sum,
                 sum(CASE WHEN c = 2 THEN out_v ELSE 0 END) AS b_sum
          FROM blocks GROUP BY doc_id
        )
        SELECT CAST(doc_id AS VARCHAR) AS url,
               CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               CAST(r_sum AS BIGINT) AS r_sum,
               CAST(g_sum AS BIGINT) AS g_sum,
               CAST(b_sum AS BIGINT) AS b_sum
        FROM sums
    """

    # aHash replayed from the pixel formula: gray = 3-channel sum, 2x2
    # block sums (16x16 image, 8x8 grid), bit iff bsum*64 > total
    # (cross-multiplied block-mean vs global-mean), HUGEINT packing with
    # the signed int64 wrap; pairs brute-forced at hamming <= 3 (equal to
    # the engine's band blocking by pigeonhole, max_bits < n_bands).
    _img_nd_sql = """
        WITH imgs AS (
          SELECT CAST(doc_id AS VARCHAR) AS url, doc_id, 0 AS shift
          FROM documents WHERE doc_id < 120
          UNION ALL
          SELECT 's' || CAST(doc_id AS VARCHAR) AS url, doc_id, 8 AS shift
          FROM documents WHERE doc_id < 120 AND doc_id % 4 = 0
        ),
        px AS (
          SELECT im.url, y.y, x.x,
              ((im.doc_id*31 + y.y*7 + x.x*3) % 200 + im.shift)
            + ((im.doc_id*31 + y.y*7 + x.x*3 + 11) % 200 + im.shift)
            + ((im.doc_id*31 + y.y*7 + x.x*3 + 22) % 200 + im.shift)
              AS gray
          FROM imgs im,
               unnest(generate_series(0, 15)) AS y(y),
               unnest(generate_series(0, 15)) AS x(x)
        ),
        tot AS (SELECT url, sum(gray) AS total FROM px GROUP BY url),
        blk AS (
          SELECT url, y // 2 AS by, x // 2 AS bx, sum(gray) AS bsum
          FROM px GROUP BY url, y // 2, x // 2
        ),
        ah AS (
          SELECT b.url,
                 sum(CASE WHEN b.bsum * 64 > t.total
                          THEN CAST(1 AS HUGEINT) << (b.by * 8 + b.bx)
                          ELSE CAST(0 AS HUGEINT) END) AS p
          FROM blk b JOIN tot t USING (url)
          GROUP BY b.url
        ),
        sh AS (
          SELECT url,
                 CAST(CASE WHEN p >= CAST(1 AS HUGEINT) << 63
                           THEN p - (CAST(1 AS HUGEINT) << 64)
                           ELSE p END AS BIGINT) AS ahash
          FROM ah
        )
        SELECT a.url AS src, b.url AS dst,
               CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS bit_dist
        FROM sh a JOIN sh b ON a.url < b.url
        WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
    """

    # Video stats replayed from the planting formula, never from bytes:
    # luma v(doc_id, t, y, x) = (doc_id*53 + t*17 + y*7 + x*3) % 200
    # over n = 4 + doc_id%4 frames of 16x16 at fps 12 + doc_id%3.
    _vid_decode_sql = """
        WITH ids AS (
          SELECT doc_id, 4 + doc_id % 4 AS n, 12 + doc_id % 3 AS fps
          FROM documents WHERE doc_id < 150
        ),
        px AS (
          SELECT i.doc_id, i.n, i.fps,
                 (i.doc_id*53 + t.t*17 + y.y*7 + x.x*3) % 200 AS v
          FROM ids i,
               unnest(generate_series(0, i.n - 1)) AS t(t),
               unnest(generate_series(0, 15)) AS y(y),
               unnest(generate_series(0, 15)) AS x(x)
        ),
        agg AS (
          SELECT doc_id, any_value(n) AS n, any_value(fps) AS fps,
                 sum(v) AS ysum, sum(v * v) AS ysumsq
          FROM px GROUP BY doc_id
        )
        SELECT CAST(doc_id AS VARCHAR) AS url, TRUE AS decoded,
               CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
               CAST(n AS BIGINT) AS n_frames,
               CAST(fps AS INTEGER) AS fps_num,
               CAST(1 AS INTEGER) AS fps_den,
               CAST(n * 1000 // fps AS BIGINT) AS duration_ms,
               CAST(ysum AS BIGINT) AS y_sum,
               CAST(ysumsq AS BIGINT) AS y_sumsq
        FROM agg
    """

    # Per-sampled-frame aHash (t = 0,2,4) from the luma formula —
    # 2x2 block sums, bit iff bsum*64 > frame total (the mono
    # cross-multiplication), HUGEINT packing — then the per-bit 2-of-3
    # majority combine, the signed int64 wrap, and brute-forced pairs
    # at hamming <= 3 (equal to the engine's band blocking by
    # pigeonhole, max_bits < n_bands).
    _vid_nd_sql = """
        WITH vids AS (
          SELECT CAST(doc_id AS VARCHAR) AS url, doc_id, 0 AS shift
          FROM documents WHERE doc_id < 80
          UNION ALL
          SELECT 's' || CAST(doc_id AS VARCHAR) AS url, doc_id, 8 AS shift
          FROM documents WHERE doc_id < 80 AND doc_id % 5 = 0
        ),
        px AS (
          SELECT v.url, t.t, y.y, x.x,
                 (v.doc_id*53 + t.t*17 + y.y*7 + x.x*3) % 200 + v.shift
                   AS luma
          FROM vids v,
               unnest([0, 2, 4]) AS t(t),
               unnest(generate_series(0, 15)) AS y(y),
               unnest(generate_series(0, 15)) AS x(x)
        ),
        tot AS (
          SELECT url, t, sum(luma) AS total FROM px GROUP BY url, t
        ),
        blk AS (
          SELECT url, t, y // 2 AS by, x // 2 AS bx, sum(luma) AS bsum
          FROM px GROUP BY url, t, y // 2, x // 2
        ),
        fh AS (
          SELECT b.url, b.t,
                 sum(CASE WHEN b.bsum * 64 > tt.total
                          THEN CAST(1 AS HUGEINT) << (b.by * 8 + b.bx)
                          ELSE CAST(0 AS HUGEINT) END) AS p
          FROM blk b JOIN tot tt USING (url, t)
          GROUP BY b.url, b.t
        ),
        bits AS (
          SELECT f.url, g.b,
                 sum(CAST((f.p >> g.b) & 1 AS INTEGER)) AS cnt,
                 count(*) AS nf
          FROM fh f, unnest(generate_series(0, 63)) AS g(b)
          GROUP BY f.url, g.b
        ),
        sig AS (
          SELECT url,
                 sum(CASE WHEN cnt * 2 > nf
                          THEN CAST(1 AS HUGEINT) << b
                          ELSE CAST(0 AS HUGEINT) END) AS p
          FROM bits GROUP BY url
        ),
        sh AS (
          SELECT url,
                 CAST(CASE WHEN p >= CAST(1 AS HUGEINT) << 63
                           THEN p - (CAST(1 AS HUGEINT) << 64)
                           ELSE p END AS BIGINT) AS vhash
          FROM sig
        )
        SELECT a.url AS src, b.url AS dst,
               CAST(bit_count(xor(a.vhash, b.vhash)) AS BIGINT) AS bit_dist
        FROM sh a JOIN sh b ON a.url < b.url
        WHERE bit_count(xor(a.vhash, b.vhash)) <= 3
    """

    # Resized-video luma sums from the formula: sampled frames t in
    # (0, 2, ...) of n = 4 + doc_id%4; output pixel = floor(2x2-block
    # sum / 4); width/height/n_frames/fps are the RESIZED stream's
    # (8x8, ceil(n/2) frames, source fps preserved by the re-encode).
    _vid_resize_sql = """
        WITH ids AS (
          SELECT doc_id, 4 + doc_id % 4 AS n, 12 + doc_id % 3 AS fps
          FROM documents WHERE doc_id < 100
        ),
        px AS (
          SELECT i.doc_id, i.n, i.fps, t.t, y.y // 2 AS oy, x.x // 2 AS ox,
                 (i.doc_id*53 + t.t*17 + y.y*7 + x.x*3) % 200 AS v
          FROM ids i,
               unnest(generate_series(0, i.n - 1)) AS t(t),
               unnest(generate_series(0, 15)) AS y(y),
               unnest(generate_series(0, 15)) AS x(x)
          WHERE t.t % 2 = 0
        ),
        blocks AS (
          SELECT doc_id, any_value(n) AS n, any_value(fps) AS fps,
                 t, oy, ox, sum(v) // 4 AS out_v
          FROM px GROUP BY doc_id, t, oy, ox
        ),
        agg AS (
          SELECT doc_id, any_value(n) AS n, any_value(fps) AS fps,
                 count(DISTINCT t) AS nf, sum(out_v) AS ysum
          FROM blocks GROUP BY doc_id
        )
        SELECT CAST(doc_id AS VARCHAR) AS url,
               CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
               CAST(nf AS BIGINT) AS n_frames,
               CAST(fps AS INTEGER) AS fps_num,
               CAST(ysum AS BIGINT) AS y_sum
        FROM agg
    """

    o["multimodal_decode_stats"] = (
        _unpivot_modal_sql(_img_decode_sql, "image", _IMG_STATS_COLS)
        + " UNION ALL "
        + _unpivot_modal_sql(_aud_decode_sql, "audio", _AUD_STATS_COLS)
        + " UNION ALL "
        + _unpivot_modal_sql(_vid_decode_sql, "video", _VID_STATS_COLS)
    )

    o["multimodal_near_dups"] = (
        f"SELECT 'image' AS modality, src, dst, bit_dist FROM ({_img_nd_sql}) "
        f"UNION ALL "
        f"SELECT 'audio' AS modality, src, dst, bit_dist FROM ({_aud_nd_sql}) "
        f"UNION ALL "
        f"SELECT 'video' AS modality, src, dst, bit_dist FROM ({_vid_nd_sql})"
    )

    o["multimodal_resize_stats"] = (
        _unpivot_modal_sql(_img_resize_sql, "image", _IMG_RESIZE_COLS)
        + " UNION ALL "
        + _unpivot_modal_sql(_vid_resize_sql, "video", _VID_RESIZE_COLS)
    )

    # Sub-clip containment replayed end to end: per-frame aHash from
    # the luma formula (clip frame j = base frame j+2), 3-gram Horner
    # hashes in HUGEINT mod-2^64 (base 1000003 — exactly the numpy
    # uint64 wraparound), window-min over 4 consecutive grams, DISTINCT
    # fingerprints, then the inverted-index share join (no fingerprint
    # is hot at this corpus size, so the fp_cap=500 path is a no-op on
    # both sides).  share_permille floors shared*1000/min(sizes).
    o["video_subclip_containment"] = """
        WITH vids AS (
          SELECT CAST(doc_id AS VARCHAR) AS url, doc_id,
                 8 + doc_id % 4 AS nf, 0 AS off
          FROM documents WHERE doc_id < 40
          UNION ALL
          SELECT 'c' || CAST(doc_id AS VARCHAR) AS url, doc_id,
                 6 AS nf, 2 AS off
          FROM documents WHERE doc_id < 40 AND doc_id % 4 = 0
        ),
        px AS (
          SELECT v.url, j.j, y.y, x.x,
                 (v.doc_id*53 + (j.j + v.off)*17 + y.y*7 + x.x*3) % 200
                   AS luma
          FROM vids v,
               unnest(generate_series(0, v.nf - 1)) AS j(j),
               unnest(generate_series(0, 15)) AS y(y),
               unnest(generate_series(0, 15)) AS x(x)
        ),
        tot AS (
          SELECT url, j, sum(luma) AS total FROM px GROUP BY url, j
        ),
        blk AS (
          SELECT url, j, y // 2 AS by, x // 2 AS bx, sum(luma) AS bsum
          FROM px GROUP BY url, j, y // 2, x // 2
        ),
        fh AS (
          SELECT b.url, b.j,
                 sum(CASE WHEN b.bsum * 64 > t.total
                          THEN CAST(1 AS HUGEINT) << (b.by * 8 + b.bx)
                          ELSE CAST(0 AS HUGEINT) END) AS p
          FROM blk b JOIN tot t USING (url, j)
          GROUP BY b.url, b.j
        ),
        grams AS (
          SELECT url, j,
                 ((p * 1000003 % (CAST(1 AS HUGEINT) << 64)
                   + lead(p, 1) OVER wj)
                  % (CAST(1 AS HUGEINT) << 64) * 1000003
                  % (CAST(1 AS HUGEINT) << 64)
                  + lead(p, 2) OVER wj)
                 % (CAST(1 AS HUGEINT) << 64) AS g,
                 count(*) OVER (PARTITION BY url) AS nf
          FROM fh
          WINDOW wj AS (PARTITION BY url ORDER BY j)
        ),
        wm AS (
          SELECT url, j,
                 min(g) OVER (PARTITION BY url ORDER BY j
                              ROWS BETWEEN CURRENT ROW
                              AND 3 FOLLOWING) AS fp,
                 nf - 2 AS ngrams
          FROM grams WHERE j <= nf - 3
        ),
        fps AS (
          SELECT DISTINCT url, fp FROM wm WHERE j <= ngrams - 4
        ),
        sizes AS (SELECT url, count(*) AS n_fp FROM fps GROUP BY url),
        shared AS (
          SELECT a.url AS src, b.url AS dst, count(*) AS shared
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.url < b.url
          GROUP BY a.url, b.url
        )
        SELECT s.src, s.dst,
               CAST(floor(s.shared * 1000.0 /
                          least(na.n_fp, nb.n_fp)) AS BIGINT)
                 AS share_permille
        FROM shared s
        JOIN sizes na ON na.url = s.src
        JOIN sizes nb ON nb.url = s.dst
        WHERE s.shared * 1000 >= 700 * least(na.n_fp, nb.n_fp)
    """

    o["events_dedup_windowed"] = """
        WITH x AS (
          SELECT user_id, event_type, event_id,
                 CAST(floor(epoch(ts)) AS BIGINT) AS es,
                 CAST(floor(epoch(ts)) AS BIGINT) // 600 AS win
          FROM events),
        r AS (SELECT user_id, event_type, win, event_id,
                     row_number() OVER (PARTITION BY user_id, event_type, win
                                        ORDER BY es, event_id) AS rn,
                     count(*) OVER (PARTITION BY user_id, event_type, win)
                       AS n_events
              FROM x)
        SELECT user_id, event_type, win, event_id AS keep_event_id, n_events
        FROM r WHERE rn = 1
    """

    o["substring_dups"] = """
        WITH aug AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, substring(text, 31, 150) AS text
          FROM documents WHERE doc_id % 7 = 0 AND text IS NOT NULL
        )
        SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc
        FROM aug a JOIN aug b ON a.doc_id <> b.doc_id
        WHERE a.text IS NOT NULL AND b.text IS NOT NULL
          AND length(a.text) >= 23 AND contains(b.text, a.text)
    """

    # ann_hyperplane_topk / ann_ivf_topk intentionally omitted: approximate
    # operators (random-hyperplane blocking / kmeans inverted lists); the
    # driver records rows-only, and tests/test_ann.py pins recall against
    # the exact operator (plus full-probe == exact for IVF).
    # directional_clusters intentionally omitted: sequential greedy semantics
    # (reference src/cluster.cc:39-87) are not SQL-expressible; the driver
    # records the weaker rows-only check and pytest pins exact parity.
    return o
