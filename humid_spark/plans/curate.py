"""Training-data curation pipeline: quality gate -> deterministic sample
-> web dedup, as one library call.

The contract query `curation_funnel` (__spark_entry__.py) hash-checks this
chain's semantics against a full SQL replay; this module is the
user-facing surface — real pages in, curated representatives out, with a
per-tier funnel the operator can read off one DataFrame.

Tier order is deliberate: the quality gate and the sample run BEFORE
signatures are computed, so a page dropped for quality never costs a
MinHash, and the sample is an md5 gate on the url (functions/sampling.py)
— partitioning-independent, nested across rates, reproducible on any
engine.  URL canonicalization is the web pipeline's own
cfg.canonicalize_urls flag (variant fetches collapse into one doc id
before the exact tier).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from humid_spark.config import DedupConfig
from humid_spark.functions.sampling import sample_flag
from humid_spark.functions.textstats import quality_class
from humid_spark.plans.webdedup import WebDedupResult, run_web_pipeline


@dataclass
class CurationResult:
    pages: DataFrame      # the raw input
    gated: DataFrame      # after the quality gate
    sampled: DataFrame    # after the deterministic sample
    clean: DataFrame      # after decontamination (== sampled w/o bench)
    web: WebDedupResult   # dedup tiers over the clean pages
    kept: DataFrame       # one representative page per cluster

    def release(self, checkpoints: bool = False) -> None:
        self.web.release(checkpoints=checkpoints)

    def funnel(self) -> DataFrame:
        """(metric, value) rows: the curation tiers prepended to the web
        pipeline's own dedup funnel (combine_single_rows' join-free
        shape — a crossJoin would breach the no-cartesian hygiene bar)."""
        from humid_spark.functions.rows import combine_single_rows

        row = combine_single_rows([
            self.pages.agg(F.count(F.lit(1)).alias("n_input")),
            self.gated.agg(F.count(F.lit(1)).alias("gated")),
            self.sampled.agg(F.count(F.lit(1)).alias("sampled")),
            self.clean.agg(F.count(F.lit(1)).alias("clean")),
        ])
        head = row.selectExpr(
            "stack(4, "
            "'n_input', n_input, "
            "'quality_removed', n_input - gated, "
            "'sample_removed', gated - sampled, "
            "'contaminated_removed', sampled - clean"
            ") AS (metric, value)"
        )
        return head.unionByName(self.web.funnel())


def run_curation_pipeline(
    pages: DataFrame,
    cfg: DedupConfig,
    *,
    quality_drop: tuple[str, ...] = ("short",),
    sample_rates: dict[str, int] | None = None,
    default_rate: int = 1000,
    bench: DataFrame | None = None,
    decontam_n: int = 13,
    decontam_prompt_col: str = "text",
) -> CurationResult:
    """quality_drop: quality classes removed outright.  sample_rates:
    permille kept per remaining quality class (md5-gated on url; classes
    absent from the map keep default_rate).  bench: optional benchmark
    table — pages sharing any word decontam_n-gram with it are dropped
    (operators/decontam.py; hashed broadcast, runs AFTER the sample so a
    sampled-away page never costs a gram explode).  Dedup semantics —
    schemes, thresholds, containment, url canonicalization — come from
    cfg."""
    qc = quality_class(F.col("text"))
    gated = pages.filter(~qc.isin(list(quality_drop)))
    rate = F.lit(default_rate)
    for cls, permille in (sample_rates or {}).items():
        rate = F.when(qc == cls, F.lit(permille)).otherwise(rate)
    sampled = gated.filter(sample_flag(F.col("url"), rate))
    if bench is not None:
        from humid_spark.operators.decontam import decontaminate

        clean = decontaminate(
            sampled, bench, decontam_n,
            id_col=["url", "warc_ts"], prompt_col=decontam_prompt_col,
            hashed=True,
        )
    else:
        clean = sampled
    web = run_web_pipeline(clean, cfg)
    return CurationResult(
        pages=pages, gated=gated, sampled=sampled, clean=clean, web=web,
        kept=web.dedup,
    )
