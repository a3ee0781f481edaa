"""humid_spark — a from-scratch PySpark-native web-scale near-duplicate
detection + clustering engine with the query/data-processing capabilities of
jfjlaros/HUMID (reference at /root/reference, read-only).

NOT a port: the reference is a single-threaded C++ trie pipeline
(scan -> fixed-length key -> exact-dup count -> Hamming/edit self-join ->
greedy clustering -> filtered/annotated sinks + histograms, see
reference src/humid.cc:369-409).  Here every stage is re-expressed as
idiomatic Spark DataFrame operators:

- trie insert/count        -> groupBy(key).agg(...)          (operators/exact.py)
- trie asymmetricHamming   -> pigeonhole chunk-blocked join  (operators/blocking.py)
- web-scale generalization -> MinHash/SimHash + LSH banding  (functions/signatures.py,
                                                              operators/lsh.py)
- greedy flood clustering  -> distributed connected components
                              + exact per-component replay   (operators/cc.py,
                                                              operators/directional.py)
- sinks & histograms       -> DataFrame writes               (operators/stats.py,
                                                              plans/pipeline.py)
"""

from humid_spark.config import DedupConfig
from humid_spark.session import get_spark


def __getattr__(name):  # lazy: pipelines pull pyspark.sql at import time
    if name == "run_web_pipeline":
        from humid_spark.plans.webdedup import run_web_pipeline

        return run_web_pipeline
    if name == "run_pipeline":
        from humid_spark.plans.pipeline import run_pipeline

        return run_pipeline
    if name == "run_curation_pipeline":
        from humid_spark.plans.curate import run_curation_pipeline

        return run_curation_pipeline
    if name == "DedupIndex":
        from humid_spark.plans.incremental import DedupIndex

        return DedupIndex
    if name in ("decontaminate", "contamination_stats"):
        from humid_spark.operators import decontam

        return getattr(decontam, name)
    raise AttributeError(name)


__all__ = [
    "DedupConfig", "get_spark", "run_pipeline", "run_web_pipeline",
    "run_curation_pipeline", "DedupIndex", "decontaminate",
    "contamination_stats",
]
__version__ = "0.1.0"
