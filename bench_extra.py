#!/usr/bin/env python
"""Supplementary benchmarks (round 7) — NOT the driver headline.

bench.py is frozen for measurement, so the fixes VERDICT r6 asked for in
its image-phash headline live here instead:

- `image_phash_isolated`: the blob fixture (same deterministic pixels as
  bench.q_image_phash) is written to parquet ONCE, OUTSIDE the timer;
  the timed region is decode -> aHash -> band-join only, with the stage
  split (hash pass vs pair join) reported separately via noop sinks
  (guide §1.4).

Prints one JSON line; results are cited in OPTIMIZATION_r07.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from humid_spark.session import get_spark

    spark = get_spark("humid_spark-bench-extra", cores=cpus,
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()

    import numpy as np
    import pandas as pd

    from humid_spark.functions.multimodal import (
        encode_ppm, image_ahashes, image_near_dups,
    )

    # ---- fixture generation, OUTSIDE the timer -------------------------
    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    shifted = ids.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.lit(8).alias("shift")
    )
    plan = ids.select("doc_id", F.lit(0).alias("shift")).unionByName(shifted)

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, shift in zip(pdf["doc_id"], pdf["shift"]):
                y, x = np.mgrid[0:64, 0:64]
                base = (
                    int(did) * 31 + y * 7 + x * 3
                )[:, :, None] + np.arange(3) * 11
                px = ((base % 200) + int(shift)).clip(0, 255).astype(np.uint8)
                rows.append((f"{did}+{shift}", encode_ppm(px)))
            yield pd.DataFrame(rows, columns=["url", "blob"])

    tmp = tempfile.mkdtemp(prefix="bench_extra_blobs_")
    try:
        plan.repartition(cpus).mapInPandas(
            gen, "url string, blob binary"
        ).write.mode("overwrite").parquet(tmp)
        blobs = spark.read.parquet(tmp)

        times: dict[str, float] = {}
        spark.sparkContext.setJobDescription("image_phash: decode+aHash")
        t0 = time.perf_counter()
        _force(image_ahashes(blobs, blob_col="blob").filter(
            F.col("ahash").isNotNull()
        ))
        times["decode_ahash"] = round(time.perf_counter() - t0, 3)

        spark.sparkContext.setJobDescription("image_phash: full near-dup")
        t0 = time.perf_counter()
        _force(image_near_dups(blobs, blob_col="blob"))
        times["decode_ahash_bandjoin"] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)

        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        print(json.dumps({
            "metric": "image_phash_isolated",
            "value": times["decode_ahash_bandjoin"],
            "unit": "sec",
            "stages": times,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cpus": cpus,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
