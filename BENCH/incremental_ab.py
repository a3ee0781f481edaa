#!/usr/bin/env python
"""Incremental-vs-full A/B: the measured case for the DedupIndex design.

Question: a corpus C (1M pages, BENCH/data/pages_bench_1m) is already
deduplicated; a snapshot B (~100k pages sampled from pages_bench_3m by
xxhash64(url) % 30 == 7 — a mix of already-seen and new content, like a
re-crawl) arrives.  What does it cost to

  full      re-run the whole web pipeline over C UNION B (what the
            batch-only reference forces — src/humid.cc:443-452 re-reads
            everything per run), vs
  ingest    build the persistent DedupIndex from C ONCE (amortized over
            every future snapshot), plus
  classify  dedup_batch(B) against the index (the recurring per-snapshot
            cost).

Each measurement runs in its own subprocess (fresh JVM, local[8], kperm,
12g driver — the scaling-protocol config) in one host window, back to
back, so window decay cancels to first order.  Output:
BENCH/incremental_ab.json.  No host hygiene (see _host_hygiene's caveat:
cache drops collapse full-JVM runs on this VM).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

CORPUS = os.path.join(HERE, "data", "pages_bench_1m")
BATCH_SRC = os.path.join(HERE, "data", "pages_bench_3m")
IDX = os.path.join(HERE, "data", "incr_ab_idx")
IDX_C = os.path.join(HERE, "data", "incr_ab_idx_clusters")
IDX_DEL = os.path.join(HERE, "data", "incr_ab_idx_del")
BATCH_MOD = 30
BATCH_REM = 7


def _batch(spark):
    from pyspark.sql import functions as F

    # a third of the snapshot carries CONTENT DRIFT (a short appended
    # tail): re-crawled pages whose boilerplate shifted — they miss the
    # exact tier but near-match their corpus originals, so the verify
    # stage does real work (without this, the sampled rows are either
    # byte-identical to the corpus or entirely new, and near_pairs == 0)
    return (
        spark.read.parquet(BATCH_SRC)
        .filter(F.pmod(F.xxhash64("url"), F.lit(BATCH_MOD)) == BATCH_REM)
        .withColumn(
            "text",
            # independent hash (salted with a literal): the sampling
            # filter fixes xxhash64(url) % 30 == 7, and 30 is a multiple
            # of 3, so reusing the same hash mod 3 would never fire
            F.when(
                F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(3)) == 0,
                F.concat(F.col("text"), F.lit(" updated edition")),
            ).otherwise(F.col("text")),
        )
    )


def run_child(mode: str) -> None:
    from pyspark.sql import functions as F

    from humid_spark.config import DedupConfig
    from humid_spark.session import get_spark

    cfg = DedupConfig(minhash_scheme="kperm")
    spark = get_spark(f"incr-ab-{mode}", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    rows = None
    t0 = time.perf_counter()
    if mode == "full":
        from humid_spark.plans.webdedup import run_web_pipeline

        pages = spark.read.parquet(CORPUS).unionByName(_batch(spark))
        res = run_web_pipeline(pages, cfg)
        res.annotated.write.format("noop").mode("overwrite").save()
        res.release()
    elif mode == "ingest":
        import shutil

        from humid_spark.plans.incremental import DedupIndex

        shutil.rmtree(IDX, ignore_errors=True)
        DedupIndex.build(spark.read.parquet(CORPUS), cfg, IDX)
    elif mode == "classify":
        from humid_spark.plans.incremental import DedupIndex

        idx = DedupIndex.load(IDX, cfg)
        res = idx.dedup_batch(_batch(spark))
        res.survivors.write.format("noop").mode("overwrite").save()
        res.near_pairs.write.format("noop").mode("overwrite").save()
        # STOP THE CLOCK here: the diagnostic counts below re-execute the
        # batch scan and the survivors chain — real work, but not the
        # per-snapshot cost this mode measures (the 'full' mode times
        # exactly one forced action)
        elapsed = round(time.perf_counter() - t0, 2)
        rows = {
            "batch": _batch(spark).count(),
            "survivors": res.survivors.count(),
            "near_pairs": res.near_pairs.count(),
        }
        res.release()
    elif mode == "ingest_clusters":
        import shutil

        from humid_spark.plans.incremental import DedupIndex

        shutil.rmtree(IDX_C, ignore_errors=True)
        DedupIndex.build(
            spark.read.parquet(CORPUS), cfg, IDX_C, with_clusters=True
        )
    elif mode == "cluster_update":
        from humid_spark.plans.incremental import DedupIndex

        idx = DedupIndex.load(IDX_C, cfg)
        res = idx.dedup_batch(_batch(spark))
        res.survivors.write.format("noop").mode("overwrite").save()
        res.near_pairs.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        delta = idx.cluster_batch(res)
        delta.assignments.write.format("noop").mode("overwrite").save()
        delta.remap.write.format("noop").mode("overwrite").save()
        # the cluster phase alone is this mode's number; the classify
        # phase before t1 is the warm-up it rides on (recorded for the
        # in-window comparison)
        elapsed = round(time.perf_counter() - t1, 2)
        rows = {
            "classify_sec": round(t1 - t0, 2),
            "assignments": delta.assignments.count(),
            "remap_rows": delta.remap.count(),
        }
        delta.release()
        res.release()
    elif mode == "classify_del":
        # read path of the delete-A/B index copy in its CURRENT state
        # (clean / live tombstones / compacted — the parent sequences it)
        from humid_spark.plans.incremental import DedupIndex

        idx = DedupIndex.load(IDX_DEL, cfg)
        res = idx.dedup_batch(_batch(spark))
        res.survivors.write.format("noop").mode("overwrite").save()
        res.near_pairs.write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - t0, 2)
        rows = {
            "tombstone_rows": idx.manifest.get("delete_rows", 0),
            "survivors": res.survivors.count(),
        }
        res.release()
    elif mode == "delete_tombstone":
        # takedown cost: resolve a 1% url slice against the corpus-sized
        # index (column-pruned scans probed by broadcast keys) and commit
        # the versioned tombstone table
        from humid_spark.plans.incremental import DedupIndex

        idx = DedupIndex.load(IDX_DEL, cfg)
        dels = (
            spark.read.parquet(CORPUS)
            .filter(F.pmod(F.xxhash64("url"), F.lit(100)) == 3)
            .select("url")
        )
        n = idx.delete(dels)
        elapsed = round(time.perf_counter() - t0, 2)
        rows = {"deleted": n,
                "tombstone_rows": idx.manifest.get("delete_rows", 0)}
    elif mode == "compact_fold":
        # maintenance cost: physically fold batch snapshots + tombstones
        # + remap into one snapshot (the cadence the sizing rule bounds)
        from humid_spark.plans.incremental import DedupIndex

        idx = DedupIndex.load(IDX_DEL, cfg)
        folded = idx.compact(spark)
        elapsed = round(time.perf_counter() - t0, 2)
        rows = {"folded": folded,
                "tombstone_rows": idx.manifest.get("delete_rows", 0)}
    if mode not in ("classify", "cluster_update", "classify_del",
                    "delete_tombstone", "compact_fold"):
        elapsed = round(time.perf_counter() - t0, 2)
    out = {"mode": mode, "elapsed_sec": elapsed}
    if rows:
        out.update(rows)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None)
    ap.add_argument(
        "--cluster-ab", action="store_true",
        help="measure the cluster-maintenance tier instead of the main "
             "triple: ingest_clusters (bootstrap cost) + cluster_update "
             "(per-snapshot marginal cost, with an in-window classify "
             "phase as the comparator); merged into incremental_ab.json "
             "under 'cluster_ab' with its own window telemetry",
    )
    ap.add_argument(
        "--delete-ab", action="store_true",
        help="measure takedown + compaction on a copy of the 1M cluster "
             "index: classify clean -> delete 1%% -> classify tombstoned "
             "-> compact -> classify folded; merged into "
             "incremental_ab.json under 'delete_ab'",
    )
    args = ap.parse_args()
    if args.child:
        run_child(args.child)
        return
    if args.cluster_ab:
        _cluster_ab()
        return
    if args.delete_ab:
        _delete_ab()
        return

    results = {m: _run_mode(m) for m in ("ingest", "classify", "full")}

    try:
        with open("/proc/uptime") as f:
            uptime_h = round(float(f.read().split()[0]) / 3600, 2)
    except OSError:
        uptime_h = None
    full, cls = results["full"], results["classify"]
    summary = {
        "protocol": "local[8] kperm 12g, fresh JVM per mode, one window, "
                    "no hygiene",
        "corpus_rows": 1_000_000,
        "results": results,
        "speedup_classify_vs_full": (
            round(full["elapsed_sec"] / cls["elapsed_sec"], 2)
            if "elapsed_sec" in full and "elapsed_sec" in cls else None
        ),
        "uptime_h": uptime_h,
    }
    with open(os.path.join(HERE, "incremental_ab.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


def _run_mode(mode: str) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM="12g")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", mode],
        env=env, capture_output=True, text=True, timeout=7200,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")]
    out = (
        json.loads(line[-1]) if line
        else {"error": r.stdout[-500:] + r.stderr[-500:]}
    )
    print(mode, "->", out, flush=True)
    return out


def _delete_ab() -> None:
    """Takedown + compaction A/B at the 1M index (VERDICT r5 item 2):
    classify clean -> delete 1% (tombstone write) -> classify with LIVE
    tombstones (merge-on-read overhead) -> compact (physical fold) ->
    classify folded.  Runs on a throwaway COPY of the cluster index so
    the committed ingest/classify A/B state stays pristine; fresh JVM
    per step, one host window, own uptime telemetry."""
    import shutil

    shutil.rmtree(IDX_DEL, ignore_errors=True)
    shutil.copytree(IDX_C, IDX_DEL)
    seq = [
        ("classify_clean", "classify_del"),
        ("delete_tombstone", "delete_tombstone"),
        ("classify_tombstoned", "classify_del"),
        ("compact_fold", "compact_fold"),
        ("classify_compacted", "classify_del"),
    ]
    results = {label: _run_mode(mode) for label, mode in seq}
    try:
        with open("/proc/uptime") as f:
            uptime_h = round(float(f.read().split()[0]) / 3600, 2)
    except OSError:
        uptime_h = None
    clean = results["classify_clean"].get("elapsed_sec")
    tomb = results["classify_tombstoned"].get("elapsed_sec")
    block = {
        "protocol": "local[8] kperm 12g, fresh JVM per step, one window, "
                    "sequential on a copy of the 1M cluster index",
        "results": results,
        "tombstone_read_overhead": (
            round(tomb / clean, 3) if clean and tomb else None
        ),
        "uptime_h": uptime_h,
    }
    path = os.path.join(HERE, "incremental_ab.json")
    with open(path) as f:
        summary = json.load(f)
    summary["delete_ab"] = block
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    shutil.rmtree(IDX_DEL, ignore_errors=True)
    print(json.dumps(block))


def _cluster_ab() -> None:
    """Cluster-tier A/B, merged into the existing JSON: the main triple's
    committed numbers (their own window) stay; this block carries its own
    uptime so cross-block ratios are never read as same-window."""
    results = {m: _run_mode(m) for m in ("ingest_clusters", "cluster_update")}
    try:
        with open("/proc/uptime") as f:
            uptime_h = round(float(f.read().split()[0]) / 3600, 2)
    except OSError:
        uptime_h = None
    cu = results["cluster_update"]
    block = {
        "protocol": "local[8] kperm 12g, fresh JVM per mode, one window",
        "results": results,
        "cluster_overhead_vs_classify": (
            round(cu["elapsed_sec"] / cu["classify_sec"], 2)
            if "elapsed_sec" in cu and cu.get("classify_sec") else None
        ),
        "uptime_h": uptime_h,
    }
    path = os.path.join(HERE, "incremental_ab.json")
    with open(path) as f:
        summary = json.load(f)
    summary["cluster_ab"] = block
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(block))


if __name__ == "__main__":
    main()
