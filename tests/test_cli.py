"""CLI surface (python -m humid_spark): the reference's command-line
interface (src/humid.cc:413-429) over parquet pages tables.  Runs in a
subprocess from OUTSIDE the repo root — the deployment-shaped launch (the
package must ship itself to workers via addPyFile)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_parity_mode_outputs(spark, tmp_path):
    from humid_spark.sources.pages import fx_webtext, to_spark

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    log = str(tmp_path / "run.log")
    to_spark(spark, fx_webtext(n_seeds=20)).write.parquet(src)

    env = dict(os.environ, PYTHONPATH=ROOT)
    res = subprocess.run(
        [sys.executable, "-m", "humid_spark", "-n", "12", "-s", "-a",
         "-l", log, "--cores", "4", "-d", out, src],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    # reference output surface: -q dedup (default on), -a annotated,
    # -s histograms + scalars
    for sub in ("pages_dedup", "pages_annotated", "counts", "neigh",
                "clusters", "stats"):
        assert os.path.isdir(os.path.join(out, sub)), sub
    # -l log file got the run summary
    with open(log) as f:
        summary = json.loads(f.read().strip().splitlines()[-1])
    assert summary["mode"] == "parity"
    assert summary["outputs"] == {"dedup": True, "annotated": True,
                                  "stats": True}
    # the written dedup table is readable and non-empty
    assert len(spark.read.parquet(os.path.join(out, "pages_dedup"))
               .take(1)) == 1


def test_cli_web_mode_observed_counts(spark, tmp_path):
    """Web mode reports output row counts measured by observe() metrics
    riding the write actions (VERDICT r3 item 5: no second scan) — the
    reported counts must equal the written tables' true counts."""
    from humid_spark.sources.pages import fx_webtext, to_spark

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    log = str(tmp_path / "run.log")
    to_spark(spark, fx_webtext(n_seeds=15)).write.parquet(src)

    env = dict(os.environ, PYTHONPATH=ROOT)
    res = subprocess.run(
        [sys.executable, "-m", "humid_spark", "--mode", "web", "-a",
         "-l", log, "--cores", "4", "-d", out, src],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with open(log) as f:
        summary = json.loads(f.read().strip().splitlines()[-1])
    assert summary["mode"] == "web"
    for name, sub in (("dedup", "pages_dedup"),
                      ("annotated", "pages_annotated")):
        reported = summary["outputs"][name]
        actual = spark.read.parquet(os.path.join(out, sub)).count()
        assert reported == actual, (name, reported, actual)


def test_cli_parity_checkpoint_dir_honored(spark, tmp_path):
    """--checkpoint-dir is no longer a no-op in parity mode (VERDICT r3
    item 1/2): the three parity stages checkpoint under it."""
    from humid_spark.sources.pages import fx_webtext, to_spark

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    to_spark(spark, fx_webtext(n_seeds=12)).write.parquet(src)

    env = dict(os.environ, PYTHONPATH=ROOT)
    res = subprocess.run(
        [sys.executable, "-m", "humid_spark", "-n", "12",
         "--checkpoint-dir", ckpt, "--cores", "4", "-d", out, src],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    for stage in ("parity_uniq", "parity_pairs", "parity_clusters"):
        d = os.path.join(ckpt, stage)
        assert os.path.isdir(d) and os.listdir(d), f"no checkpoint for {stage}"
    assert os.path.exists(os.path.join(ckpt, "_lineage.jsonl"))


def test_cli_web_containment_flag(spark, tmp_path):
    """--containment turns on the winnowing pass and surfaces demotion
    lineage in the -s summary."""
    from humid_spark.sources.pages import fx_webtext, to_spark

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    log = str(tmp_path / "run.log")
    to_spark(spark, fx_webtext(n_seeds=10)).write.parquet(src)

    env = dict(os.environ, PYTHONPATH=ROOT)
    res = subprocess.run(
        [sys.executable, "-m", "humid_spark", "--mode", "web",
         "--containment", "-s", "-l", log, "--cores", "4", "-d", out, src],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with open(log) as f:
        summary = json.loads(f.read().strip().splitlines()[-1])
    assert "demoted_buckets" in summary["outputs"]
    assert "demoted_fingerprints" in summary["outputs"]


def test_cli_incremental_mode_build_apply_replay(spark, tmp_path):
    """--mode incremental: first run bootstraps the index from the input,
    second run (new input) classifies + appends, third run (same input)
    is an idempotent replay no-op."""
    from humid_spark.sources.pages import fx_webtext, to_spark

    rows = fx_webtext(n_seeds=25)
    corpus_src = str(tmp_path / "corpus")
    batch_src = str(tmp_path / "batch")
    to_spark(spark, rows[0::2]).write.parquet(corpus_src)
    to_spark(spark, rows[1::2]).write.parquet(batch_src)
    idx_dir, out = str(tmp_path / "idx"), str(tmp_path / "out")
    log = str(tmp_path / "run.log")

    env = dict(os.environ, PYTHONPATH=ROOT)

    def run(src, *extra):
        res = subprocess.run(
            [sys.executable, "-m", "humid_spark", "--mode", "incremental",
             "--index-dir", idx_dir, "-s", "-l", log, "--cores", "4",
             "-d", out, src, *extra],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        with open(log) as f:
            return json.loads(f.read().strip().splitlines()[-1])

    s1 = run(corpus_src)
    assert s1["outputs"]["built"] is True
    assert s1["outputs"]["index_rows"] > 0

    s2 = run(batch_src)
    o = s2["outputs"]
    assert o["survivors"] > 0 and o["near_pairs"] > 0
    written = spark.read.parquet(os.path.join(out, "survivors"))
    assert written.count() == o["survivors"]
    # appended: the index manifest records the batch
    with open(os.path.join(idx_dir, "_index.json")) as f:
        man = json.load(f)
    assert o["batch_id"] in man["batches"]

    s3 = run(batch_src)  # same input again -> replay no-op
    assert s3["outputs"] == {"already_ingested": True,
                             "batch_id": o["batch_id"]}

    s4 = run(corpus_src)  # the BOOTSTRAP input replays as a no-op too:
    assert s4["outputs"] == {  # build records its input snapshot, not a
        "already_ingested": True,  # fixed 'initial' id
        "batch_id": s1["outputs"]["batch_id"],
    }

    # --compact-after: maintenance runs even on a replay invocation —
    # two live snapshots fold into one, the ingest ledger survives, the
    # orphans are vacuumed, and later replays stay no-ops
    s5 = run(batch_src, "--compact-after", "2")
    assert s5["outputs"]["compacted"] is True
    assert s5["outputs"]["vacuumed_dirs"] == 4
    with open(os.path.join(idx_dir, "_index.json")) as f:
        man = json.load(f)
    assert man["batches"] == ["compact-1"]
    assert set(man["ingested"]) == {s1["outputs"]["batch_id"],
                                    o["batch_id"]}
    assert os.listdir(os.path.join(idx_dir, "uniq")) == ["batch-compact-1"]
    s6 = run(batch_src)
    assert s6["outputs"] == {"already_ingested": True,
                             "batch_id": o["batch_id"]}


def test_cli_incremental_clusters(spark, tmp_path):
    """--clusters: the bootstrap run builds the cluster map, later runs
    maintain it (assignments written to <out>/clusters, remap version
    committed with the batch), and --compact-after folds the remaps."""
    from humid_spark.sources.pages import fx_webtext, to_spark

    rows = fx_webtext(n_seeds=25)
    corpus_src = str(tmp_path / "corpus")
    batch_src = str(tmp_path / "batch")
    to_spark(spark, rows[0::2]).write.parquet(corpus_src)
    to_spark(spark, rows[1::2]).write.parquet(batch_src)
    idx_dir, out = str(tmp_path / "idx"), str(tmp_path / "out")
    log = str(tmp_path / "run.log")
    env = dict(os.environ, PYTHONPATH=ROOT)

    def run(src, *extra):
        res = subprocess.run(
            [sys.executable, "-m", "humid_spark", "--mode", "incremental",
             "--index-dir", idx_dir, "-l", log, "--cores", "4",
             "-d", out, src, *extra],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        with open(log) as f:
            return json.loads(f.read().strip().splitlines()[-1])

    s1 = run(corpus_src, "--clusters")
    assert s1["outputs"]["built"] is True
    assert 0 < s1["outputs"]["clusters"] <= s1["outputs"]["index_rows"]

    # the flag is build-time only: the follow-up run maintains the map
    # because the MANIFEST says so
    s2 = run(batch_src)
    o = s2["outputs"]
    assert o["clustered"] > 0
    written = spark.read.parquet(os.path.join(out, "clusters"))
    assert written.count() == o["clustered"]
    assert set(written.columns) == {"doc_id", "cluster"}
    with open(os.path.join(idx_dir, "_index.json")) as f:
        man = json.load(f)
    assert man["clusters"] is True
    # remap versions exist iff the batch induced merges (root relabels)
    merged = man["remap_rows"] > 0
    assert man["remap_v"] == (1 if merged else 0)

    s3 = run(batch_src, "--compact-after", "2")  # replay + maintenance
    assert s3["outputs"]["compacted"] is True
    # uniq/bands/clusters each fold 2 snapshots (+ the orphaned remap
    # version when the batch merged)
    assert s3["outputs"]["vacuumed_dirs"] == 6 + (1 if merged else 0)
    with open(os.path.join(idx_dir, "_index.json")) as f:
        man2 = json.load(f)
    assert man2["batches"] == ["compact-1"]
    assert man2["remap_rows"] == 0  # folded
    assert man2["remap_v"] == man["remap_v"] + (1 if merged else 0)

    # compaction is idempotent: nothing live changed, so a further
    # maintenance run must NO-OP (the remap_rows fact, not the version
    # counter, drives the check)
    s4 = run(batch_src, "--compact-after", "1")
    assert "compacted" not in s4["outputs"]


def test_cli_incremental_delete(spark, tmp_path):
    """--delete: the input is a takedown list; the tombstoned content
    re-enters as fresh on the next snapshot, and --compact-after folds
    the tombstones physically."""
    from datetime import datetime

    from humid_spark.sources.pages import to_spark

    # explicit corpus: the victim's content must have NO duplicate family
    # (fx_webtext plants exact/near twins, which would absorb the
    # re-entry), so hand-build distinct texts
    ts = datetime(2024, 1, 1)
    victim_text = (
        "a wholly unique takedown target document about regulated content "
        "that must disappear from the index and stay suppressed at read"
    )
    rows = [
        {"url": "http://t/victim", "warc_ts": ts, "html": None,
         "text": victim_text, "lang": "en"},
        {"url": "http://t/keep", "warc_ts": ts, "html": None,
         "text": ("another entirely unrelated page on columnar storage "
                  "engines and vectorized execution with adaptive plans"),
         "lang": "en"},
    ]
    corpus_src = str(tmp_path / "corpus")
    to_spark(spark, rows).write.parquet(corpus_src)
    takedown_src = str(tmp_path / "takedown")
    spark.createDataFrame([("http://t/victim",)], "url string").write.parquet(
        takedown_src
    )
    idx_dir, out = str(tmp_path / "idx"), str(tmp_path / "out")
    log = str(tmp_path / "run.log")
    env = dict(os.environ, PYTHONPATH=ROOT)

    def run(src, *extra):
        res = subprocess.run(
            [sys.executable, "-m", "humid_spark", "--mode", "incremental",
             "--index-dir", idx_dir, "-l", log, "--cores", "4",
             "-d", out, src, *extra],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        with open(log) as f:
            return json.loads(f.read().strip().splitlines()[-1])

    run(corpus_src)  # bootstrap
    s = run(takedown_src, "--delete")
    assert s["outputs"] == {"deleted": 1, "tombstones": 1}
    # replaying the takedown records nothing new (idempotent)
    s2 = run(takedown_src, "--delete")
    assert s2["outputs"] == {"deleted": 0, "tombstones": 1}
    # the victim's content re-enters as a survivor on the next snapshot
    reentry_src = str(tmp_path / "reentry")
    to_spark(
        spark, [dict(rows[0], url="http://reentry/x")]
    ).write.parquet(reentry_src)  # same text, new url
    s3 = run(reentry_src)
    assert s3["outputs"]["survivors"] == 1
    # maintenance folds the tombstones physically
    s4 = run(takedown_src, "--delete", "--compact-after", "1")
    assert s4["outputs"]["compacted"] is True
    with open(os.path.join(idx_dir, "_index.json")) as f:
        man = json.load(f)
    assert man["delete_rows"] == 0


def test_cli_curate_mode(spark, tmp_path):
    """--mode curate writes curated pages + the tier funnel; with -s the
    funnel rides the summary and its identities hold."""
    from humid_spark.sources.pages import fx_webtext, to_spark

    src, out = str(tmp_path / "pages"), str(tmp_path / "out")
    log = str(tmp_path / "run.log")
    to_spark(spark, fx_webtext(n_seeds=20)).write.parquet(src)
    env = dict(os.environ, PYTHONPATH=ROOT)
    res = subprocess.run(
        [sys.executable, "-m", "humid_spark", "--mode", "curate", "-s",
         "--noisy-rate", "700",  # downsampling is opt-in (default 1000)
         "-l", log, "--cores", "4", "-d", out, src],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with open(log) as f:
        summary = json.loads(f.read().strip().splitlines()[-1])
    funnel = summary["outputs"]["funnel"]
    kept = spark.read.parquet(os.path.join(out, "pages_curated")).count()
    assert funnel["kept"] == kept > 0
    assert funnel["n_input"] >= funnel["kept"]
    assert funnel["contaminated_removed"] == 0  # no --bench given


def test_cli_curate_bench_decontamination(spark, tmp_path):
    """--bench drops pages overlapping the benchmark at the
    decontamination tier and the funnel records the removals."""
    from pyspark.sql import functions as F

    from humid_spark.sources.pages import fx_webtext, to_spark

    src, out = str(tmp_path / "pages"), str(tmp_path / "out")
    bench = str(tmp_path / "bench")
    log = str(tmp_path / "run.log")
    pages = to_spark(spark, fx_webtext(n_seeds=15))
    pages.write.parquet(src)
    # benchmark = a 20-token slice of one real page -> >=1 contaminated
    # (fixture urls are https://fx-webtext.example/<hint>/<i>, so match
    # the hint as a path segment; the trailing slash excludes seed3-dupN)
    bench_df = pages.filter(F.col("url").contains("/seed3/")).select(
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.col("text")), r"\s+"), 5, 20)
        ).alias("text")
    )
    assert bench_df.count() >= 1  # the plant must be non-empty
    bench_df.write.parquet(bench)
    env = dict(os.environ, PYTHONPATH=ROOT)
    res = subprocess.run(
        [sys.executable, "-m", "humid_spark", "--mode", "curate", "-s",
         "--bench", bench, "-l", log, "--cores", "4", "-d", out, src],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with open(log) as f:
        summary = json.loads(f.read().strip().splitlines()[-1])
    funnel = summary["outputs"]["funnel"]
    assert funnel["contaminated_removed"] >= 1
    # funnel identities across the tiers: the dedup tier conserves its
    # input (kept + removals == usable), and the pages entering dedup are
    # what survived the quality/sample/decontamination tiers
    assert funnel["total_usable"] == (
        funnel["kept"] + funnel["near_removed"] + funnel["exact_removed"]
    )
    assert (
        funnel["n_input"] - funnel["quality_removed"]
        - funnel["sample_removed"] - funnel["contaminated_removed"]
        >= funnel["total_usable"]
    )
    urls = {
        r["url"] for r in
        spark.read.parquet(os.path.join(out, "pages_curated")).collect()
    }
    assert not any("/seed3/" in u for u in urls), "donor page survived"
