"""Resumability + lineage: checkpointed stages skip recompute on rerun;
changed config never reuses stale checkpoints (north_rule)."""

from __future__ import annotations

import json
import os

from humid_spark.config import DedupConfig
from humid_spark.plans.webdedup import run_web_pipeline
from humid_spark.sources.io import CheckpointStore, snapshot_key
from humid_spark.sources.pages import fx_webtext, to_spark

STAGES = ("signatures", "pairs", "components")


def _manifest_paths(root: str, snap: str, cfg_hash: str) -> dict[str, str]:
    return {
        s: os.path.join(root, s, snapshot_key(snap, cfg_hash, s), "_manifest.json")
        for s in STAGES
    }


def test_checkpoint_resume_and_lineage(spark, tmp_path):
    cfg = DedupConfig()
    root = str(tmp_path / "ckpt")
    pages = to_spark(spark, fx_webtext(n_seeds=20))
    store = CheckpointStore(root, input_snapshot="snapA", config_hash=cfg.config_hash())

    r1 = run_web_pipeline(pages, cfg, store=store)
    first = sorted((row["url"], row["cluster_id"]) for row in r1.annotated.collect())

    mans = _manifest_paths(root, "snapA", cfg.config_hash())
    for stage, mp in mans.items():
        assert os.path.exists(mp), f"missing manifest for {stage}"
        man = json.load(open(mp))
        assert man["rows"] >= 0
        assert man["partitions"], "per-partition lineage must be recorded"
        assert man["config_hash"] == cfg.config_hash()
    lineage = [json.loads(line) for line in open(os.path.join(root, "_lineage.jsonl"))]
    assert {m["stage"] for m in lineage} == set(STAGES)

    # rerun: same snapshot+config -> all stages served from checkpoint
    mtimes = {s: os.path.getmtime(p) for s, p in mans.items()}
    store2 = CheckpointStore(root, input_snapshot="snapA", config_hash=cfg.config_hash())
    r2 = run_web_pipeline(pages, cfg, store=store2)
    second = sorted((row["url"], row["cluster_id"]) for row in r2.annotated.collect())
    assert second == first
    for s, p in mans.items():
        assert os.path.getmtime(p) == mtimes[s], f"{s} was recomputed"

    # changed config -> new snapshot keys, nothing reused
    cfg2 = DedupConfig(jaccard_threshold=0.9)
    assert cfg2.config_hash() != cfg.config_hash()
    mans2 = _manifest_paths(root, "snapA", cfg2.config_hash())
    assert all(not os.path.exists(p) for p in mans2.values())
    store3 = CheckpointStore(root, input_snapshot="snapA", config_hash=cfg2.config_hash())
    run_web_pipeline(pages, cfg2, store=store3).annotated.count()
    assert all(os.path.exists(p) for p in mans2.values())


def test_parity_checkpoint_resume(spark, tmp_path):
    """Parity-mode resumability (VERDICT r3 item 2): run_pipeline
    checkpoints uniq/pairs/clusters; a killed-and-resumed run skips the
    completed stages and produces an identical annotated table."""
    from humid_spark.plans.pipeline import run_pipeline

    cfg = DedupConfig(word_length=12)
    root = str(tmp_path / "parity_ckpt")
    pages = to_spark(spark, fx_webtext(n_seeds=20))
    pstages = ("parity_uniq", "parity_pairs", "parity_clusters")

    store = CheckpointStore(root, input_snapshot="snapP",
                            config_hash=cfg.config_hash())
    r1 = run_pipeline(pages, cfg, store=store)
    first = sorted((row["url"], row["cluster_id"])
                   for row in r1.annotated.collect())

    mans = {
        s: os.path.join(root, s,
                        snapshot_key("snapP", cfg.config_hash(), s),
                        "_manifest.json")
        for s in pstages
    }
    for s, mp in mans.items():
        assert os.path.exists(mp), f"missing parity manifest for {s}"

    # simulate a crash AFTER pairs but BEFORE clusters completed: drop the
    # clusters checkpoint, resume -> uniq/pairs are served from parquet
    # (mtimes untouched), only clusters recomputes; output identical.
    import shutil

    shutil.rmtree(os.path.dirname(mans["parity_clusters"]))
    mtimes = {s: os.path.getmtime(mans[s])
              for s in ("parity_uniq", "parity_pairs")}
    store2 = CheckpointStore(root, input_snapshot="snapP",
                             config_hash=cfg.config_hash())
    r2 = run_pipeline(pages, cfg, store=store2)
    second = sorted((row["url"], row["cluster_id"])
                    for row in r2.annotated.collect())
    assert second == first
    for s in ("parity_uniq", "parity_pairs"):
        assert os.path.getmtime(mans[s]) == mtimes[s], f"{s} was recomputed"
    assert os.path.exists(mans["parity_clusters"]), \
        "clusters not re-checkpointed"


def test_mode_stage_names_disjoint():
    """The two pipeline modes must never share a checkpoint stage name:
    the snapshot key is hash(input_snapshot, config_hash, stage) and the
    mode is not in DedupConfig, so a shared name would let one mode load
    the other's table (string keys vs long doc ids) from the same
    --checkpoint-dir."""
    import inspect

    from humid_spark.plans import pipeline, webdedup

    web_src = inspect.getsource(webdedup.run_web_pipeline)
    par_src = inspect.getsource(pipeline.run_pipeline)
    web = set(__import__("re").findall(r'staged\(\s*"(\w+)"', web_src))
    par = set(__import__("re").findall(r'staged\(\s*"(\w+)"', par_src))
    assert web and par
    assert not (web & par), f"shared stage names: {web & par}"
