"""Session config resolution (ADVICE r3): local mode pins shuffle
partitions to max(cores, 8); cluster mode (cores=0, spark-submit) must
inherit the cluster default instead of pinning a tiny local value."""

from __future__ import annotations

from humid_spark.session import _resolve_shuffle_partitions


def test_local_mode_pins_to_cores():
    assert _resolve_shuffle_partitions(32, None) == 32
    assert _resolve_shuffle_partitions(2, None) == 8
    assert _resolve_shuffle_partitions(32, 64) == 64


def test_cluster_mode_inherits_default(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE", raising=False)
    assert _resolve_shuffle_partitions(0, None) is None  # leave unset
    assert _resolve_shuffle_partitions(0, 400) == 400    # explicit wins
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "2000")
    assert _resolve_shuffle_partitions(0, None) == 2000
