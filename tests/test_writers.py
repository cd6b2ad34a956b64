"""Table-IO abstraction: Iceberg routing (stubbed catalog) + parquet
fallback.

The sandbox has no iceberg-spark-runtime jar, so the ``writeTo`` branch
is exercised against a recorded stub of DataFrameWriterV2 — proving the
env knob routes, partitions, and picks the right commit verb — while
the parquet fallback is tested for real. The resumable sink writer
(plans/checkpoint.py) is driven end-to-end through the same stub to pin
the ACK-commit story on the Iceberg path (SURVEY.md §2.9).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import DataFrame

from slog_agent_spark.sinks import writers


class _RecordingWriterV2:
    def __init__(self, table: str, calls: list):
        self.table = table
        self.partitions: list[str] = []
        self._calls = calls

    def partitionedBy(self, *cols):
        self.partitions = [str(c) for c in cols]
        return self

    def createOrReplace(self):
        self._calls.append((self.table, self.partitions, "createOrReplace"))

    def overwritePartitions(self):
        self._calls.append((self.table, self.partitions, "overwritePartitions"))

    def append(self):
        self._calls.append((self.table, self.partitions, "append"))


@pytest.fixture
def iceberg_stub(monkeypatch):
    """SLOG_ICEBERG_CATALOG set + DataFrame.writeTo recorded.

    Spark 4 instances are pyspark.sql.classic.dataframe.DataFrame (the
    unified pyspark.sql.DataFrame is just the API facade), so the patch
    must land on the concrete class.
    """
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame

    calls: list = []
    monkeypatch.setenv("SLOG_ICEBERG_CATALOG", "ice")
    for cls in (DataFrame, ClassicDataFrame):
        monkeypatch.setattr(
            cls, "writeTo",
            lambda self, table: _RecordingWriterV2(table, calls),
        )
    return calls


def _df(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b")], ["id", "tag"]
    )


def test_parquet_fallback_roundtrip(spark, monkeypatch):
    monkeypatch.delenv("SLOG_ICEBERG_CATALOG", raising=False)
    with tempfile.TemporaryDirectory() as root:
        loc = os.path.join(root, "t")
        writers.write_table(_df(spark), loc, partition_by=["tag"])
        back = writers.read_table(spark, loc)
        assert back.count() == 2
        assert os.path.isdir(os.path.join(loc, "tag=a"))


def test_parquet_overwrite_partitions_touches_only_present(spark, monkeypatch):
    monkeypatch.delenv("SLOG_ICEBERG_CATALOG", raising=False)
    with tempfile.TemporaryDirectory() as root:
        loc = os.path.join(root, "t")
        writers.write_table(_df(spark), loc, partition_by=["tag"])
        only_a = spark.createDataFrame([(9, "a")], ["id", "tag"])
        writers.write_table(
            only_a, loc, partition_by=["tag"], mode="overwrite_partitions"
        )
        back = writers.read_table(spark, loc)
        assert back.where("tag = 'b'").count() == 1  # untouched
        assert [r["id"] for r in back.where("tag = 'a'").collect()] == [9]


def test_iceberg_routing_modes(spark, iceberg_stub):
    df = _df(spark)
    writers.write_table(df, "db.sink", partition_by=["tag"])
    writers.write_table(df, "db.sink", mode="append")
    writers.write_table(
        df, "db.sink", partition_by=["tag"], mode="overwrite_partitions"
    )
    tables = [c[0] for c in iceberg_stub]
    verbs = [c[2] for c in iceberg_stub]
    assert tables == ["ice.db.sink"] * 3
    assert verbs == ["createOrReplace", "append", "overwritePartitions"]
    assert iceberg_stub[0][1] == ["Column<'tag'>"]
    assert iceberg_stub[1][1] == []  # no partitioning requested


def test_iceberg_read_routing(spark, iceberg_stub, monkeypatch):
    from pyspark.sql.readwriter import DataFrameReader

    seen = {}

    def fake_table(self, name):
        seen["name"] = name
        return _df(spark)

    monkeypatch.setattr(DataFrameReader, "table", fake_table)
    out = writers.read_table(spark, "db.sink")
    assert seen["name"] == "ice.db.sink"
    assert out.count() == 2


def test_resumable_sink_commits_through_iceberg_path(spark, sf_dir, iceberg_stub):
    """End-to-end: a checkpointer rooted at a TABLE IDENTIFIER routes
    its single partitioned write through overwritePartitions, and
    manifests (the ACK) commit only after the write returns."""
    from slog_agent_spark.plans import pipeline as P
    from slog_agent_spark.plans.checkpoint import (
        SinkCheckpointer,
        write_sinks_resumable,
    )

    tf = P.transformed_df(spark, sf_dir)
    with tempfile.TemporaryDirectory() as root:
        ckpt = SinkCheckpointer(
            "db.sink", "cfg", "fp",
            manifest_dir=os.path.join(root, "m"),
        )
        written = write_sinks_resumable(tf, ckpt)
        assert written  # every tag pending on first run
        assert [c[2] for c in iceberg_stub] == ["overwritePartitions"]
        assert iceberg_stub[0][0] == "ice.db.sink"
        assert iceberg_stub[0][1] == ["Column<'tag'>"]
        # the ACKs landed: a rerun has nothing pending (no second write)
        assert write_sinks_resumable(tf, ckpt) == {}
        assert len(iceberg_stub) == 1


def test_path_location_never_hits_the_catalog(spark, iceberg_stub):
    """With the env knob set, a filesystem PATH location still takes
    the parquet route — interpolating a path into writeTo would build
    an invalid multi-part identifier and kill the job (round-3 review
    finding)."""
    with tempfile.TemporaryDirectory() as root:
        loc = os.path.join(root, "t")
        writers.write_table(
            _df(spark), loc, partition_by=["tag"], mode="overwrite_partitions"
        )
        assert iceberg_stub == []  # stubbed writeTo never invoked
        assert writers.read_table(spark, loc).count() == 2  # parquet route
