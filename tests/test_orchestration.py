"""Orchestration selection: singleton sink + per-file record caps.

reference: orchestrate/osingleton/orchestrator.go:28-48 (one pipeline,
static tag, no redistribution); output/fluentdforward/config.go:26-35
(chunk size/record caps before flush).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import tempfile

from slog_agent_spark.plans import pipeline as P
from slog_agent_spark.plans.config import DEFAULT_CONFIG
from slog_agent_spark.sources.transcripts import transcripts_df


def _singleton_cfg():
    return dataclasses.replace(
        DEFAULT_CONFIG,
        orchestration_type="singleton",
        orchestration_keys=[],
        orchestration_tag="development.all",
    )


def test_singleton_single_sink_static_tag(spark, sf_dir):
    cfg = _singleton_cfg()
    tf = P.transform_transcripts(transcripts_df(spark, sf_dir), cfg)
    assert tf.select("tag").distinct().collect()[0]["tag"] == "development.all"
    with tempfile.TemporaryDirectory() as root:
        sink = os.path.join(root, "sink")
        P.run_sinks(tf, sink, cfg)
        # no per-tag partition dirs: one sink (+ the dropped quarantine tier)
        assert not glob.glob(os.path.join(sink, "tag=*"))
        assert not glob.glob(os.path.join(sink, "dropped=*", "tag=*"))
        got = P.spark_read_sink(tf, sink)
        assert got.where("NOT dropped").count() == tf.where("NOT dropped").count()
        assert got.where("dropped").count() == tf.where("dropped").count()


def test_custom_config_threads_into_fanout_metrics(spark, sf_dir):
    """run_sinks(cfg=...) must compute metrics and partition keys from
    THAT config, not DEFAULT_CONFIG (round-2 ADVICE: run_fanout computed
    process_metrics with no cfg — custom keysets silently grouped by the
    flagship keys)."""
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        orchestration_keys=["level"],
        metric_keys=["app"],
        orchestration_tag="development.$level",
    )
    tf = P.transform_transcripts(transcripts_df(spark, sf_dir), cfg)
    with tempfile.TemporaryDirectory() as root:
        sink = os.path.join(root, "sink")
        metrics = P.run_sinks(tf, sink, cfg)
        # grouping columns come from the custom config, in order
        assert metrics.columns[:2] == ["level", "app"]
        from slog_agent_spark.operators.metrics import process_metrics
        src = {tuple(r) for r in process_metrics(tf, cfg).collect()}
        assert {tuple(r) for r in metrics.collect()} == src


def test_max_records_per_file_cap(spark, sf_dir):
    tf = P.transformed_df(spark, sf_dir)
    with tempfile.TemporaryDirectory() as root:
        sink = os.path.join(root, "sink")
        P.run_sinks(tf, sink, max_records_per_file=50)
        files = glob.glob(os.path.join(sink, "dropped=*", "tag=*", "*.parquet"))
        assert files
        for f in files:
            # each file obeys the cap (reference chunk flush limit)
            n = spark.read.parquet(f).count()
            assert n <= 50, f


def test_fanout_sink_files_turn_ordered(spark, sf_dir):
    """Every sink file preserves (conv_id, turn_idx) FIFO order.

    The dynamic-partition writer requires rows sorted by the partition
    columns; run_fanout leads its sortWithinPartitions with
    ("dropped", "tag") so no writer-inserted re-sort (of unguaranteed
    stability) can scramble the per-conversation turn order (reference
    FIFO guarantee: orchestrate/obykeyset/orchestrator.go:106-119).
    Passed rows are the dropped=false per-tag sinks; dropped rows land
    in the dropped=true quarantine tier.
    """
    tf = P.transformed_df(spark, sf_dir)
    with tempfile.TemporaryDirectory() as root:
        sink = os.path.join(root, "sink")
        metrics = P.run_fanout(tf, sink)
        files = glob.glob(
            os.path.join(sink, "dropped=false", "tag=*", "*.parquet")
        )
        assert files
        checked = 0
        for f in files:
            rows = spark.read.parquet(f).select("conv_id", "turn_idx").collect()
            got = [(r["conv_id"], r["turn_idx"]) for r in rows]
            assert got == sorted(got), f
            checked += len(got)
        assert checked == tf.where("NOT dropped").count()
        # the quarantine tier holds exactly the dropped rows
        q = glob.glob(os.path.join(sink, "dropped=true", "tag=*", "*.parquet"))
        n_dropped = tf.where("dropped").count()
        assert (sum(spark.read.parquet(f).count() for f in q) if q else 0) == n_dropped
        # metrics from the read-back match metrics from the source frame
        from slog_agent_spark.operators.metrics import process_metrics
        src = {
            tuple(r)
            for r in process_metrics(tf).collect()
        }
        got_m = {tuple(r) for r in metrics.collect()}
        assert got_m == src


def test_choose_salt_buckets_from_histogram(spark, sf_dir):
    """S tracks the hot-keyset share (BENCH/SKEW.md rule): a uniform
    input needs no spread; collapsing half the rows onto one keyset
    must yield S ≈ ceil(hot_share · slots)."""
    uniform = P.transform_transcripts(transcripts_df(spark, sf_dir))
    s_uniform = P.choose_salt_buckets(uniform, slots=32)

    hot = P.transform_transcripts(
        transcripts_df(spark, sf_dir, hot_permille=500)
    )
    s_hot = P.choose_salt_buckets(hot, slots=32)

    assert 1 <= s_uniform <= 4          # no keyset above ~12% uniform
    assert s_hot > s_uniform
    # hot share is ~0.5 of ALL rows (the histogram includes the
    # quarantine tier, which rides the same shuffle)
    assert 12 <= s_hot <= 24
    # degenerate slots still clamp into [1, slots]
    assert P.choose_salt_buckets(hot, slots=1) == 1
