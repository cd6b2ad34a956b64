"""Serializer parity + golden-shape checks."""

from __future__ import annotations

import json

from conftest import assert_df_equals_oracle
from pyspark.sql import functions as F

from slog_agent_spark.plans import pipeline as P


def test_serialized_events_parity(spark, sf_dir, duck):
    df = P.serialized_events_df(spark, sf_dir)
    assert_df_equals_oracle(df, duck, P.serialized_events_oracle_sql())


def test_output_counters_parity(spark, sf_dir, duck):
    df = P.output_counters_df(spark, sf_dir)
    for c in ("serialized_records", "fluentd_bytes", "datadog_bytes"):
        df = df.withColumn(c, F.col(c).cast("long"))
    assert_df_equals_oracle(df, duck, P.output_counters_oracle_sql())


def test_fluentd_event_shape(spark, sf_dir):
    """Events must be valid JSON of shape [tag, time, {..., environment}]."""
    rows = P.serialized_events_df(spark, sf_dir).limit(200).collect()
    assert rows
    for r in rows:
        ev = json.loads(r["fluentd_event"])
        assert isinstance(ev, list) and len(ev) == 3
        tag, t, body = ev
        assert tag == r["tag"]
        assert isinstance(t, float)
        assert "environment" in body
        # hidden fields omitted (reference: config_sample.yml hiddenFields)
        for h in ("task", "class", "pnum", "ddsource", "hostname", "service"):
            assert h not in body
        # empty fields omitted
        assert all(v != "" for v in body.values() if isinstance(v, str))
        env = body["environment"]
        assert set(env) <= {"host", "vhost", "app", "source"}

        dd = json.loads(r["datadog_event"])
        # epoch-ms STRING, matching the reference
        # (output/datadog/eventserializer.go:44 FormatInt into map[string]string)
        assert isinstance(dd["timestamp"], str) and dd["timestamp"].isdigit()
        assert dd.get("ddtags")  # defaults to tag when empty
        assert "task" not in dd and "class" not in dd and "pnum" not in dd


def test_inline_rewrite_visible(spark, sf_dir):
    """Rows with a class must serialize log as 'class=<C> <log>'."""
    df = P.transformed_df(spark, sf_dir).where("NOT dropped AND class != ''")
    ev = P.serialized_events_df(spark, sf_dir)
    joined = df.select("conv_id", "turn_idx", "class").join(
        ev, ["conv_id", "turn_idx"]
    )
    rows = joined.limit(50).collect()
    assert rows
    for r in rows:
        body = json.loads(r["fluentd_event"])[2]
        assert body["log"].startswith("class="), body["log"]
