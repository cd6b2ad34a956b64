"""Config hot-reload: append-only schema evolution.

reference: run/reloader.go:1-139 (SIGHUP reload restrictions) and
config_sample.yml:41-47. Covers both the validation rules and the data
plane: sink files written before a legal field append stay readable
together with post-append files (the Iceberg add-column analogue, here
parquet schema-merge).
"""

from __future__ import annotations

import dataclasses
import os
import tempfile

import pytest

from slog_agent_spark.plans import pipeline as P
from slog_agent_spark.plans.config import DEFAULT_CONFIG
from slog_agent_spark.plans.yaml_config import ConfigError, validate_reload
from slog_agent_spark.sources.transcripts import transcripts_df


def _with(**kw):
    return dataclasses.replace(DEFAULT_CONFIG, **kw)


def test_append_field_is_legal():
    new = _with(schema_fields=DEFAULT_CONFIG.schema_fields + ["extra1"])
    validate_reload(DEFAULT_CONFIG, new)  # no raise


@pytest.mark.parametrize(
    "mutate,msg",
    [
        # removing a field
        (lambda c: _with(schema_fields=c.schema_fields[:-1]), "appended"),
        # renaming a field
        (
            lambda c: _with(
                schema_fields=["renamed"] + c.schema_fields[1:]
            ),
            "appended",
        ),
        # moving fields
        (
            lambda c: _with(
                schema_fields=list(reversed(c.schema_fields))
            ),
            "appended",
        ),
        # growing past maxFields
        (
            lambda c: _with(
                schema_fields=c.schema_fields
                + [f"x{i}" for i in range(c.max_fields)]
            ),
            "maxFields",
        ),
        # changing maxFields itself
        (lambda c: _with(max_fields=c.max_fields + 1), "cannot change"),
        # changing orchestration keys
        (lambda c: _with(orchestration_keys=["app"]), "cannot change"),
        # changing the tag
        (lambda c: _with(orchestration_tag="other.$app"), "cannot change"),
        # changing extractions
        (lambda c: _with(extractions=c.extractions[:-1]), "cannot change"),
    ],
)
def test_illegal_reloads_rejected(mutate, msg):
    with pytest.raises(ConfigError, match=msg):
        validate_reload(DEFAULT_CONFIG, mutate(DEFAULT_CONFIG))


def test_metric_keys_may_change():
    validate_reload(DEFAULT_CONFIG, _with(metric_keys=["host"]))


def test_schema_append_keeps_old_sink_files_readable(spark, sf_dir):
    """Data-plane half of reload: files written pre-append and post-append
    coexist in one sink (parquet mergeSchema; Iceberg add-column on a
    real lakehouse). Old rows surface NULL for the appended column."""
    tf = P.transformed_df(spark, sf_dir).where("NOT dropped")
    with tempfile.TemporaryDirectory() as root:
        sink = os.path.join(root, "s")
        tf.limit(50).write.parquet(sink)
        tf.limit(30).selectExpr("*", "'v2' AS appended_field").write.mode(
            "append"
        ).parquet(sink)
        got = spark.read.option("mergeSchema", "true").parquet(sink)
        assert got.count() == 80
        assert "appended_field" in got.columns
        nulls = got.where("appended_field IS NULL").count()
        assert nulls == 50  # pre-append rows read cleanly with NULL
