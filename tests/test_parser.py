"""Grok parse stage parity + semantics."""

from __future__ import annotations

from conftest import assert_df_equals_oracle
from pyspark.sql import functions as F

from slog_agent_spark.sources.parser import parse_oracle_select, parse_transcripts
from slog_agent_spark.sources.transcripts import transcripts_df, transcripts_oracle_cte


def test_parse_parity(spark, sf_dir, duck):
    df = parse_transcripts(transcripts_df(spark, sf_dir))
    # raw_length is bigint on duck side; cast to long on spark for compare
    df = df.withColumn("raw_length", F.col("raw_length").cast("long"))
    oracle = (
        "WITH transcripts AS (" + transcripts_oracle_cte() + ") " + parse_oracle_select()
    )
    assert_df_equals_oracle(df, duck, oracle)


def test_level_matches_role(spark, sf_dir):
    """pri%8 → level must reproduce the transcript's role column."""
    df = parse_transcripts(transcripts_df(spark, sf_dir))
    assert df.where("parse_ok AND level != role").count() == 0


def test_malformed_flagged_not_dropped(spark, sf_dir):
    df = parse_transcripts(transcripts_df(spark, sf_dir)).cache()
    try:
        total = df.count()
        bad = df.where(~F.col("parse_ok")).count()
        assert bad > 0
        assert df.where(~F.col("parse_ok") & (F.col("log") == F.col("text"))).count() == bad
        assert df.where(F.col("parse_ok")).count() + bad == total
    finally:
        df.unpersist()


def test_multiline_unescaped_flag(spark, sf_dir):
    df = parse_transcripts(transcripts_df(spark, sf_dir))
    assert df.where(F.col("unescaped") & ~F.col("log").contains("\n")).count() == 0
    assert df.where(F.col("unescaped")).count() > 0
