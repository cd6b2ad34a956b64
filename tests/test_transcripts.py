"""Transcript derivation: Spark and DuckDB must produce identical tables."""

from __future__ import annotations

from conftest import assert_df_equals_oracle

from slog_agent_spark.sources.transcripts import (
    MALFORMED_MOD,
    TRANSCRIPT_COLUMNS,
    transcripts_df,
    transcripts_oracle_cte,
)


def test_schema(spark, sf_dir):
    df = transcripts_df(spark, sf_dir)
    assert df.columns == TRANSCRIPT_COLUMNS
    types = dict(df.dtypes)
    assert types["turn_idx"] == "int"
    assert types["ts"] in ("timestamp", "timestamp_ntz")


def test_full_parity(spark, sf_dir, duck):
    df = transcripts_df(spark, sf_dir)
    assert_df_equals_oracle(
        df, duck, "WITH t AS (" + transcripts_oracle_cte() + ") SELECT * FROM t"
    )


def test_explode_parity_counts(spark, sf_dir, duck):
    n_spark = transcripts_df(spark, sf_dir, explode=3).count()
    n_duck = duck.execute(
        "WITH t AS (" + transcripts_oracle_cte(3) + ") SELECT count(*) FROM t"
    ).fetchone()[0]
    assert n_spark == n_duck


def test_turn_idx_contiguous(spark, sf_dir):
    """turn_idx is 0..n-1 contiguous within each conv_id (FIFO invariant)."""
    from pyspark.sql import functions as F

    df = transcripts_df(spark, sf_dir)
    bad = (
        df.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.min("turn_idx").alias("lo"),
            F.max("turn_idx").alias("hi"),
            F.countDistinct("turn_idx").alias("nd"),
        )
        .where("lo != 0 OR hi != n - 1 OR nd != n")
        .count()
    )
    assert bad == 0


def test_payload_classes_present(spark, sf_dir):
    from pyspark.sql import functions as F

    df = transcripts_df(spark, sf_dir).cache()
    try:
        assert df.where(F.col("text").rlike(r"^<\d{1,3}>1 ")).count() > 0
        assert df.where(F.col("text").startswith("MALFORMED")).count() > 0
        assert df.where(F.col("text").contains("@")).count() > 0
        assert df.where(F.col("text").contains("\n")).count() > 0  # real newline
        assert df.where(F.col("text").contains("\\n")).count() > 0  # escaped
        n = df.count()
        assert df.where(F.col("text").startswith("MALFORMED")).count() <= n // MALFORMED_MOD + 1
    finally:
        df.unpersist()
