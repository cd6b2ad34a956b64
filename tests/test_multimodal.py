"""Multimodal plumbing: binary columns + mapInPandas batch shape."""

from __future__ import annotations

import pytest
from conftest import assert_df_equals_oracle
from pyspark.sql import functions as F

from slog_agent_spark.functions.dialect import DUCKDB
from slog_agent_spark.operators.multimodal import (
    decode_image,
    extract_features,
    features_oracle_sql,
    media_table,
    resample_audio,
    sample_frames,
)


def test_media_schema(spark, sf_dir):
    m = media_table(spark, sf_dir)
    types = dict(m.dtypes)
    assert types["payload"] == "binary"
    assert types["kind"] == "string"
    assert types["meta"].startswith("struct<")


def test_feature_extract_matches_oracle(spark, sf_dir, duck):
    feats = extract_features(media_table(spark, sf_dir))
    feats = feats.withColumn("doc_id", F.col("doc_id").cast("long"))
    assert_df_equals_oracle(feats, duck, features_oracle_sql(DUCKDB))


def test_map_in_pandas_batching(spark, sf_dir):
    """Repartitioned input still yields exactly one output row per doc."""
    m = media_table(spark, sf_dir).repartition(7)
    out = extract_features(m)
    assert out.count() == 500
    assert out.select("doc_id").distinct().count() == 500


def test_frame_sampling(spark, sf_dir):
    frames = sample_frames(media_table(spark, sf_dir), every_n_bytes=32)
    agg = frames.groupBy("doc_id").count()
    one = frames.where("doc_id = 0 AND frame_idx = 0").first()
    assert one["offset"] == 1 and one["byte_value"] > 0
    assert agg.where("count < 1").count() == 0


def test_frame_sampling_reads_real_binary(spark, sf_dir, duck):
    """Byte values must be read from the BINARY payload — including
    ≥0x80 / invalid-UTF-8 bytes (a CAST-to-string path mangles these;
    round-2 latent bug). every_n_bytes=1 walks every byte, so the
    trailer's non-ASCII bytes are always sampled."""
    from slog_agent_spark.operators.multimodal import frames_oracle_sql

    media = media_table(spark, sf_dir).where("doc_id < 40")
    frames = sample_frames(media, every_n_bytes=1)
    assert frames.where("byte_value > 127").count() > 0
    assert frames.where("byte_value IS NULL OR byte_value < 0 OR byte_value > 255").count() == 0
    oracle = frames_oracle_sql(DUCKDB, every_n_bytes=1) + " WHERE doc_id < 40"
    assert_df_equals_oracle(frames, duck, oracle)


def test_decode_stubs_raise(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", {})
    with pytest.raises(NotImplementedError):
        resample_audio(b"xx", {}, 16000)
