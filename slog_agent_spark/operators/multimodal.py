"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as `binary` columns with a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partition behavior) is real and tested; the
actual codec work (image decode, resample, frame extraction) is STUBBED
because this environment ships no media libraries. Each stub documents
its real implementation and raises ``NotImplementedError`` unless the
optional dependency imports.

The deterministic feature path (byte stats) is fully functional and
oracle-checked: the media table derives payloads from ``documents.text``
(ASCII), so the DuckDB oracle can recompute every feature from the text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dialect import SqlDialect

KINDS = ["image", "audio", "video"]

FEATURE_SCHEMA = (
    "doc_id bigint, kind string, n_bytes int, head_checksum int, "
    "meta_width int, meta_duration_ms int"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table: (doc_id, kind, payload binary, meta)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    meta = F.struct(
        ((F.col("doc_id") % 16) * 64 + 64).cast("int").alias("width"),
        ((F.col("doc_id") % 16) * 48 + 48).cast("int").alias("height"),
        ((F.col("doc_id") % 30) * 1000 + 500).cast("int").alias("duration_ms"),
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (mapInPandas).

    Real pipelines plug decode_* below into this exact shape: the UDF
    sees pandas batches with `payload` as bytes objects; output schema is
    declared up front so Spark plans downstream operators normally.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len),
                    "head_checksum": payloads.map(
                        lambda b: int(sum(b[:16])) if b is not None else 0
                    ),
                    "meta_width": pdf["meta"].map(lambda m: m["width"]),
                    "meta_duration_ms": pdf["meta"].map(lambda m: m["duration_ms"]),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def features_oracle_sql(d: SqlDialect, docs_rel: str = "documents") -> str:
    """DuckDB recomputation of extract_features from the source text."""
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    head = (
        "list_sum(list_transform(range(1, CAST(least(length(text), 16) AS BIGINT) + 1), "
        "i -> ord(substr(text, CAST(i AS INT), 1))))"
    )
    return f"""
    SELECT doc_id,
           [{kinds}][CAST(doc_id % 3 AS INT) + 1] AS kind,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST({head} AS INT) AS head_checksum,
           CAST((doc_id % 16) * 64 + 64 AS INT) AS meta_width,
           CAST((doc_id % 30) * 1000 + 500 AS INT) AS meta_duration_ms
    FROM {docs_rel}
    """


# ---------------------------------------------------------------------------
# Codec stubs — real signatures, deterministic fallbacks for tests
# ---------------------------------------------------------------------------

def decode_image(payload: bytes, meta: dict) -> "object":
    """Decode an image payload to HxWx3 uint8.

    Real implementation: ``PIL.Image.open(io.BytesIO(payload))`` →
    ``np.asarray``. Not available in this container.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs Pillow; use extract_features for byte stats"
        ) from e
    raise NotImplementedError("unreachable in this environment")


def resample_audio(payload: bytes, meta: dict, target_hz: int) -> "object":
    """Real implementation: soundfile/librosa load + resample."""
    raise NotImplementedError(
        "audio resample needs soundfile/librosa; not shipped here"
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over binary payloads: one row per sampled offset.

    For real video this is the decode-keyframes step; the deterministic
    stand-in samples a byte every ``every_n_bytes`` — exercising the
    explode/byte-slicing plumbing (posexplode over computed offsets)."""
    n = F.octet_length("payload")
    offsets = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(every_n_bytes))
    frame = F.expr(f"transform(sequence(1, greatest(octet_length(payload), 1), {every_n_bytes}), i -> ascii(substr(CAST(payload AS STRING), i, 1)))")
    return media.select(
        "doc_id", "kind",
        F.posexplode(F.arrays_zip(offsets.alias("off"), frame.alias("byte"))).alias("frame_idx", "z"),
    ).select(
        "doc_id", "kind", "frame_idx",
        F.col("z.off").alias("offset"),
        F.col("z.byte").alias("byte_value"),
    )
