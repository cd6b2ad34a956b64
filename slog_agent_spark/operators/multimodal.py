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

    No per-row Python: struct fields are unpacked JVM-side before the
    UDF, and the byte stats are computed on the Arrow binary buffers
    directly (offsets + one numpy gather) — the whole batch is a handful
    of vectorized ops.
    """
    flat = media.select(
        "doc_id", "kind", "payload",
        F.col("meta.width").alias("meta_width"),
        F.col("meta.duration_ms").alias("meta_duration_ms"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pyarrow as pa

        for pdf in it:
            arr = pa.array(pdf["payload"], type=pa.large_binary())
            buffers = arr.buffers()  # [validity, offsets(int64), data]
            offsets = np.frombuffer(buffers[1], dtype=np.int64)[
                arr.offset : arr.offset + len(arr) + 1
            ]
            starts, ends = offsets[:-1], offsets[1:]
            lens = ends - starts
            if len(arr) and buffers[2] is not None:
                data = np.frombuffer(buffers[2], dtype=np.uint8)
                take = np.minimum(lens, 16)
                cols = np.arange(16)[None, :]
                mask = cols < take[:, None]
                gather = np.where(mask, starts[:, None] + cols, 0)
                head = (data[gather].astype(np.int64) * mask).sum(axis=1)
            else:
                head = np.zeros(len(arr), dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": lens.astype("int32"),
                    "head_checksum": head.astype("int32"),
                    "meta_width": pdf["meta_width"],
                    "meta_duration_ms": pdf["meta_duration_ms"],
                }
            )

    return flat.mapInPandas(batches, FEATURE_SCHEMA)


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
