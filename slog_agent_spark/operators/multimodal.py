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


TRAILER_BYTES = 16


def _trailer_byte_formula(doc_id: str, j: str) -> str:
    """Byte j (0-based) of the deterministic binary trailer — covers
    0x00-0xFF including invalid-UTF-8 values, so string-cast bugs in any
    byte path CANNOT pass the fixtures (the round-2 sample_frames bug
    survived only because payloads were pure ASCII). Plain ``%`` is
    portable here: both operands are non-negative in both dialects."""
    return f"(({doc_id} * 7 + {j} * 17 + 128) % 256)"


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table: (doc_id, kind, payload binary, meta).

    The payload is the document text's UTF-8 bytes plus a
    TRAILER_BYTES-long raw-byte trailer with values ≥0x80 / invalid
    UTF-8 — real media bytes, not text in disguise.
    """
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
    trailer = F.expr(
        f"unhex(array_join(transform(sequence(0, {TRAILER_BYTES - 1}), "
        f"j -> lpad(hex({_trailer_byte_formula('doc_id', 'j')}), 2, '0')), ''))"
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.concat(F.encode("text", "UTF-8"), trailer).alias("payload"),
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
    # head checksum covers the first 16 bytes only — the fixture's text
    # is always ≥16 bytes (min 48), so the trailer never reaches the head
    return f"""
    SELECT doc_id,
           [{kinds}][CAST(doc_id % 3 AS INT) + 1] AS kind,
           CAST(octet_length(encode(text)) + {TRAILER_BYTES} AS INT) AS n_bytes,
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
    explode/byte-slicing plumbing (posexplode over computed offsets).

    Operates on the BINARY column directly: ``substring`` on binary
    yields a 1-byte slice whose value is recovered via hex — correct for
    all byte values 0x00-0xFF. (The previous ``CAST(payload AS STRING)``
    mangled any non-UTF-8 byte; the media fixture now contains such
    bytes precisely so this path stays honest.)"""
    n = F.octet_length("payload")
    offsets = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(every_n_bytes))
    frame = F.expr(
        f"transform(sequence(1, greatest(octet_length(payload), 1), "
        f"{every_n_bytes}), "
        "i -> CAST(conv(hex(substring(payload, i, 1)), 16, 10) AS INT))"
    )
    return media.select(
        "doc_id", "kind",
        F.posexplode(F.arrays_zip(offsets.alias("off"), frame.alias("byte"))).alias("frame_idx", "z"),
    ).select(
        "doc_id", "kind", "frame_idx",
        F.col("z.off").alias("offset"),
        F.col("z.byte").alias("byte_value"),
    )


def frames_oracle_sql(
    d: SqlDialect, every_n_bytes: int = 64, docs_rel: str = "documents"
) -> str:
    """DuckDB recomputation of sample_frames from the source text.

    DuckDB cannot index BLOB bytes directly, so the text part reads the
    byte from the full hex dump (byte-exact for any input encoding) and
    the trailer part recomputes the generator formula.
    """
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    tlen = "octet_length(encode(text))"
    text_byte = d.hex_digit("substr(hex(encode(text)), CAST(2 * off - 1 AS INT), 2)")
    trailer_byte = _trailer_byte_formula("doc_id", f"(off - {tlen} - 1)")
    return f"""
    SELECT doc_id,
           [{kinds}][CAST(doc_id % 3 AS INT) + 1] AS kind,
           CAST((off - 1) // {every_n_bytes} AS INT) AS frame_idx,
           CAST(off AS INT) AS offset,
           CAST(CASE WHEN off <= {tlen} THEN {text_byte}
                     ELSE {trailer_byte} END AS INT) AS byte_value
    FROM {docs_rel}
    CROSS JOIN LATERAL (
      SELECT CAST(u.off AS BIGINT) AS off
      FROM (SELECT unnest(generate_series(1,
              greatest({tlen} + {TRAILER_BYTES}, 1), {every_n_bytes})) AS off) u
    ) gen
    """
