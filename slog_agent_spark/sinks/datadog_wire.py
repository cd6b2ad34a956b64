"""Datadog log-intake WIRE bytes: gzip JSON-array chunks with the
reference's size/record caps and monotonic chunk IDs.

Chunk = gzip("[" + rec + ("," + rec)* + "]") — the exact body the
reference POSTs to the Datadog logs endpoint (ref: output/datadog/
chunk.go:21-110). Caps count UNCOMPRESSED bytes including the comma
delimiters and the closing bracket: 5 MiB / 1000 records per chunk
(ref: output/datadog/config.go:20-26). Chunk IDs come from the same
nanosecond+sequence generator as the fluentd path (ref:
output/shared/chunkidgen.go:27-39).

The per-record JSON is the oracle-gated serializer output
(sinks/serializers.datadog_event — epoch-ms strings, default ddtags,
field order pinned against the reference goldens), so chunk bytes
inherit that parity; tests round-trip chunks back to the golden event
list.
"""

from __future__ import annotations

import gzip
import json
from collections.abc import Iterable, Iterator

from .fluentd_wire import ChunkIDGenerator

MAX_CHUNK_BYTES = 5 * 1024 * 1024  # uncompressed JSON-array bytes
MAX_CHUNK_RECORDS = 1000


def chunk_events(
    event_jsons: Iterable[str],
    max_bytes: int = MAX_CHUNK_BYTES,
    max_records: int = MAX_CHUNK_RECORDS,
    idgen: ChunkIDGenerator | None = None,
) -> Iterator[tuple[str, bytes, int, int]]:
    """Stream serialized JSON events into gzip array chunks.

    Yields ``(chunk_id, chunk_bytes, n_records, n_raw_bytes)`` where
    ``n_raw_bytes`` mirrors chunk.go's numBytes accounting EXACTLY:
    opening bracket + one delimiter per record INCLUDING the first
    (chunk.go:66 adds len(recordDelimiter) on every Write, even though
    no comma is emitted before record 0) + record bytes + closing
    bracket — so it over-counts the actual array body by one byte per
    chunk, and flush boundaries land where the reference's
    CanAppendData (numBytes + dataLength + len("]")) puts them.
    """
    idgen = idgen or ChunkIDGenerator()
    buf: list[str] = []
    n_raw = 1  # the opening "["

    def flush():
        nonlocal buf, n_raw
        if not buf:
            return None
        body = "[" + ",".join(buf) + "]"
        out = (
            idgen.generate(),
            gzip.compress(body.encode("utf-8"), mtime=0),
            len(buf),
            n_raw + 1,  # + closing "]"
        )
        buf, n_raw = [], 1
        return out

    for ev in event_jsons:
        data_len = len(ev.encode("utf-8"))
        over_records = max_records > 0 and len(buf) >= max_records
        over_bytes = (
            max_bytes > 0 and buf
            and n_raw + data_len + 1 > max_bytes
        )
        if over_records or over_bytes:
            done = flush()
            if done:
                yield done
        buf.append(ev)
        n_raw += 1 + data_len  # delimiter counted for EVERY record
    done = flush()
    if done:
        yield done


def decode_chunk(data: bytes) -> list:
    """Chunk bytes → list of event dicts (round-trip check)."""
    return json.loads(gzip.decompress(data).decode("utf-8"))


def write_wire_chunks(
    events_df,
    out_dir: str,
    event_col: str = "datadog_event",
    max_bytes: int = MAX_CHUNK_BYTES,
    max_records: int = MAX_CHUNK_RECORDS,
    salts: int = 1,
    base_nano: int | None = None,
) -> None:
    """Write Datadog wire chunks: ``<out>/<tag>/<id>.json.gz``, events
    in (conv_id, turn_idx) FIFO order within each (tag, salt) group —
    same transactional shape as the fluentd wire writer (shared
    ``run_wire_job`` body): deterministic chunk IDs (``base_nano``
    captured once across task attempts), atomic write-then-rename,
    ``salts`` sub-chunkers per hot tag with the reference's ID-suffix
    convention, collision-safe tag directories, and cross-run stale
    chunk/tag cleanup so a re-run replaces instead of accumulating."""
    from .fluentd_wire import run_wire_job

    def chunker(_tag, events, idgen):
        return chunk_events(
            events, max_bytes=max_bytes, max_records=max_records, idgen=idgen,
        )

    run_wire_job(
        events_df, out_dir, event_col, chunker, "json.gz", salts, base_nano
    )
