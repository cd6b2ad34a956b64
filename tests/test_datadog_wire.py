"""Datadog wire chunks: gzip JSON arrays, caps, monotonic IDs, golden
round-trip (ref: output/datadog/chunk.go:21-110, config.go:20-26)."""

from __future__ import annotations

import glob
import json
import os
import tempfile

import pytest

from slog_agent_spark.sinks.datadog_wire import chunk_events, decode_chunk
from slog_agent_spark.sinks.fluentd_wire import ChunkIDGenerator

REF = "/root/reference/testdata/development"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference corpus absent")
@pytest.mark.parametrize("title", ["basic-2", "errors"])
def test_chunk_roundtrip_against_reference_golden(title):
    with open(f"{REF}/{title}-output-datadogAPI.json", encoding="utf-8") as fh:
        golden = json.load(fh)
    jsons = [json.dumps(g, separators=(",", ":")) for g in golden]
    chunks = list(chunk_events(jsons, max_bytes=4096))
    decoded = []
    for _cid, data, n_rec, n_raw in chunks:
        events = decode_chunk(data)
        assert len(events) == n_rec
        assert n_raw <= 4096 + 1 or n_rec == 1  # numBytes hits cap+1 when full
        assert data[:2] == b"\x1f\x8b"  # real gzip
        decoded.extend(events)
    assert decoded == golden


def test_byte_accounting_matches_reference_rule():
    """numBytes mirrors chunk.go exactly: '[' then one delimiter PER
    RECORD including the first (chunk.go:66), ']' at finalize; the
    overflow check is numBytes + dataLength + len(']')
    (chunk.go:96-107). With 7-byte records and cap 17: after two
    records numBytes = 1+8+8 = 17; a third would need 17+7+1 = 25 > 17
    → flush. Reported raw = 17+1 = 18 (the reference's numBytes also
    lands at cap+1 on an exactly-full chunk)."""
    evs = ['{"a":1}'] * 5  # 7 bytes each
    chunks = list(chunk_events(evs, max_bytes=17, max_records=0))
    assert [c[2] for c in chunks] == [2, 2, 1]
    assert [c[3] for c in chunks] == [18, 18, 10]


def test_record_cap_and_monotonic_ids():
    ticks = iter(range(1000))
    gen = ChunkIDGenerator(suffix="#dd", clock=lambda: next(ticks))
    evs = [json.dumps({"i": i}) for i in range(25)]
    chunks = list(chunk_events(evs, max_records=10, idgen=gen))
    assert [c[2] for c in chunks] == [10, 10, 5]
    ids = [c[0] for c in chunks]
    assert ids == sorted(ids) and len(set(ids)) == 3
    assert all(i.endswith("#dd") for i in ids)


def test_spark_writer_per_tag_chunks(spark, sf_dir):
    from slog_agent_spark.plans.pipeline import serialized_events_df
    from slog_agent_spark.sinks.datadog_wire import write_wire_chunks

    ev = serialized_events_df(spark, sf_dir)
    n_expected = ev.count()
    with tempfile.TemporaryDirectory() as out:
        write_wire_chunks(ev, out, max_records=50)
        files = glob.glob(os.path.join(out, "*", "*.json.gz"))
        assert files
        total = 0
        for f in files:
            with open(f, "rb") as fh:
                events = decode_chunk(fh.read())
            assert len(events) <= 50
            assert all("message" in e or "ddsource" in e for e in events)
            total += len(events)
        assert total == n_expected
