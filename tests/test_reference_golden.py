"""Parity against the reference's OWN golden corpus.

Feeds the reference-authored inputs (testdata/development/*-input.log,
24 records incl. multiline + escaped dumps) through this engine under
the reference's actual config (testdata/config_sample.yml, loaded by our
YAML front-end) and asserts per-record serialized-output equality with
the committed goldens (*-output-customFluentd.json /
*-output-datadogAPI.json) plus counter equality with all-pipeline.prom —
the same assertions the reference makes at ref: test/pipeline_test.go:
35-79.

Documented tolerance: fluentd EventTime fractions pass through a float32
somewhere in the reference's msgpack→JSON dump (e.g. golden
1660524500.1539998 for an input of .154), so times are compared to 2µs;
all strings/fields are compared exactly.
"""

import json
import os

import pytest

from slog_agent_spark.plans.golden import parse_prom, run_corpus, split_records
from slog_agent_spark.plans.yaml_config import load_config

REF = "/root/reference/testdata/development"
CFG = "/root/reference/testdata/config_sample.yml"
CORPORA = ["basic-1", "basic-2", "errors"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not available"
)


@pytest.fixture(scope="module")
def results(spark):
    cfg = load_config(CFG)
    out = {}
    for title in CORPORA:
        with open(f"{REF}/{title}-input.log", encoding="utf-8") as fh:
            records = split_records(fh.read())
        out[title] = run_corpus(spark, cfg, records, tag_override=title)
    return out


def _golden(title: str, output: str):
    with open(f"{REF}/{title}-output-{output}.json", encoding="utf-8") as fh:
        return json.load(fh)


@pytest.mark.parametrize("title", CORPORA)
def test_fluentd_events_match_reference_golden(results, title):
    golden = _golden(title, "customFluentd")
    ours = [json.loads(r["customFluentd"]) for r in results[title]["events"]]
    assert len(ours) == len(golden)
    for i, (g, o) in enumerate(zip(golden, ours)):
        g_tag, g_time, g_rec = g
        o_tag, o_time, o_rec = o
        assert o_tag == g_tag, f"record {i}: tag"
        assert abs(float(o_time) - float(g_time)) < 2e-6, f"record {i}: time"
        assert o_rec == g_rec, (
            f"record {i}: field diff "
            f"{ {k: (g_rec.get(k), o_rec.get(k)) for k in set(g_rec) | set(o_rec) if g_rec.get(k) != o_rec.get(k)} }"
        )


@pytest.mark.parametrize("title", CORPORA)
def test_datadog_events_match_reference_golden(results, title):
    golden = _golden(title, "datadogAPI")
    ours = [json.loads(r["datadogAPI"]) for r in results[title]["events"]]
    assert len(ours) == len(golden)
    for i, (g, o) in enumerate(zip(golden, ours)):
        assert o == g, (
            f"record {i}: field diff "
            f"{ {k: (g.get(k), o.get(k)) for k in set(g) | set(o) if g.get(k) != o.get(k)} }"
        )


def test_counters_match_reference_prom(results):
    with open(f"{REF}/all-pipeline.prom", encoding="utf-8") as fh:
        prom = parse_prom(fh.read())

    # input counters: totals over all three corpora
    total_in = sum(r["input"]["passed_records"] for r in results.values())
    total_in_bytes = sum(r["input"]["passed_bytes"] for r in results.values())
    assert total_in == prom[("input_passed_records_total", ())]
    assert total_in_bytes == prom[("input_passed_record_bytes_total", ())]
    assert all(r["input"]["malformed_records"] == 0 for r in results.values())

    # process counters: merge our per-corpus keysets, then compare each
    # prom series (metric keys host/vhost/source)
    merged: dict[tuple, dict] = {}
    for r in results.values():
        for key, vals in r["metrics"].items():
            slot = merged.setdefault(key, {})
            for k, v in vals.items():
                slot[k] = slot.get(k, 0) + (v or 0)
    mk = results["basic-1"]["metric_keys"]

    def prom_key(name: str, key: tuple, extra: tuple = ()) -> tuple:
        labels = tuple(sorted(
            [(f"key_{k}", v) for k, v in zip(mk, key)] + list(extra)
        ))
        return (name, labels)

    checked = 0
    for (name, labels), value in prom.items():
        base = {
            "process_passed_records_total": "passed_records",
            "process_passed_record_bytes_total": "passed_bytes",
            "process_dropped_records_total": "dropped_records",
            "process_dropped_record_bytes_total": "dropped_bytes",
        }.get(name)
        ld = dict(labels)
        if base is not None:
            key = tuple(ld[f"key_{k}"] for k in mk)
            assert merged[key][base] == value, (name, labels)
            checked += 1
        elif name in ("process_labelled_records_total",
                      "process_labelled_record_bytes_total"):
            key = tuple(ld[f"key_{k}"] for k in mk)
            which = ("labelled_records:" if name.endswith("records_total")
                     else "labelled_bytes:") + ld["label"]
            assert merged[key][which] == value, (name, labels)
            checked += 1
    assert checked >= 20  # the prom dump's full process-counter series

    # and the other direction: we must not count anything the prom has
    # no series for (zero-valued counters are lazily absent in the ref)
    for key, vals in merged.items():
        for k, v in vals.items():
            if not v:
                continue
            if k.startswith("labelled_records:"):
                name = "process_labelled_records_total"
                extra = (("label", k.split(":", 1)[1]),)
            elif k.startswith("labelled_bytes:"):
                name = "process_labelled_record_bytes_total"
                extra = (("label", k.split(":", 1)[1]),)
            else:
                name = {
                    "passed_records": "process_passed_records_total",
                    "passed_bytes": "process_passed_record_bytes_total",
                    "dropped_records": "process_dropped_records_total",
                    "dropped_bytes": "process_dropped_record_bytes_total",
                }[k]
                extra = ()
            assert prom_key(name, key, extra) in prom, (key, k, v)


# ---------------------------------------------------------------------------
# Agent harness: keys overridden to [host], tag $host
# (ref: test/agent_test.go:26-27,75-80) — proving the byKeySet routed
# path on reference data, not just the in-order pipeline harness.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def agent_results(spark):
    import dataclasses

    cfg = load_config(CFG)
    # the keys override moves the ORIGINAL orchestration keys into
    # metricKeys (minus overlap), then appends the original metricKeys
    # (ref: test/agent.go:36-50) — yielding key_host (keyset) +
    # key_app/key_level/key_pnum/key_vhost/key_source counter labels
    keys = ["host"]
    new_mk = [k for k in cfg.orchestration_keys if k not in keys] + [
        k for k in cfg.metric_keys if k not in keys
    ]
    cfg = dataclasses.replace(cfg, metric_keys=new_mk)
    records: list[str] = []
    for title in CORPORA:  # concurrent feeders in the reference; per-host
        with open(f"{REF}/{title}-input.log", encoding="utf-8") as fh:
            records.extend(split_records(fh.read()))  # order is per-corpus
    return run_corpus(spark, cfg, records, keys=keys, tag_template="$host")


@pytest.mark.parametrize("title", CORPORA)
@pytest.mark.parametrize("output", ["customFluentd", "datadogAPI"])
def test_agent_routed_events_match_reference_golden(
    agent_results, title, output
):
    """Per-sink (per-tag) serialized outputs: the keyset router must
    deliver each host's records, in order, to the $host-tagged sink."""
    golden = _golden(title, output)
    ours = [
        json.loads(r[output])
        for r in agent_results["events"]
        if r["_tag"] == title
    ]
    assert len(ours) == len(golden)
    for i, (g, o) in enumerate(zip(golden, ours)):
        if output == "customFluentd":
            g_tag, g_time, g_rec = g
            o_tag, o_time, o_rec = o
            assert o_tag == g_tag == title, f"record {i}: tag"
            assert abs(float(o_time) - float(g_time)) < 2e-6, f"record {i}: time"
            g, o = g_rec, o_rec
        assert o == g, (
            f"record {i}: field diff "
            f"{ {k: (g.get(k), o.get(k)) for k in set(g) | set(o) if g.get(k) != o.get(k)} }"
        )


def test_agent_counters_match_reference_prom(agent_results):
    """all-agent.prom parity for the counter families this engine
    models: input_* totals and the per-(host × metricKeys) process_*
    set. Buffer/chunk series (hybridBuffer, chunks_total, ...) are the
    reference's queue plumbing — N/A by design (SURVEY §2.9: Spark
    shuffle/ack replaces the hybrid buffer)."""
    with open(f"{REF}/all-agent.prom", encoding="utf-8") as fh:
        prom = parse_prom(fh.read(), prefix="testagent_")

    r = agent_results
    assert r["input"]["passed_records"] == prom[
        ("input_passed_records_total", (("protocol", "syslog"),))
    ]
    assert r["input"]["passed_bytes"] == prom[
        ("input_passed_record_bytes_total", (("protocol", "syslog"),))
    ]
    assert r["input"]["malformed_records"] == 0

    mk = r["metric_keys"]
    assert mk[0] == "host"  # the overridden orchestration keyset leads

    def prom_key(name: str, key: tuple, extra: tuple = ()) -> tuple:
        labels = tuple(sorted(
            [(f"key_{k}", v) for k, v in zip(mk, key)]
            + [("orchestrator", "byKeySet")]
            + list(extra)
        ))
        return (name, labels)

    checked = 0
    for (name, labels), value in prom.items():
        base = {
            "process_passed_records_total": "passed_records",
            "process_passed_record_bytes_total": "passed_bytes",
            "process_dropped_records_total": "dropped_records",
            "process_dropped_record_bytes_total": "dropped_bytes",
        }.get(name)
        ld = dict(labels)
        if base is not None:
            key = tuple(ld[f"key_{k}"] for k in mk)
            assert r["metrics"][key][base] == value, (name, labels)
            checked += 1
        elif name in ("process_labelled_records_total",
                      "process_labelled_record_bytes_total"):
            key = tuple(ld[f"key_{k}"] for k in mk)
            which = ("labelled_records:" if name.endswith("records_total")
                     else "labelled_bytes:") + ld["label"]
            assert r["metrics"][key][which] == value, (name, labels)
            checked += 1
    assert checked >= 20

    # reverse direction: every non-zero counter we produced has a series
    for key, vals in r["metrics"].items():
        for k, v in vals.items():
            if not v:
                continue
            if k.startswith("labelled_records:"):
                name = "process_labelled_records_total"
                extra = (("label", k.split(":", 1)[1]),)
            elif k.startswith("labelled_bytes:"):
                name = "process_labelled_record_bytes_total"
                extra = (("label", k.split(":", 1)[1]),)
            else:
                name = {
                    "passed_records": "process_passed_records_total",
                    "passed_bytes": "process_passed_record_bytes_total",
                    "dropped_records": "process_dropped_records_total",
                    "dropped_bytes": "process_dropped_record_bytes_total",
                }[k]
                extra = ()
            assert prom_key(name, key, extra) in prom, (key, k, v)
