"""Golden Prometheus metrics dump — the reference's strongest regression
net (reference: testdata/development/all-pipeline.prom, asserted at
test/pipeline_test.go:73-78). Regenerate with:

    SLOG_REGEN_GOLDEN=1 python -m pytest tests/test_metrics_golden.py
"""

from __future__ import annotations

import os

from slog_agent_spark.operators.metrics import process_metrics, prometheus_dump
from slog_agent_spark.plans import pipeline as P

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "all-pipeline.prom")


def test_prometheus_golden(spark, sf_dir):
    dump = prometheus_dump(process_metrics(P.transformed_df(spark, sf_dir)))
    if os.environ.get("SLOG_REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(dump)
    with open(GOLDEN) as f:
        golden = f.read()
    assert dump == golden


def test_prometheus_shape(spark, sf_dir):
    dump = prometheus_dump(process_metrics(P.transformed_df(spark, sf_dir)))
    lines = dump.strip().split("\n")
    assert all(l.startswith("slogagent_process_") for l in lines)
    assert any('label="app-auth"' in l for l in lines)
    assert any('label="redacted"' in l for l in lines)
    assert any('label="!downsampled"' in l for l in lines)
    assert any("passed_records_total" in l for l in lines)
    assert any("dropped_record" in l for l in lines)
