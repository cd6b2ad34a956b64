"""Metric aggregation: the reference's only 'aggregation lattice'.

Per-keyset × metric-key counters (reference:
base/logprocesscounterset.go:20-33,105-143) computed as ONE hash
aggregate with map-side partial combine — label counters are conditional
sums in the same pass, so the metrics never add a second scan or shuffle.

Also provides a Prometheus-text dump mirroring the reference's golden
metric fixtures (reference: testdata/development/all-pipeline.prom,
asserted at test/pipeline_test.go:73-78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.config import DEFAULT_CONFIG
from ..plans.yaml_config import PipelineConfig


def label_col(label: str) -> str:
    return "lbl_" + label.replace("!", "not_").replace("-", "_")


def process_metrics(
    transformed: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Wide per-keyset counter table from the transformed (pre-filter) DF."""
    cfg = cfg or DEFAULT_CONFIG
    aggs = [
        F.sum(F.when(~F.col("dropped"), 1).otherwise(0)).alias("passed_records"),
        F.sum(F.when(~F.col("dropped"), F.col("raw_length")).otherwise(0)).alias("passed_bytes"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias("dropped_records"),
        F.sum(F.when(F.col("dropped"), F.col("raw_length")).otherwise(0)).alias("dropped_bytes"),
    ]
    for label in cfg.labels:
        c = label_col(label)
        aggs.append(F.sum(F.when(F.col(c), 1).otherwise(0)).alias(f"{c}_records"))
        aggs.append(
            F.sum(F.when(F.col(c), F.col("raw_length")).otherwise(0)).alias(f"{c}_bytes")
        )
    return transformed.groupBy(
        *cfg.orchestration_keys, *cfg.metric_keys
    ).agg(*aggs)


def prometheus_dump(
    metrics: DataFrame, cfg: PipelineConfig | None = None
) -> str:
    """Render the wide counter table as sorted Prometheus text lines.

    Shape mirrors the reference's process counters, e.g.
      slogagent_process_passed_records_total{key_app="x",key_level="y",...} N
    Labelled counters get a ``label`` attribute like the reference's
      slogagent_process_labelled_records_total{...,label="redacted"} N
    """
    cfg = cfg or DEFAULT_CONFIG
    rows = metrics.collect()
    key_cols = cfg.orchestration_keys + cfg.metric_keys
    lines: list[str] = []
    for row in rows:
        keys = ",".join(f'key_{k}="{row[k]}"' for k in key_cols)
        for kind in ("passed", "dropped"):
            for unit in ("records", "bytes"):
                v = row[f"{kind}_{unit}"]
                lines.append(
                    f"slogagent_process_{kind}_{unit}_total{{{keys}}} {v}"
                )
        for label in cfg.labels:
            c = label_col(label)
            for unit in ("records", "bytes"):
                v = row[f"{c}_{unit}"]
                if v:
                    lines.append(
                        "slogagent_process_labelled_"
                        f'{unit}_total{{{keys},label="{label}"}} {v}'
                    )
    return "\n".join(sorted(lines)) + "\n"
