"""Golden-corpus parity runner: reference-authored logs through the engine.

Drives raw syslog corpora (e.g. the reference's own
``testdata/development/*-input.log``) through parse → extractions →
transformations → serializers under a config loaded by the YAML
front-end, producing per-record serialized events in input order plus
the same counter set the reference exports — so reference-authored
golden outputs (``*-output-customFluentd.json`` / ``*-output-datadogAPI
.json`` / ``all-pipeline.prom``, asserted by ref: test/pipeline_test.go:
35-79) can be compared record-by-record against this engine.

This is a parity harness, not the scale path: it preserves strict input
order (single-partition windows over a 10²-record fixture) because the
reference's percentage-drop sampler is sequential
(ref: transform/tdrop/tdrop.go:75-84). The production pipeline uses
order-free deterministic hash sampling instead (documented divergence,
operators/transforms.py module docstring).

Assumption (holds for the reference config and ours; asserted nowhere
cheaper): transforms *preceding* a percentage-drop step do not rewrite
the fields its match/guards read — drop decisions are computed on the
post-extraction snapshot.
"""

from __future__ import annotations

import copy

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dialect import SPARK
from ..functions.match import compile_match
from ..operators.transforms import apply_chain_spark, compile_chain
from ..sinks.serializers import datadog_event, fluentd_event
from ..sources.parser import parse_logs
from .yaml_config import PipelineConfig


def split_records(data: str) -> list[str]:
    """Raw corpus bytes → records. A record starts at a line whose first
    byte is '<'; continuation lines (multiline messages) stay inside the
    record (ref: test/input.go loadInputRecords — split on \\n<)."""
    records: list[str] = []
    remaining = data
    while remaining:
        nxt = remaining.find("\n<")
        if nxt >= 0:
            records.append(remaining[:nxt])
            remaining = remaining[nxt + 1:]
        else:
            records.append(remaining.removesuffix("\n"))
            break
    return records


def drop_pattern(rate: int, n: int) -> list[bool]:
    """The reference's running-ratio sampler decisions for the k-th
    matched record, k = 1..n (ref: transform/tdrop/tdrop.go:75-84)."""
    out: list[bool] = []
    matched = dropped = 0
    for _ in range(n):
        if matched > 0 and 100 * dropped // matched < rate:
            dropped += 1
            out.append(True)
        else:
            out.append(False)
        matched += 1
    return out


def _inject_drop_decisions(
    df: DataFrame, transformations: list[dict], n_records: int,
    partition_cols: list[str] | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Compute sequential decision columns for every percentage-drop step
    and return (df-with-decisions, steps-with-decisionExpr).

    ``partition_cols`` scopes the sampler state PER KEYSET — the agent
    harness runs one sequential sampler per orchestration key set
    (ref: orchestrate/obykeyset/orchestrator.go: each keyset owns its
    pipeline, hence its own tdrop state), while the pipeline harness
    runs one global sampler."""
    steps = copy.deepcopy(transformations)
    alive = "TRUE"
    jobs: list[tuple[str, str, int]] = []  # (col, matched_expr, pct)

    def _and(*parts: str) -> str:
        real = [p for p in parts if p != "TRUE"]
        return "(" + " AND ".join(real) + ")" if real else "TRUE"

    def walk(ss: list[dict], guard: str):
        nonlocal alive
        for s in ss:
            t = s.get("type")
            if t == "drop":
                m = compile_match(SPARK, s.get("match", {}))
                pct = int(s.get("percentage", 100))
                if pct >= 100:
                    alive = _and(alive, f"NOT {_and(guard, m)}")
                else:
                    col = f"_dropdec{len(jobs)}"
                    jobs.append((col, _and(guard, alive, m), pct))
                    s["decisionExpr"] = col
                    alive = _and(alive, f"NOT {_and(guard, m, col)}")
            elif t == "if":
                walk(s.get("then", []), _and(guard, compile_match(SPARK, s["match"])))
            elif t == "switch":
                priors: list[str] = []
                for case in s.get("cases", []):
                    c = compile_match(SPARK, case["match"])
                    walk(case.get("then", []),
                         _and(guard, *[f"NOT {p}" for p in priors], c))
                    priors.append(c)
            elif t == "block":
                walk(s.get("steps", []), guard)

    walk(steps, "TRUE")
    base_w = (
        Window.partitionBy(*partition_cols) if partition_cols else Window
    )
    w = base_w.orderBy("rid").rowsBetween(Window.unboundedPreceding, 0)
    for col, matched_expr, pct in jobs:
        pattern = drop_pattern(pct, max(n_records, 1))
        arr = F.array(*[F.lit(b) for b in pattern])
        m = F.expr(matched_expr)
        k = F.sum(m.cast("int")).over(w)
        df = df.withColumn(
            col, F.when(m, F.element_at(arr, k.cast("int"))).otherwise(F.lit(False))
        )
    return df, steps


def _mark_exact_redact(steps: list[dict]) -> None:
    """Switch every redactEmail step to the scanner-exact pandas UDF —
    the regex approximation over-redacts Java object refs like
    Service@3b42121d (the reference scanner requires a dotted-or-EOS
    domain, redactemail.go:120-160)."""
    for s in steps:
        t = s.get("type")
        if t == "redactEmail":
            s["exactUdf"] = True
        elif t == "if":
            _mark_exact_redact(s.get("then", []))
        elif t == "switch":
            for case in s.get("cases", []):
                _mark_exact_redact(case.get("then", []))
        elif t == "block":
            _mark_exact_redact(s.get("steps", []))


def run_corpus(
    spark: SparkSession,
    cfg: PipelineConfig,
    records: list[str],
    tag_override: str | None = None,
    keys: list[str] | None = None,
    tag_template: str | None = None,
) -> dict:
    """Run one corpus; return events (input order) + counters.

    Mirrors the reference's test pipeline (ref: test/pipeline.go:96-130):
    parse each record, run extractions + transformations, serialize for
    every output with the tag overridden to the corpus title.

    With ``keys``/``tag_template`` set it instead mirrors the AGENT
    harness (ref: test/agent_test.go:26-27 — keys overridden to
    ``[host]``, tag ``$host``): records are grouped onto the keyset,
    the percentage-drop sampler state is per keyset, the tag is the
    expanded template, process counters carry the keyset labels, and
    each returned event includes its tag for per-sink splitting.
    """
    from ..functions.redact import redact_email_udf

    spark.udf.register("redact_email_exact", redact_email_udf())

    df = spark.createDataFrame(
        list(enumerate(records)), "rid long, text string"
    )
    parsed = parse_logs(df, ["rid"], cfg.level_mapping)

    # -- input counters (ref: base/loginputcounterset.go:12-55)
    inrow = parsed.agg(
        F.sum(F.when(F.col("parse_ok"), 1).otherwise(0)).alias("passed_records"),
        F.sum(F.when(F.col("parse_ok"), F.col("raw_length")).otherwise(0)).alias("passed_bytes"),
        F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("malformed_records"),
    ).collect()[0]

    # -- extractions (run on input threads in the reference)
    input_cols = set(parsed.columns)
    ext = compile_chain(SPARK, cfg.extractions, cfg.schema_fields, input_cols)
    assert not ext.counters and ext.dropped_col == "FALSE", (
        "extraction chains with drops/counters not supported by the runner"
    )
    df1 = apply_chain_spark(parsed.where("parse_ok"), ext)
    keys = keys or []
    keep = (
        ["rid", "raw_length"]
        + cfg.schema_fields
        + [F.expr(ext.unescaped_col).alias("unescaped")]
        # metric keyset snapshot: selected BEFORE transformations
        # (ref: test/pipeline.go:118 SelectMetricKeySet)
        + [F.col(k).alias(f"_mk_{k}") for k in cfg.metric_keys]
        # orchestration keyset snapshot: the router reads the keys when
        # the record enters the orchestrator, before the per-pipeline
        # transform chain (ref: orchestrate/obykeyset/orchestrator.go)
        + [F.col(k).alias(f"_key_{k}") for k in keys]
    )
    df1 = df1.select(*keep)

    # -- sequential percentage-drop decisions, then the transform chain
    df1, steps = _inject_drop_decisions(
        df1, cfg.transformations, len(records),
        partition_cols=[f"_key_{k}" for k in keys] or None,
    )
    _mark_exact_redact(steps)
    chain = compile_chain(SPARK, steps, cfg.schema_fields, set(df1.columns))
    staged = apply_chain_spark(df1, chain)
    sel: dict[str, str] = {c: c for c in ["rid", "raw_length"]}
    for f2 in cfg.schema_fields:
        sel[f2] = f2
    for k in cfg.metric_keys:
        sel[f"_mk_{k}"] = f"_mk_{k}"
    for k in keys:
        sel[f"_key_{k}"] = f"_key_{k}"
    sel["ts"] = chain.ts_col or "CAST(NULL AS TIMESTAMP)"
    sel["unescaped"] = chain.unescaped_col
    sel["dropped"] = chain.dropped_col
    label_cols = {}
    for label, cond_col in chain.counters:
        cname = "lbl_" + str(len(label_cols))
        label_cols[label] = cname
        sel[cname] = cond_col
    final = staged.select(*[F.expr(e).alias(k) for k, e in sel.items()])
    final = final.cache()

    # -- serialized events, input order (ref: eventserializer goldens)
    if tag_template is not None:
        from ..functions.template import compile_template

        tag_lit = compile_template(
            tag_template, SPARK,
            resolver=lambda name: f"_key_{name}" if name in keys else name,
        )
    else:
        tag_lit = SPARK.lit(tag_override)
    passed = final.where("NOT dropped")
    events = (
        passed.select(
            "rid",
            F.expr(tag_lit).alias("_tag"),
            *[
                F.expr(
                    fluentd_event(SPARK, ocfg, tag_lit, cfg.schema_fields)
                    if ocfg["type"] == "fluentdForward"
                    else datadog_event(SPARK, ocfg, tag_lit, cfg.schema_fields)
                ).alias(name)
                for name, ocfg in cfg.outputs.items()
            ],
        )
        .orderBy("rid")
        .collect()
    )

    # -- process counters per (orchestration ×) metric keyset
    # (ref: base/logprocesscounterset.go)
    mk = [f"_key_{k}" for k in keys] + [f"_mk_{k}" for k in cfg.metric_keys]
    aggs = [
        F.sum(F.when(~F.col("dropped"), 1).otherwise(0)).alias("passed_records"),
        F.sum(F.when(~F.col("dropped"), F.col("raw_length")).otherwise(0)).alias("passed_bytes"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias("dropped_records"),
        F.sum(F.when(F.col("dropped"), F.col("raw_length")).otherwise(0)).alias("dropped_bytes"),
    ]
    for label, cname in label_cols.items():
        safe = cname
        aggs.append(F.sum(F.when(F.col(safe), 1).otherwise(0)).alias(f"{safe}_records"))
        aggs.append(
            F.sum(F.when(F.col(safe), F.col("raw_length")).otherwise(0)).alias(f"{safe}_bytes")
        )
    proc_rows = final.groupBy(*mk).agg(*aggs).collect()
    metrics: dict[tuple, dict] = {}
    for r in proc_rows:
        key = tuple(r[c] for c in mk)
        vals = {
            "passed_records": r["passed_records"],
            "passed_bytes": r["passed_bytes"],
            "dropped_records": r["dropped_records"],
            "dropped_bytes": r["dropped_bytes"],
        }
        for label, cname in label_cols.items():
            vals[f"labelled_records:{label}"] = r[f"{cname}_records"]
            vals[f"labelled_bytes:{label}"] = r[f"{cname}_bytes"]
        metrics[key] = vals
    final.unpersist()

    return {
        "events": events,
        "metrics": metrics,
        "metric_keys": list(keys) + list(cfg.metric_keys),
        "input": {
            "passed_records": inrow["passed_records"] or 0,
            "passed_bytes": inrow["passed_bytes"] or 0,
            "malformed_records": inrow["malformed_records"] or 0,
        },
    }


def parse_prom(text: str, prefix: str = "testpipeline_") -> dict:
    """Parse a Prometheus exposition dump into {(name, labels): value}."""
    out: dict[tuple, float] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        name_part, _, value = line.rpartition(" ")
        if "{" in name_part:
            name, _, rest = name_part.partition("{")
            labels = tuple(
                tuple(kv.split("=", 1)) for kv in rest.rstrip("}").split(",") if kv
            )
            labels = tuple(sorted((k, v.strip('"')) for k, v in labels))
        else:
            name, labels = name_part, ()
        if name.startswith(prefix):
            name = name[len(prefix):]
        out[(name, labels)] = float(value)
    return out
