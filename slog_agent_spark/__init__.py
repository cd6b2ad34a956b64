"""slog_agent_spark — a PySpark-native log/transcript pipeline engine.

A from-scratch reimplementation of the *capabilities* of the reference
log agent (relex/slog-agent, read-only at /root/reference): parse →
extract → route-by-keyset → transform → serialize → sink, plus per-keyset
metric aggregation — re-expressed as declarative Spark DataFrame plans
that Catalyst/Tungsten optimize (whole-stage codegen, predicate pushdown,
partial aggregation), not as a row-at-a-time port.

Layout:
    session      SparkSession builder tuned for the pipeline
    sources/     transcript table derivation + RFC5424-style grok parser
    functions/   match-op compiler, glob→regex, string templates, redaction
    operators/   the 15-transform compiler, routing, metrics, dedup, similarity
    sinks/       fluentd-/datadog-style serializers + partitioned writers
    plans/       end-to-end pipeline assembly + checkpoint/resume manifests
    streaming/   Structured Streaming wrapper (foreachBatch over same plans)
"""

__version__ = "0.1.0"
