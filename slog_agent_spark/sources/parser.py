"""Grok/regex parse stage: transcript ``text`` → structured log fields.

Re-expresses the reference's RFC5424 syslog parser
(reference: input/syslogparser/syslogparser.go:105-178) as declarative
Spark column expressions — one regexp per field, all JVM-side and fused
by whole-stage codegen. No Python in the hot path.

Header grammar (as produced by sources/transcripts.py):
    <pri>1 <rfc3339> <host> <app>/<vhost> <pid> <source> - <body>

Output schema mirrors the reference's required syslog fields
(reference: testdata/config_sample.yml:20-29):
    facility, level, time, host, app, pid, source, extradata, log
plus the passthrough transcript keys (conv_id, turn_idx, role, tool, ts),
``unescaped`` (true when the body holds a real newline — multiline input,
reference: input/syslogparser/syslogparser.go:173-174) and ``raw_length``
(input byte length for byte metrics, reference: base/logrecord.go:12).

Malformed lines (no parsable header) are *not* silently dropped: they are
flagged via ``parse_ok = false`` so the caller can count them (the
reference logs-and-skips; we filter + count, mirroring its input
counters at base/loginputcounterset.go:12-55).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .transcripts import FACILITIES, ROLES

# One regex, shared verbatim with the DuckDB oracle (RE2 ∩ Java subset:
# no lookarounds, no backrefs). Group order: pri, time, host, app, pid,
# source. The body is everything after " - " (stripped via regexp_replace
# so real newlines in multiline bodies survive).
HEADER_RE = r"^<(\d{1,3})>1 (\S+) (\S+) (\S+) (\S+) (\S+) - "

PARSED_FIELDS = [
    "facility", "level", "time", "host", "app", "pid", "source",
    "extradata", "log",
]


def _pool_lookup(pool: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(s) for s in pool]), idx + 1)


def parse_transcripts(df: DataFrame) -> DataFrame:
    """Parse the header out of ``text`` into the reference's field set."""
    pri = F.regexp_extract("text", HEADER_RE, 1)
    parse_ok = F.col("text").rlike(HEADER_RE)
    log_body = F.regexp_replace("text", HEADER_RE, "")
    pri_i = pri.cast("int")
    return df.select(
        "conv_id", "turn_idx", "role", "tool", "ts",
        parse_ok.alias("parse_ok"),
        F.when(parse_ok, _pool_lookup(FACILITIES, (pri_i / 8).cast("int")))
        .otherwise(F.lit("")).alias("facility"),
        F.when(parse_ok, _pool_lookup(ROLES, F.pmod(pri_i, F.lit(8))))
        .otherwise(F.lit("")).alias("level"),
        F.when(parse_ok, F.regexp_extract("text", HEADER_RE, 2))
        .otherwise(F.lit("")).alias("time"),
        F.when(parse_ok, F.regexp_extract("text", HEADER_RE, 3))
        .otherwise(F.lit("")).alias("host"),
        F.when(parse_ok, F.regexp_extract("text", HEADER_RE, 4))
        .otherwise(F.lit("")).alias("app"),
        F.when(parse_ok, F.regexp_extract("text", HEADER_RE, 5))
        .otherwise(F.lit("")).alias("pid"),
        F.when(parse_ok, F.regexp_extract("text", HEADER_RE, 6))
        .otherwise(F.lit("")).alias("source"),
        F.lit("").alias("extradata"),
        F.when(parse_ok, log_body).otherwise(F.col("text")).alias("log"),
        F.col("text").contains("\n").alias("unescaped"),
        F.octet_length("text").alias("raw_length"),
    )


def parse_oracle_select(transcripts_rel: str = "transcripts") -> str:
    """DuckDB SELECT mirroring :func:`parse_transcripts` (for oracles)."""
    fac = ", ".join(f"'{s}'" for s in FACILITIES)
    lvl = ", ".join(f"'{s}'" for s in ROLES)
    # DuckDB regexp_extract group syntax matches; CAST('' AS INT) would
    # error, so guard with parse_ok CASE like the Spark side.
    re = HEADER_RE.replace("'", "''")
    return f"""
    SELECT conv_id, turn_idx, role, tool, ts,
      regexp_matches(text, '{re}') AS parse_ok,
      CASE WHEN regexp_matches(text, '{re}')
           THEN [{fac}][CAST(regexp_extract(text, '{re}', 1) AS INT) // 8 + 1]
           ELSE '' END AS facility,
      CASE WHEN regexp_matches(text, '{re}')
           THEN [{lvl}][CAST(regexp_extract(text, '{re}', 1) AS INT) % 8 + 1]
           ELSE '' END AS level,
      CASE WHEN regexp_matches(text, '{re}') THEN regexp_extract(text, '{re}', 2) ELSE '' END AS time,
      CASE WHEN regexp_matches(text, '{re}') THEN regexp_extract(text, '{re}', 3) ELSE '' END AS host,
      CASE WHEN regexp_matches(text, '{re}') THEN regexp_extract(text, '{re}', 4) ELSE '' END AS app,
      CASE WHEN regexp_matches(text, '{re}') THEN regexp_extract(text, '{re}', 5) ELSE '' END AS pid,
      CASE WHEN regexp_matches(text, '{re}') THEN regexp_extract(text, '{re}', 6) ELSE '' END AS source,
      '' AS extradata,
      CASE WHEN regexp_matches(text, '{re}') THEN regexp_replace(text, '{re}', '') ELSE text END AS log,
      contains(text, chr(10)) AS unescaped,
      octet_length(encode(text)) AS raw_length
    FROM {transcripts_rel}
    """
