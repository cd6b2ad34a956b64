"""Grok/regex parse stage: transcript ``text`` → structured log fields.

Re-expresses the reference's RFC5424 syslog parser
(reference: input/syslogparser/syslogparser.go:105-178) as declarative
Spark column expressions fused by whole-stage codegen. The reference
deliberately avoids regex in the hot path (hand-rolled scanners); we
mirror that: ONE validity regex per row, then ``split_part`` token
extraction and pure length arithmetic for the body — no per-field regex,
no Python.

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transcripts import FACILITIES, ROLES

# One validity regex (RE2 ∩ Java subset), shared with the DuckDB oracle.
HEADER_RE = r"^<(\d{1,3})>1 \S+ \S+ \S+ \S+ \S+ - "

PARSED_FIELDS = [
    "facility", "level", "time", "host", "app", "pid", "source",
    "extradata", "log",
]

# token index (1-based, space-separated) → field
_TOKENS = {"time": 2, "host": 3, "app": 4, "pid": 5, "source": 6}


def parse_transcripts(df: DataFrame) -> DataFrame:
    """Parse the header out of ``text`` into the reference's field set."""
    # startswith precheck short-circuits the validity regex (codegen AND)
    ok = F.col("text").startswith("<") & F.col("text").rlike(HEADER_RE)
    tok = {k: F.split_part(F.col("text"), F.lit(" "), F.lit(i)) for k, i in _TOKENS.items()}
    t1 = F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    pri = t1.substr(F.lit(2), F.length(t1) - F.lit(3)).cast("int")
    # body offset: 6 tokens + 6 spaces + "- " (2 chars)
    hdr_len = (
        F.length(t1) + sum(F.length(tok[k]) for k in _TOKENS) + F.lit(8)
    )
    body = F.col("text").substr(hdr_len + 1, F.length("text"))
    roles_arr = F.array(*[F.lit(s) for s in ROLES])
    fac_arr = F.array(*[F.lit(s) for s in FACILITIES])
    return df.select(
        "conv_id", "turn_idx", "role", "tool", "ts",
        ok.alias("parse_ok"),
        F.when(ok, F.element_at(fac_arr, (pri / 8).cast("int") + 1))
        .otherwise(F.lit("")).alias("facility"),
        F.when(ok, F.element_at(roles_arr, F.pmod(pri, F.lit(8)) + 1))
        .otherwise(F.lit("")).alias("level"),
        F.when(ok, tok["time"]).otherwise(F.lit("")).alias("time"),
        F.when(ok, tok["host"]).otherwise(F.lit("")).alias("host"),
        F.when(ok, tok["app"]).otherwise(F.lit("")).alias("app"),
        F.when(ok, tok["pid"]).otherwise(F.lit("")).alias("pid"),
        F.when(ok, tok["source"]).otherwise(F.lit("")).alias("source"),
        F.lit("").alias("extradata"),
        F.when(ok, body).otherwise(F.col("text")).alias("log"),
        F.col("text").contains("\n").alias("unescaped"),
        F.octet_length("text").alias("raw_length"),
    )


def parse_oracle_select(transcripts_rel: str = "transcripts") -> str:
    """DuckDB SELECT mirroring :func:`parse_transcripts` (for oracles)."""
    fac = ", ".join(f"'{s}'" for s in FACILITIES)
    lvl = ", ".join(f"'{s}'" for s in ROLES)
    re = HEADER_RE
    toks = {k: f"split_part(text, ' ', {i})" for k, i in _TOKENS.items()}
    t1 = "split_part(text, ' ', 1)"
    pri = f"CAST(substr({t1}, 2, length({t1}) - 3) AS INT)"
    hdr_len = (
        f"length({t1}) + "
        + " + ".join(f"length({toks[k]})" for k in _TOKENS)
        + " + 8"
    )
    ok = f"(starts_with(text, '<') AND regexp_matches(text, '{re}'))"
    return f"""
    SELECT conv_id, turn_idx, role, tool, ts,
      {ok} AS parse_ok,
      CASE WHEN {ok} THEN [{fac}][({pri}) // 8 + 1] ELSE '' END AS facility,
      CASE WHEN {ok} THEN [{lvl}][({pri}) % 8 + 1] ELSE '' END AS level,
      CASE WHEN {ok} THEN {toks['time']} ELSE '' END AS time,
      CASE WHEN {ok} THEN {toks['host']} ELSE '' END AS host,
      CASE WHEN {ok} THEN {toks['app']} ELSE '' END AS app,
      CASE WHEN {ok} THEN {toks['pid']} ELSE '' END AS pid,
      CASE WHEN {ok} THEN {toks['source']} ELSE '' END AS source,
      '' AS extradata,
      CASE WHEN {ok} THEN substr(text, ({hdr_len}) + 1) ELSE text END AS log,
      contains(text, chr(10)) AS unescaped,
      octet_length(encode(text)) AS raw_length
    FROM {transcripts_rel}
    """
