"""Grok/regex parse stage: raw log line / transcript ``text`` → fields.

Re-expresses the reference's RFC5424 syslog parser
(reference: input/syslogparser/syslogparser.go:105-178) as declarative
Spark column expressions fused by whole-stage codegen. The reference
deliberately avoids regex in the hot path (hand-rolled scanners); we
mirror that: ONE validity regex per row, then ``split_part`` token
extraction and pure length arithmetic for the body — no per-field regex,
no Python.

Header grammar (RFC5424):
    <pri>1 <rfc3339> <host> <app> <pid> <msgid> <sd> <body>
Fields after pri are taken as space-separated tokens exactly like the
reference's ``nextFieldBySpace`` loop; everything after the 7th token is
the message. Structured data is captured raw into ``extradata``
(reference: testdata/config_sample.yml:28 "raw metadata value, unparsed").

Validity mirrors the reference checks: length ≥ 32 bytes, leading '<',
``<pri>1`` version tag, all 7 header tokens present, and facility < 24
(reference: syslogparser.go:111-140). Severity → level via the
configurable ``levelMapping`` (reference: config_sample.yml:62).

Malformed lines are *not* silently dropped: ``parse_ok = false`` so the
caller can count them (reference logs-and-skips; we filter + count,
mirroring its input counters at base/loginputcounterset.go:12-55).
``unescaped`` is true when the body holds a real newline (multiline
input, reference: syslogparser.go:173-174); ``raw_length`` is the input
byte length (reference: base/logrecord.go:12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transcripts import ROLES

# Facility numbers → names (reference: input/syslogprotocol/
# syslogprotocol.go:17-42). 24 entries; pri // 8 must be < 24.
FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "audit", "alert", "clock",
    "local0", "local1", "local2", "local3", "local4", "local5", "local6",
    "local7",
]

# One validity regex (RE2 ∩ Java subset), shared with the DuckDB oracle:
# "<pri>1" + 6 space-separated header tokens, then space-or-end.
HEADER_RE = r"^<(\d{1,3})>1 (\S+ ){5}\S+( |$)"

PARSED_FIELDS = [
    "facility", "level", "time", "host", "app", "pid", "source",
    "extradata", "log",
]

# token index (1-based, space-separated) → field
_TOKENS = {
    "time": 2, "host": 3, "app": 4, "pid": 5, "source": 6, "extradata": 7,
}


def parse_logs(
    df: DataFrame,
    passthrough: list[str],
    level_mapping: list[str] | None = None,
) -> DataFrame:
    """Parse the RFC5424 header out of ``text`` into the reference's
    field set, keeping ``passthrough`` columns as-is."""
    levels = level_mapping or ROLES
    # startswith precheck short-circuits the validity regex (codegen AND)
    tok = {
        k: F.split_part(F.col("text"), F.lit(" "), F.lit(i))
        for k, i in _TOKENS.items()
    }
    t1 = F.split_part(F.col("text"), F.lit(" "), F.lit(1))
    # try_cast: malformed rows reach this expression too (ANSI-safe)
    pri = t1.substr(F.lit(2), F.length(t1) - F.lit(3)).try_cast("int")
    ok = (
        F.col("text").startswith("<")
        & (F.octet_length("text") >= 32)
        & F.col("text").rlike(HEADER_RE)
        & (pri < 24 * 8)
    )
    # body offset: 7 tokens + 7 separating spaces
    hdr_len = (
        F.length(t1) + sum(F.length(tok[k]) for k in _TOKENS) + F.lit(7)
    )
    body = F.col("text").substr(hdr_len + 1, F.length("text"))
    roles_arr = F.array(*[F.lit(s) for s in levels])
    fac_arr = F.array(*[F.lit(s) for s in FACILITY_NAMES])
    return df.select(
        *passthrough,
        ok.alias("parse_ok"),
        F.when(ok, F.element_at(fac_arr, (pri / 8).cast("int") + 1))
        .otherwise(F.lit("")).alias("facility"),
        F.when(ok, F.element_at(roles_arr, F.pmod(pri, F.lit(8)) + 1))
        .otherwise(F.lit("")).alias("level"),
        *[
            F.when(ok, tok[k]).otherwise(F.lit("")).alias(k)
            for k in ("time", "host", "app", "pid", "source", "extradata")
        ],
        F.when(ok, body).otherwise(F.col("text")).alias("log"),
        F.when(ok, body).otherwise(F.col("text")).contains("\n")
        .alias("unescaped"),
        F.octet_length("text").alias("raw_length"),
    )


def parse_transcripts(df: DataFrame) -> DataFrame:
    """Parse transcript rows (text + conversation keys) — the flagship
    input path."""
    return parse_logs(df, ["conv_id", "turn_idx", "role", "tool", "ts"])


def parse_oracle_select(
    transcripts_rel: str = "transcripts",
    passthrough: list[str] | None = None,
    level_mapping: list[str] | None = None,
) -> str:
    """DuckDB SELECT mirroring :func:`parse_logs` (for oracles)."""
    pt = passthrough or ["conv_id", "turn_idx", "role", "tool", "ts"]
    levels = level_mapping or ROLES
    fac = ", ".join(f"'{s}'" for s in FACILITY_NAMES)
    lvl = ", ".join(f"'{s}'" for s in levels)
    re = HEADER_RE
    toks = {k: f"split_part(text, ' ', {i})" for k, i in _TOKENS.items()}
    t1 = "split_part(text, ' ', 1)"
    pri = f"try_cast(substr({t1}, 2, length({t1}) - 3) AS INT)"
    hdr_len = (
        f"length({t1}) + "
        + " + ".join(f"length({toks[k]})" for k in _TOKENS)
        + " + 7"
    )
    ok = (
        f"(starts_with(text, '<') AND octet_length(encode(text)) >= 32"
        f" AND regexp_matches(text, '{re}')"
        f" AND try_cast(substr({t1}, 2, length({t1}) - 3) AS INT) < 192)"
    )
    tok_cols = ",\n      ".join(
        f"CASE WHEN {ok} THEN {toks[k]} ELSE '' END AS {k}"
        for k in ("time", "host", "app", "pid", "source", "extradata")
    )
    return f"""
    SELECT {', '.join(pt)},
      {ok} AS parse_ok,
      CASE WHEN {ok} THEN [{fac}][({pri}) // 8 + 1] ELSE '' END AS facility,
      CASE WHEN {ok} THEN [{lvl}][({pri}) % 8 + 1] ELSE '' END AS level,
      {tok_cols},
      CASE WHEN {ok} THEN substr(text, ({hdr_len}) + 1) ELSE text END AS log,
      contains(CASE WHEN {ok} THEN substr(text, ({hdr_len}) + 1) ELSE text END, chr(10)) AS unescaped,
      octet_length(encode(text)) AS raw_length
    FROM {transcripts_rel}
    """
