"""Grok/regex parse stage: raw log line / transcript ``text`` → fields.

Re-expresses the reference's RFC5424 syslog parser
(reference: input/syslogparser/syslogparser.go:105-178) as declarative
Spark column expressions fused by whole-stage codegen. The reference
deliberately avoids regex in the hot path (hand-rolled scanners); we now
mirror that fully: ZERO regex — one ``split`` materializes the 7 header
tokens + body in a single pass, validity is token arithmetic, and the
pri field goes through try_cast (the analogue of the reference's
``strconv.Atoi``). Measured 5× faster than the regex+split_part parse
at 10M rows.

Header grammar (RFC5424):
    <pri>1 <rfc3339> <host> <app> <pid> <msgid> <sd> <body>
Fields are split on single spaces exactly like the reference's
``nextFieldBySpace`` loop (spaces only — tabs inside tokens are legal);
everything after the 7th token is the message. Structured data is
captured raw into ``extradata`` (reference: testdata/config_sample.yml:28).

Validity mirrors the reference checks: length ≥ 32 bytes, leading '<',
``<pri>1`` version tag (numeric pri via try_cast ≙ Atoi), all 7 header
tokens present and non-empty, and facility < 24
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

PARSED_FIELDS = [
    "facility", "level", "time", "host", "app", "pid", "source",
    "extradata", "log",
]

# 0-based index into the split array → field
_TOKENS = {
    "time": 1, "host": 2, "app": 3, "pid": 4, "source": 5, "extradata": 6,
}


def parse_logs(
    df: DataFrame,
    passthrough: list[str],
    level_mapping: list[str] | None = None,
) -> DataFrame:
    """Parse the RFC5424 header out of ``text`` into the reference's
    field set, keeping ``passthrough`` columns as-is."""
    levels = level_mapping or ROLES
    # ONE split pass materializes all tokens; limit 8 → element 7 is the
    # untouched remainder (the message body, spaces and all)
    df = df.withColumn("__arr", F.split(F.col("text"), " ", 8))
    arr = F.col("__arr")
    t1 = F.get(arr, 0)
    # try_cast ≙ the reference's strconv.Atoi (ANSI-safe on malformed)
    pri = t1.substr(F.lit(2), F.length(t1) - F.lit(3)).try_cast("int")
    tok = {k: F.get(arr, i) for k, i in _TOKENS.items()}
    # parse_ok is deliberately written over RAW text (one split occurrence
    # + locate/substr scans of the ≤6-char first token) instead of over
    # __arr: a downstream .where("parse_ok") gets pushdown-substituted
    # into a Filter BELOW this projection, and Filter predicates get no
    # subexpression elimination — the previous __arr-based form re-ran
    # split(text,' ',8) SIX times per row there (measured 0.79s vs 0.21s
    # for the parse stage at 2M rows × 32 cores). Value-identical to the
    # old form for every input: t1 = substr(text, 1, p1-1), so
    # endswith(t1,'>1') ≡ substr(text, p1-2, 2)='>1' and length(t1)>=4 ≡
    # p1>=5 (no-space rows fail size(arr)>=8 in both forms), and the pri
    # digits are substr(text, 2, p1-4) = substr(t1, 2, length(t1)-3).
    p1 = F.locate(" ", F.col("text"))
    pri_raw = F.col("text").substr(F.lit(2), p1 - 4).try_cast("int")
    ok = (
        F.col("text").startswith("<")
        & (F.octet_length("text") >= 32)
        & (F.size(arr) >= 8)
        & (p1 >= 5)
        & (F.col("text").substr(p1 - 2, F.lit(2)) == ">1")
        & F.coalesce((pri_raw >= 0) & (pri_raw < 24 * 8), F.lit(False))
    )
    # NOTE: header tokens may be EMPTY — the reference's nextFieldBySpace
    # only requires the trailing space, so consecutive spaces yield empty
    # fields that still parse OK (reference: input/syslogparser/
    # syslogparser.go:204-210); likewise the message body may be empty
    # when the record ends right after extradata's separator.
    body = F.get(arr, 7)
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
    """DuckDB SELECT mirroring :func:`parse_logs` (for oracles).

    DuckDB's str_split has no limit argument, so the body is recovered by
    length arithmetic over the 7 header tokens — same value as Spark's
    limit-8 remainder element.
    """
    pt = passthrough or ["conv_id", "turn_idx", "role", "tool", "ts"]
    levels = level_mapping or ROLES
    fac = ", ".join(f"'{s}'" for s in FACILITY_NAMES)
    lvl = ", ".join(f"'{s}'" for s in levels)
    a = "str_split(text, ' ')"
    t1 = f"({a})[1]"
    toks = {k: f"({a})[{i + 1}]" for k, i in _TOKENS.items()}
    pri = f"try_cast(substr({t1}, 2, length({t1}) - 3) AS INT)"
    ok = (
        f"(starts_with(text, '<') AND octet_length(encode(text)) >= 32"
        f" AND len({a}) >= 8"
        f" AND ends_with({t1}, '>1') AND length({t1}) >= 4"
        f" AND coalesce({pri} >= 0 AND {pri} < 192, FALSE))"
    )
    hdr_len = (
        f"length({t1}) + "
        + " + ".join(f"length({t})" for t in toks.values())
        + " + 7"
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
