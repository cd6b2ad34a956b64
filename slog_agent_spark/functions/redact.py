"""Scanner-exact email redaction (vectorized pandas UDF).

The production pipeline uses the JVM regex path
(operators/transforms.py REDACT_EMAIL_RE) — fastest, fully codegen'd.
This module provides the byte-exact port of the reference's single-pass
scanner semantics (reference: transform/tredactemail/redactemail.go:32-173)
for when exact parity with the Go agent matters:

- local/domain chars: [A-Za-z0-9._-]; a word char (alnum) required on
  both sides of '@'
- '/'-prefixed locals rejected (paths)
- all-numeric domains rejected (e.g. Trx@123456.)
- truncated domains redacted to end-of-string (foo@google, foo@google.)
- domain scan aborts on the first invalid char before any dot

Exposed as an Arrow-batched pandas UDF: the '@'-containment prefilter is
vectorized (pandas str op); only matching rows run the scanner.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

_ADDR = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789._-"
)
_WORD = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789")


def _all_numeric(s: str) -> bool:
    # reference: redactEmailCheckNumber — first and last chars are digits
    # and length >= 2 (dots/dashes between digits still count as numeric)
    return len(s) >= 2 and s[0].isdigit() and s[-1].isdigit()


def _email_start(src: str, at: int, limit: int) -> int:
    i = at - 1
    while i >= limit and src[i] in _ADDR:
        i -= 1
    if i >= 0 and src[i] == "/":
        return -1
    return i + 1


def _email_end(src: str, at: int) -> int:
    dot = -1
    i = at + 1
    while i < len(src):
        c = src[i]
        if c not in _ADDR:
            return -1
        if c == ".":
            dot = i
            break
        i += 1
    if dot == -1:
        # ran to end-of-string: truncated domain like foo@google
        return -1 if _all_numeric(src[at + 1 :]) else len(src)
    if dot == len(src) - 1:
        return len(src)  # foo@google.
    if src[dot + 1] not in _WORD:
        return -1  # e.g. Trx@123456./
    end = dot + 2
    while end < len(src) and src[end] in _ADDR:
        end += 1
    if _all_numeric(src[at + 1 : end]):
        return -1
    return end


def redact_email_exact(src: str) -> str:
    """Single-pass scan; the semantics twin of the reference's Go code."""
    if "@" not in src:
        return src
    out: list[str] = []
    copied = 0
    s_end = len(src) - 1
    at = src.find("@")
    if at == 0:  # '@' at position 0 can't form an email; try the next one
        at = src.find("@", 1)
    # … nor can one at the last index (reference: redactemail.go:43
    # "ignore src[0] and src[len-1]")
    while 0 < at < s_end:
        if src[at - 1] in _WORD and src[at + 1] in _WORD:
            start = _email_start(src, at, copied)
            end = _email_end(src, at) if start != -1 else -1
            if start != -1 and end != -1:
                out.append(src[copied:start])
                out.append("REDACTED")
                copied = end
                at = end
            else:
                at += 1
        else:
            at += 1
        nxt = src.find("@", at)
        if nxt == -1:
            break
        at = nxt
    out.append(src[copied:])
    return "".join(out)


def redact_email_udf():
    """Build the Arrow-batched UDF (lazy: needs an active SparkSession)."""

    @pandas_udf("string")
    def _redact(s: pd.Series) -> pd.Series:
        # vectorized prefilter: rows without '@' pass through untouched
        mask = s.str.contains("@", regex=False, na=False)
        out = s.copy()
        out[mask] = s[mask].map(redact_email_exact)
        return out

    return _redact
