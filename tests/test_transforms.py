"""Transform-chain compiler: semantics fixtures + Spark/DuckDB parity.

Expected values are re-derived from the reference's transform semantics
(reference: transform/*/; see SURVEY.md §2.4), not from running it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slog_agent_spark.functions.dialect import DUCKDB, SPARK
from slog_agent_spark.operators.transforms import (
    apply_chain_spark,
    chain_oracle_subquery,
    compile_chain,
)

BASE = {"conv_id": "c1", "turn_idx": 0, "unescaped": False}


def run_chain(spark, duck, steps, schema_fields, rows):
    """Run a chain on both engines; assert identical; return spark rows."""
    full_rows = [{**BASE, **r} for r in rows]
    input_fields = set(full_rows[0].keys())
    out_cols = ["conv_id", "turn_idx"]

    results = {}
    for eng, d in (("spark", SPARK), ("duckdb", DUCKDB)):
        chain = compile_chain(d, steps, schema_fields, input_fields)
        selects = {f: f for f in schema_fields}
        selects["_dropped"] = chain.dropped_col
        for label, cond_col in chain.counters:
            safe = label.replace("!", "not_").replace("-", "_")
            selects[f"_lbl_{safe}"] = cond_col
        if chain.ts_col:
            selects["_ts"] = chain.ts_col

        if eng == "spark":
            df = spark.createDataFrame(
                [tuple(r.values()) for r in full_rows], list(full_rows[0].keys())
            )
            staged = apply_chain_spark(df, chain)
            out = staged.select(
                *out_cols, *[F.expr(e).alias(k) for k, e in selects.items()]
            )
            results[eng] = [r.asDict() for r in out.orderBy("turn_idx").collect()]
        else:
            cols = list(full_rows[0].keys())
            values = ", ".join(
                "(" + ", ".join(_duck_lit(r[c]) for c in cols) + ")"
                for r in full_rows
            )
            src = f"SELECT * FROM (VALUES {values}) AS t({', '.join(cols)})"
            staged = chain_oracle_subquery(chain, src, cols)
            sel = ", ".join(f'{e} AS "{k}"' for k, e in selects.items())
            sql = (
                f"SELECT {', '.join(out_cols)}, {sel} "
                f"FROM ({staged}) ORDER BY turn_idx"
            )
            cur = duck.execute(sql)
            names = [c[0] for c in cur.description]
            results[eng] = [dict(zip(names, row)) for row in cur.fetchall()]

    for a, b in zip(results["spark"], results["duckdb"]):
        a2 = {k: v for k, v in a.items() if k != "_ts"}
        b2 = {k: v for k, v in b.items() if k != "_ts"}
        assert a2 == b2, f"engine mismatch:\n spark: {a2}\n  duck: {b2}"
        if "_ts" in a:
            assert a["_ts"] == b["_ts"]
    return results["spark"]


def _duck_lit(v):
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    s = str(v).replace("'", "''")
    if any(ch in s for ch in "\n\t\r"):
        parts = []
        buf = ""
        for ch in s:
            if ch in "\n\t\r":
                if buf:
                    parts.append(f"'{buf}'")
                    buf = ""
                parts.append(f"chr({ord(ch)})")
            else:
                buf += ch
        if buf:
            parts.append(f"'{buf}'")
        return "(" + " || ".join(parts) + ")"
    return f"'{s}'"


def test_add_fields_template_and_skip_empty(spark, duck):
    steps = [{"type": "addFields", "fields": {"pnum": "${task[-1:]}", "svc": "x-$app"}}]
    out = run_chain(
        spark, duck, steps, ["app", "task", "pnum", "svc"],
        [
            {"app": "sshd", "task": "56789", "pnum": "old", "svc": ""},
            {"app": "sshd", "task": "", "pnum": "old", "turn_idx": 1, "svc": ""},
        ],
    )
    assert out[0]["pnum"] == "9" and out[0]["svc"] == "x-sshd"
    assert out[1]["pnum"] == "old"  # empty expansion keeps previous value


def test_del_fields(spark, duck):
    steps = [{"type": "delFields", "keys": ["facility", "pid"]}]
    out = run_chain(
        spark, duck, steps, ["facility", "pid", "log"],
        [{"facility": "kern", "pid": "123", "log": "m"}],
    )
    assert out[0]["facility"] == "" and out[0]["pid"] == "" and out[0]["log"] == "m"


def test_drop_full_and_counter(spark, duck):
    steps = [
        {
            "type": "drop",
            "match": {"source": "auth.log", "level": ("str-not", "fatal")},
            "percentage": 100,
            "metricLabel": "app-auth",
        }
    ]
    out = run_chain(
        spark, duck, steps, ["source", "level"],
        [
            {"source": "auth.log", "level": "info"},
            {"source": "auth.log", "level": "fatal", "turn_idx": 1},
            {"source": "main.log", "level": "info", "turn_idx": 2},
        ],
    )
    assert [r["_dropped"] for r in out] == [True, False, False]
    assert [r["_lbl_app_auth"] for r in out] == [True, False, False]


def test_drop_percentage_deterministic(spark, duck):
    steps = [
        {"type": "drop", "match": {"source": "main.log"}, "percentage": 50,
         "metricLabel": "ds"}
    ]
    rows = [{"source": "main.log", "turn_idx": i, "conv_id": f"c{i}"} for i in range(40)]
    out = run_chain(spark, duck, steps, ["source"], rows)
    dropped = sum(r["_dropped"] for r in out)
    retained_lbl = sum(r["_lbl_not_ds"] for r in out)
    assert 0 < dropped < 40
    assert dropped + retained_lbl == 40


def test_extract_named_groups(spark, duck):
    steps = [
        {"type": "extract", "key": "log",
         "pattern": r"^(?<verb>GET|POST) (?<path>\S+)"}
    ]
    out = run_chain(
        spark, duck, steps, ["log", "verb", "path"],
        [
            {"log": "GET /api/x rest", "verb": "", "path": ""},
            {"log": "nohit", "verb": "v0", "path": "p0", "turn_idx": 1},
        ],
    )
    assert out[0]["verb"] == "GET" and out[0]["path"] == "/api/x"
    assert out[1]["verb"] == "v0" and out[1]["path"] == "p0"  # no-op on miss


def test_extract_precheck_ignores_group_syntax(spark, duck):
    # regression: the longest-required-literal precheck must not treat
    # `?P<name>` group syntax, class bodies, or optional-group contents
    # as required literals — doing so rejects every matching row and
    # silently disables the step (round-2 ADVICE, transforms.py).
    from slog_agent_spark.operators.transforms import _required_literal

    assert _required_literal("user=(?P<username>[a-z]+)") == "user="
    assert _required_literal("x(hello)?y") is None
    assert _required_literal("(?:optional)*trail") == "trail"
    assert _required_literal("x{10,20}") is None  # {m,n} body not literal

    steps = [
        {"type": "extract", "key": "log",
         "pattern": r"user=(?P<username>[a-z]+)"}
    ]
    out = run_chain(
        spark, duck, steps, ["log", "username"],
        [
            {"log": "login user=alice ok", "username": ""},
            {"log": "no user here", "username": "keep", "turn_idx": 1},
        ],
    )
    assert out[0]["username"] == "alice"
    assert out[1]["username"] == "keep"


def test_extract_head_cut(spark, duck):
    # reference: config_sample.yml:72-76 — log='[MyClass1 ] - Initialized'
    steps = [
        {"type": "extractHead", "key": "log", "pattern": r"\[*\] - ",
         "maxLen": 100, "destKey": "class"}
    ]
    out = run_chain(
        spark, duck, steps, ["log", "class"],
        [
            {"log": "[MyClass1 ] - Initialized", "class": ""},
            {"log": "no class here", "class": "", "turn_idx": 1},
        ],
    )
    assert out[0]["class"] == "MyClass1" and out[0]["log"] == "Initialized"
    assert out[1]["log"] == "no class here" and out[1]["class"] == ""


def test_extract_tail_charset_and_star(spark, duck):
    # reference: config_sample.yml:78-88
    steps = [
        {"type": "extractTail", "key": "source", "pattern": ":[0-9a-f-]",
         "maxLen": 41, "destKey": "task"},
        {"type": "extractTail", "key": "app", "pattern": "/*",
         "maxLen": 100, "destKey": "vhost"},
    ]
    out = run_chain(
        spark, duck, steps, ["source", "app", "task", "vhost"],
        [{
            "source": "task.log:123e4567-e89b-12d3-a456-426614174000",
            "app": "appServ/foo.com", "task": "", "vhost": "",
        }],
    )
    r = out[0]
    assert r["task"] == "123e4567-e89b-12d3-a456-426614174000"
    assert r["source"] == "task.log"
    assert r["vhost"] == "foo.com" and r["app"] == "appServ"


def test_if_and_nested_addfields(spark, duck):
    # reference: config_sample.yml:100-110
    steps = [
        {"type": "if",
         "match": {"class": ("str-any", ""), "task": ("str-any", "")},
         "then": [{"type": "addFields", "fields": {"task": "$task:$class"}}]},
    ]
    out = run_chain(
        spark, duck, steps, ["class", "task"],
        [
            {"class": "C1", "task": "t1"},
            {"class": "", "task": "t2", "turn_idx": 1},
        ],
    )
    assert out[0]["task"] == "t1:C1"
    assert out[1]["task"] == "t2"


def test_switch_first_match_wins(spark, duck):
    steps = [
        {"type": "switch", "cases": [
            {"match": {"app": "appServ"},
             "then": [{"type": "addFields", "fields": {"tagv": "A"}}]},
            {"match": {"app": ("str-contain", "app")},
             "then": [{"type": "addFields", "fields": {"tagv": "B"}}]},
        ]},
    ]
    out = run_chain(
        spark, duck, steps, ["app", "tagv"],
        [
            {"app": "appServ", "tagv": ""},
            {"app": "apple", "tagv": "", "turn_idx": 1},
            {"app": "cron", "tagv": "", "turn_idx": 2},
        ],
    )
    assert [r["tagv"] for r in out] == ["A", "B", ""]


def test_map_value_default_and_empty(spark, duck):
    steps = [
        {"type": "mapValue", "key": "level",
         "mapping": {"warn": "W", "error": "E"}, "default": "other"},
    ]
    out = run_chain(
        spark, duck, steps, ["level"],
        [
            {"level": "warn"},
            {"level": "info", "turn_idx": 1},
            {"level": "", "turn_idx": 2},
        ],
    )
    assert [r["level"] for r in out] == ["W", "other", ""]


def test_parse_time_and_error_label(spark, duck):
    steps = [{"type": "parseTime", "key": "time", "errorLabel": "timeError"}]
    out = run_chain(
        spark, duck, steps, ["time"],
        [
            {"time": "2022-08-15T03:48:20Z"},
            {"time": "garbage", "turn_idx": 1},
            {"time": "", "turn_idx": 2},
            # shapes the engines' formatless parsers accept but the
            # reference's strict RFC3339 parser rejects — the shape gate
            # (dialect.RFC3339_SHAPE) must flag them as errors
            {"time": "2022-08-15 03:48:20", "turn_idx": 3},
            {"time": "2022-08-15", "turn_idx": 4},
            # ±hhmm zone (no colon): accepted by the reference's Z0700
            # layout (transform/tparsetime/rfc3339.go:48-53)
            {"time": "2022-08-15T03:48:20.866915+0300", "turn_idx": 5},
        ],
    )
    assert out[0]["_lbl_timeError"] is False and out[0]["_ts"] is not None
    assert out[1]["_lbl_timeError"] is True
    assert out[2]["_lbl_timeError"] is False  # empty is not an error
    assert out[3]["_lbl_timeError"] is True
    assert out[4]["_lbl_timeError"] is True
    assert out[5]["_lbl_timeError"] is False and out[5]["_ts"] is not None


def test_redact_email(spark, duck):
    steps = [{"type": "redactEmail", "key": "log", "metricLabel": "redacted"}]
    out = run_chain(
        spark, duck, steps, ["log"],
        [
            {"log": "userName: bar.foo@nowhere.com logged in"},
            {"log": "no emails", "turn_idx": 1},
        ],
    )
    assert out[0]["log"] == "userName: REDACTED logged in"
    assert out[0]["_lbl_redacted"] is True
    assert out[1]["_lbl_redacted"] is False


def test_replace_with_group(spark, duck):
    # reference: config_sample.yml:205-208
    steps = [
        {"type": "replace", "key": "log",
         "pattern": r'^(P(OS|U)T ".*".*params=.{5}).{3,}$',
         "replacement": "$1 ... (cut)"},
    ]
    out = run_chain(
        spark, duck, steps, ["log"],
        [{"log": 'POST "/x" params=abcde0123456789'}],
    )
    assert out[0]["log"] == 'POST "/x" params=abcde ... (cut)'


def test_truncate(spark, duck):
    steps = [{"type": "truncate", "key": "log", "maxLen": 10, "suffix": "..."}]
    out = run_chain(
        spark, duck, steps, ["log"],
        [
            {"log": "0123456789ABCDEFGH"},
            {"log": "0123456789ABC", "turn_idx": 1},  # len 13 == 10+3: keep
        ],
    )
    assert out[0]["log"] == "0123456789..."
    assert out[1]["log"] == "0123456789ABC"


def test_unescape_gated_by_flag(spark, duck):
    steps = [{"type": "unescape", "key": "log"}]
    out = run_chain(
        spark, duck, steps, ["log"],
        [
            {"log": r"line1\nline2\tend"},
            {"log": r"raw\nkept", "unescaped": True, "turn_idx": 1},
        ],
    )
    assert out[0]["log"] == "line1\nline2\tend"
    assert out[1]["log"] == r"raw\nkept"  # already-unescaped input skipped


def test_required_literal_regex_constructs():
    """(?: prefix, lookarounds and inline flags must never leak into the
    required-literal precheck (round-3 review finding: ':abcde' from
    '(?:abcde)f' silently disabled matching rows)."""
    from slog_agent_spark.functions.regexlit import required_literal

    assert required_literal("(?:abcde)f") == "abcde"
    assert required_literal("(?i)abcdef") is None          # global flags
    assert required_literal("(?i:abcdef)xyz") is None      # scoped flags
    assert required_literal("(?=look)mainpart") == "mainpart"
    assert required_literal("(?<=behind)afterpart") == "afterpart"
    assert required_literal("foo(?:bar)baz") is None       # runs don't merge


def test_required_literal_literal_brace():
    """A '{' that is not a valid quantifier is a literal char in
    RE2/DuckDB; it must not swallow following structure (round-3 ADVICE:
    'errorcode{|warn' returned 'errorcod' yet the pattern matches rows
    with only 'warn' — silent row loss via the contains() precheck)."""
    from slog_agent_spark.functions.regexlit import required_literal

    assert required_literal("errorcode{|warn") is None     # '|' is top-level
    assert required_literal("abcd{2}x") is None            # quantified 'd' dropped, runs split
    assert required_literal("abcde{xyz") == "abcde"        # literal brace: run before kept
    assert required_literal("prefix{(grouped)") == "grouped"  # brace doesn't eat the group
    assert required_literal("value{12,34}suffixpart") == "suffixpart"
    assert required_literal("x{10,20}") is None            # {m,n} body not literal
    assert required_literal("(abcd){2}other") == "other"   # quantified group discarded
    assert required_literal("(abcd){xy}") == "abcd"        # literal-brace group NOT quantified
