"""Unit tests for the glob / template / match compilers.

Fixture cases are re-expressed from the reference's Go test tables
(reference: util/stringtemplate/stringtemplate_test.go,
base/bmatch/valuematch_test.go) and evaluated on BOTH engines so the
dialect emitter itself is under test.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from slog_agent_spark.functions.dialect import DUCKDB, SPARK
from slog_agent_spark.functions.glob import glob_to_regex
from slog_agent_spark.functions.match import compile_match, compile_value_match
from slog_agent_spark.functions.template import compile_template, template_fields


def eval_both(spark, duck, build_expr, fields: dict[str, str]):
    """Evaluate an expression over one row on both engines; assert equal."""
    s_expr = build_expr(SPARK)
    d_expr = build_expr(DUCKDB)
    row = spark.createDataFrame([tuple(fields.values())], list(fields.keys()))
    s_val = row.select(F.expr(s_expr).alias("v")).first()["v"]
    cols = ", ".join(f"'{v}' AS {k}" for k, v in fields.items())
    d_val = duck.execute(f"SELECT {d_expr} AS v FROM (SELECT {cols})").fetchone()[0]
    assert s_val == d_val, f"engines differ: spark={s_val!r} duck={d_val!r}"
    return s_val


TEMPLATE_CASES = [
    # (template, fields, expected) — reference: stringtemplate_test.go
    ("mytag-$appname:${msgid}-route0",
     {"appname": "TestParser", "msgid": "10"}, "mytag-TestParser:10-route0"),
    ("mytag-${appname[1:-6]}-", {"appname": "TestParser"}, "mytag-est-"),
    ("mytag-${appname[:3]}-", {"appname": "ID"}, "mytag-ID-"),
    ("${key1[-2:]}", {"key1": "foo"}, "oo"),
    # slicing clamp semantics — reference: stringtemplate.go:133-182
    ("${v[-5:]}", {"v": "abc"}, "abc"),
    ("${v[:-5]}", {"v": "abc"}, ""),
    ("${v[2:1]}", {"v": "abc"}, ""),
    ("${v[1:100]}", {"v": "abc"}, "bc"),
    ("${v[3:]}", {"v": "abc"}, ""),
    ("${task[-1:]}", {"task": "56789"}, "9"),
    ("${task[-3:-1]}", {"task": "56789"}, "78"),
    ("no-vars-at-all", {"v": "x"}, "no-vars-at-all"),
    ("$v", {"v": ""}, ""),
]


@pytest.mark.parametrize("template,fields,expected", TEMPLATE_CASES)
def test_template(spark, duck, template, fields, expected):
    got = eval_both(spark, duck, lambda d: compile_template(template, d), fields)
    assert got == expected


def test_template_error():
    with pytest.raises(ValueError):
        compile_template("hello-${field", SPARK)


def test_template_fields():
    assert template_fields("a-$x-${y[1:2]}-$z") == ["x", "y", "z"]


GLOB_CASES = [
    ("P[OU][ST]** params=**", "POST \"/x\" params=abc", True),
    ("P[OU][ST]** params=**", "PUT 1 params=", True),
    ("P[OU][ST]** params=**", "GET /x params=abc", False),
    ("api.*.{com,net}", "api.foo.com", True),
    ("api.*.{com,net}", "api.foo.org", False),
    ("*", "anything", True),
    ("a?c", "abc", True),
    ("a?c", "ac", False),
    ("[!a-z]x", "Zx", True),
    ("[!a-z]x", "zx", False),
]


@pytest.mark.parametrize("pattern,value,expected", GLOB_CASES)
def test_glob(spark, duck, pattern, value, expected):
    got = eval_both(
        spark, duck,
        lambda d: d.rlike("v", glob_to_regex(pattern)),
        {"v": value},
    )
    assert bool(got) == expected


MATCH_CASES = [
    # (op, arg, value, expected) — reference: base/bmatch/valuematch.go
    ("str-eq", "kern", "kern", True),
    ("str-eq", "kern", "kern2", False),
    ("str-not", "fatal", "warn", True),
    ("str-not", "fatal", "fatal", False),
    ("str-any", "", "x", True),
    ("str-any", "", "", False),
    ("str-start", "2020/", "2020/01/01", True),
    ("str-start", "2020/", "x2020/", False),
    ("str-end", ".com", "foo.com", True),
    ("str-end", ".com", "foo.org", False),
    ("str-contain", "server", "appserver1", True),
    ("str-contain", "server", "apps", False),
    ("regex", r"^(P(OS|U)T)\s", "POST x", True),
    ("regex", r"^(P(OS|U)T)\s", "GET x", False),
    ("len-gt", "5", "123456", True),
    ("len-gt", "5", "12345", False),
    ("len-lt", "2", "1", True),
    ("len-lt", "2", "12", False),
]


@pytest.mark.parametrize("op,arg,value,expected", MATCH_CASES)
def test_value_match(spark, duck, op, arg, value, expected):
    got = eval_both(
        spark, duck, lambda d: compile_value_match(d, "v", op, arg), {"v": value}
    )
    assert bool(got) == expected


def test_match_and_semantics(spark, duck):
    cond = {"facility": "kern", "level": ("str-not", "notice"), "task": ("str-any", "")}
    fields = {"facility": "kern", "level": "warn", "task": "t1"}
    assert eval_both(spark, duck, lambda d: compile_match(d, cond), fields)
    fields["level"] = "notice"
    assert not eval_both(spark, duck, lambda d: compile_match(d, cond), fields)


DIALECT_HELPER_CASES = [
    # (builder over dialect d, fields, expected)
    (lambda d: d.locate("] - ", "log"), {"log": "[C] - x"}, 3),
    (lambda d: d.locate("zz", "log"), {"log": "[C] - x"}, 0),
    (lambda d: d.locate_from("-", "log", "3"), {"log": "a-b-c"}, 4),
    (lambda d: d.locate_from("-", "log", "5"), {"log": "a-b-c"}, 0),
    (lambda d: d.rtrim_chars("s", "0123456789abcdef-"),
     {"s": "cron.log:123e4-a"}, "cron.log:"),
    (lambda d: d.rtrim_chars("s", "xy"), {"s": "abc"}, "abc"),
    (lambda d: d.hex_digit("substr(s, 1, 1)"), {"s": "f0"}, 15),
    (lambda d: d.bit_count(d.xor("CAST(5 AS BIGINT)", "CAST(3 AS BIGINT)")),
     {"s": "x"}, 2),
]


@pytest.mark.parametrize("builder,fields,expected", DIALECT_HELPER_CASES)
def test_dialect_helpers_dual_engine(spark, duck, builder, fields, expected):
    """locate/rtrim/hex/xor helpers power the regex-free extract paths —
    both engines must agree exactly (values compared as strings/ints)."""
    got = eval_both(spark, duck, builder, fields)
    assert got == expected


# ---------------------------------------------------------------------------
# glob predicate compilation (regex-free path) — equivalence vs the
# regex translation, DuckDB-evaluated (same generator emits both dialects)
# ---------------------------------------------------------------------------

def _glob_agree(duck, pattern: str, values: list[str]):
    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.functions.glob import glob_to_predicate, glob_to_regex

    pred = glob_to_predicate(DUCKDB, "col", pattern)
    assert pred is not None, f"expected predicate compilation for {pattern!r}"
    regex = glob_to_regex(pattern)
    for v in values:
        lit = v.replace("'", "''")
        got, want = duck.execute(
            f"SELECT {pred}, regexp_matches(col, '{regex}') "
            f"FROM (VALUES ('{lit}')) t(col)"
        ).fetchone()
        assert bool(got) == bool(want), (pattern, v, got, want)


def test_glob_predicate_flagship_shape(duck):
    _glob_agree(duck, "P[OU][ST]** params=**", [
        "POST /submit params=x", "PUT / params=", "POST /submit",
        "GET / params=x", "params= POST", "PO", "POSTparams=",
        "PXST params=y", "POST params=", " params=POST x",
    ])


def test_glob_predicate_shapes(duck):
    _glob_agree(duck, "task.log:*", ["task.log:abc", "task.log", "x task.log:y"])
    _glob_agree(duck, "*@example.com", ["a@example.com", "@example.comX", ""])
    _glob_agree(duck, "*error*", ["an error here", "ERROR", "err or"])
    _glob_agree(duck, "a*b*c", ["abc", "aXbYc", "acb", "a b c", "ac", "abcb"])
    _glob_agree(duck, "ab*bc", ["abbc", "abc", "abXbc", "ababc"])
    _glob_agree(duck, "???", ["abc", "ab", "abcd"])
    _glob_agree(duck, "?x[0-9]", ["ax1", "ax", "xx0", "axa"])
    _glob_agree(duck, "pre?mid*[af]", ["preXmidZZa", "preXmid", "premidf"])


def test_glob_predicate_falls_back_when_needed():
    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.functions.glob import glob_to_predicate

    assert glob_to_predicate(DUCKDB, "c", "{a,b}x") is None      # alternation
    assert glob_to_predicate(DUCKDB, "c", "[!abc]x") is None     # negation
    assert glob_to_predicate(DUCKDB, "c", "x*[ab]y*z") is None   # floating class


def test_glob_predicate_property(duck):
    """Randomized equivalence: predicate == regex on strings derived
    from the pattern's own alphabet (dense positive/near-miss cases)."""
    import random

    from slog_agent_spark.functions.dialect import DUCKDB
    from slog_agent_spark.functions.glob import glob_to_predicate

    rng = random.Random(42)
    parts = ["ab", "c", "*", "?", "[ab]", "*", "xy", "q"]
    for _ in range(80):
        n = rng.randint(1, 5)
        pattern = "".join(rng.choice(parts) for _ in range(n))
        if glob_to_predicate(DUCKDB, "col", pattern) is None:
            continue
        alphabet = "abcxyq"
        values = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
            for _ in range(12)
        ]
        _glob_agree(duck, pattern, values)


def test_regexp_count_null_parity(spark, duck):
    """NULL input counts 0 on BOTH engines (round-4 ADVICE: Spark's
    size(regexp_extract_all(NULL, ...)) and DuckDB's len(...) disagree
    on NULL — which would break pii_scan parity on a NULL text row)."""
    from slog_agent_spark.functions.dialect import DUCKDB, SPARK

    for value in ["NULL", "'a@b a@c'", "''"]:
        s = spark.sql(
            f"SELECT {SPARK.regexp_count(value, '@')} AS n"
        ).first()["n"]
        d = duck.execute(
            f"SELECT {DUCKDB.regexp_count(value, '@')} AS n"
        ).fetchone()[0]
        assert s == d, (value, s, d)
        assert (s or 0) >= 0
    assert spark.sql(
        f"SELECT {SPARK.regexp_count('NULL', '@')} AS n"
    ).first()["n"] == 0
