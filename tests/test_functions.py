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
