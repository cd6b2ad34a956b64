"""Property-based check: the template slicer IS Python slicing.

The reference specifies `${var[a:b]}` as Python-style slicing with
clamping (reference: util/stringtemplate/stringtemplate.go:133-182 and
its test table). The compiler emits SQL; here hypothesis drives random
strings and bounds through the DuckDB dialect and compares against
Python's own s[a:b] — hundreds of cases per run, no Spark needed
(Spark↔DuckDB emitter equivalence is covered by tests/test_functions.py
and the driver gate).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from slog_agent_spark.functions.dialect import DUCKDB
from slog_agent_spark.functions.template import compile_template

_con = duckdb.connect()

# printable ASCII without quotes/backslash (literal-embedding safety is
# the dialect's concern, covered elsewhere)
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           exclude_characters="'\\\""),
    max_size=12,
)
_bound = st.one_of(st.none(), st.integers(min_value=-15, max_value=15))


@given(value=_text, a=_bound, b=_bound)
@settings(max_examples=300, deadline=None)
def test_slice_matches_python(value, a, b):
    a_s = "" if a is None else str(a)
    b_s = "" if b is None else str(b)
    tpl = f"${{v[{a_s}:{b_s}]}}"
    expr = compile_template(tpl, DUCKDB)
    got = _con.execute(
        f"SELECT {expr} AS r FROM (SELECT ? AS v)", [value]
    ).fetchone()[0]
    expected = value[a:b]
    assert got == expected, (tpl, value, got, expected)


@given(value=_text)
@settings(max_examples=100, deadline=None)
def test_bare_var_roundtrip(value):
    expr = compile_template("$v", DUCKDB)
    got = _con.execute(
        f"SELECT {expr} AS r FROM (SELECT ? AS v)", [value]
    ).fetchone()[0]
    assert got == value
