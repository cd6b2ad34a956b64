"""Property tests for required-literal extraction (functions/regexlit).

The precheck's soundness contract: if ``required_literal(p)`` returns
L, EVERY string matching p contains L — an unsound L silently drops
matching rows from extract/replace/match steps (the round-3
literal-brace bug class). Patterns are built compositionally from
(fragment, sample-set) pairs, so a matching string exists by
construction; hypothesis then drives the composition space.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from slog_agent_spark.functions.regexlit import required_literal

# (pattern fragment, strings that fragment matches)
FRAGMENTS: list[tuple[str, list[str]]] = [
    ("alpha", ["alpha"]),
    ("longword", ["longword"]),
    ("beta?", ["bet", "beta"]),
    ("x*", ["", "x", "xxx"]),
    ("y+", ["y", "yyy"]),
    ("[ab]", ["a", "b"]),
    ("[^q]", ["z"]),
    ("\\d{2,3}", ["12", "123"]),
    ("(foo|barbar)", ["foo", "barbar"]),
    ("(?:quux)", ["quux"]),
    ("(grouped)", ["grouped"]),
    ("(option)?", ["", "option"]),
    ("(rep){2}", ["reprep"]),
    ("(many)*", ["", "many", "manymany"]),
    ("\\{", ["{"]),
    ("{", ["{"]),          # bare brace: literal in RE2/DuckDB and Python
    ("{9zz", ["{9zz"]),    # brace-digit prefix that is NOT a quantifier
    (".", ["k"]),
    ("z{2}", ["zz"]),
    ("w{1,}", ["w", "www"]),
    ("\\.", ["."]),
    ("end$", ["end"]),
]


@st.composite
def pattern_and_samples(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    picks = [
        draw(st.sampled_from(FRAGMENTS)) for _ in range(n)
    ]
    pattern = "".join(p for p, _ in picks)
    # '$' mid-pattern never matches; keep 'end$' only as the last part
    if any(p == "end$" for p, _ in picks[:-1]):
        pattern = pattern.replace("end$", "end")
    samples = []
    for _ in range(4):
        samples.append(
            "".join(draw(st.sampled_from(opts)) for p, opts in picks)
        )
    return pattern, samples


@settings(max_examples=300, deadline=None)
@given(pattern_and_samples())
def test_required_literal_is_sound(ps):
    pattern, samples = ps
    lit = required_literal(pattern, min_len=2)
    for s in samples:
        # sanity: the sample really matches (Python re agrees with the
        # fragment table, bare '{' included)
        assert re.fullmatch(pattern, s), f"bad sample {s!r} for {pattern!r}"
        if lit is not None:
            assert lit in s, (
                f"unsound literal {lit!r} for {pattern!r}: "
                f"match {s!r} lacks it"
            )


def test_required_literal_known_answers():
    cases = {
        "ERROR: \\d+ failed": "ERROR: ",
        "abc|def": None,                 # top-level alternation
        "(abc|def)ghij": "ghij",         # group alternation is contained
        "(?i)CaseFold": None,            # global flag changes semantics
        "x{3}literal": "literal",
        "lit{2,4}eral": "eral",          # quantified 't' breaks the run
        "brace\\{open": "brace",         # escape never joins runs
        "pre{9zz}post": "post",  # '{9zz}' is no quantifier: literal chars
    }
    for pattern, want in cases.items():
        assert required_literal(pattern, min_len=4) == want, pattern
