"""Match-expression compiler: the reference's predicate language.

A match block is a mapping ``{field: (op, value)}`` — AND of all entries
(reference: base/bmatch/logmatcher.go:18-28). Operators mirror the
registry at base/bmatch/valuematch.go:22-34. A bare string value means
``str-eq``. The reference sorts matchers cheapest-first
(base/bmatch/logmatcherconfig.go:29); we don't — Catalyst reorders and
short-circuits conjunctions in codegen, which is the same optimization.

Fields are '' (never NULL) by pipeline invariant, so equality/length
semantics match the reference's empty≡missing rule.
"""

from __future__ import annotations

from .dialect import SqlDialect
from .glob import glob_to_predicate, glob_to_regex
from .regexlit import required_literal

Condition = dict[str, object]  # field -> value | (op, value)

OPS = (
    "str-eq", "str-not", "str-any", "str-start", "str-end",
    "str-contain", "glob", "regex", "len-gt", "len-lt",
)


def compile_value_match(d: SqlDialect, col: str, op: str, value: str) -> str:
    if op in ("str", "str-eq"):
        return f"({col} = {d.lit(value)})"
    if op == "str-not":
        return f"({col} != {d.lit(value)})"
    if op == "str-any":
        return f"({d.length(col)} > 0)"
    if op == "str-start":
        return d.starts_with(col, value)
    if op == "str-end":
        return d.ends_with(col, value)
    if op == "str-contain":
        return d.contains(col, value)
    if op == "glob":
        # regex-free positional/locate compilation where the glob's
        # shape allows (most do); regex only for alternation / negated
        # classes — the reference's scan-first design (DESIGN.md:83)
        pred = glob_to_predicate(d, col, value)
        if pred is not None:
            return pred
        return d.rlike(col, glob_to_regex(value))
    if op == "regex":
        # containment precheck on the pattern's required literal skips
        # the regex for rows that cannot match
        lit = required_literal(value)
        if lit:
            return f"({d.contains(col, lit)} AND {d.rlike(col, value)})"
        return d.rlike(col, value)
    if op == "len-gt":
        return f"({d.length(col)} > {int(value)})"
    if op == "len-lt":
        return f"({d.length(col)} < {int(value)})"
    raise ValueError(f"unknown match op {op!r}")


def compile_match(
    d: SqlDialect, condition: Condition, resolver=None
) -> str:
    """Match block → boolean SQL expression (AND of all entries)."""
    resolver = resolver or (lambda name: name)
    if not condition:
        return "TRUE"
    clauses = []
    for field, spec in condition.items():
        if isinstance(spec, tuple):
            op, value = spec
        else:
            op, value = "str-eq", spec
        clauses.append(compile_value_match(d, resolver(field), op, str(value)))
    return "(" + " AND ".join(clauses) + ")"
