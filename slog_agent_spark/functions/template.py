"""String template mini-language compiler.

Grammar (reference: util/stringtemplate/stringtemplate.go:38-41):
    $var                 field reference ([A-Za-z0-9_]+)
    ${var}               same
    ${var[a:b]}          Python-style slice with negative indices,
                         clamped to bounds, '' on inverted/empty ranges
                         (reference: stringtemplate.go:133-182)
    anything else        literal

Compiles a template to a SQL expression string in the given dialect
(fields resolve to column names through ``resolver``). Used by
``addFields`` values and orchestration ``tag`` templates.
"""

from __future__ import annotations

import re

from .dialect import SqlDialect

_TOKEN = re.compile(
    r"\$(?:([A-Za-z0-9_]+)|\{([A-Za-z0-9_]+)(?:\[(-?\d*):(-?\d*)\])?\})"
)


def _slice_expr(d: SqlDialect, col: str, a: str, b: str) -> str:
    """Python slice v[a:b] over characters, as a SQL expression."""
    length = d.length(col)
    if a == "":
        start = "0"
    else:
        ai = int(a)
        start = (
            str(ai)
            if ai >= 0
            else f"greatest({length} + ({ai}), 0)"
        )
    if b == "":
        end = length
    else:
        bi = int(b)
        # negative end below -len → empty; handled by start<end guard
        end = f"least({bi}, {length})" if bi >= 0 else f"({length} + ({bi}))"
    start_v, end_v = f"({start})", f"({end})"
    sub = d.substr(col, f"{start_v} + 1", f"{end_v} - {start_v}")
    return d.if_(f"{start_v} < {end_v} AND {start_v} < {length}", sub, "''")


def parse_template(template: str) -> list[tuple[str, ...]]:
    """Split into parts: ('lit', s) | ('var', name) | ('slice', name, a, b)."""
    parts: list[tuple[str, ...]] = []
    pos = 0
    for m in _TOKEN.finditer(template):
        if m.start() > pos:
            parts.append(("lit", template[pos : m.start()]))
        name = m.group(1) or m.group(2)
        if m.group(1) is not None or (m.group(3) is None and m.group(4) is None):
            parts.append(("var", name))
        else:
            parts.append(("slice", name, m.group(3) or "", m.group(4) or ""))
        pos = m.end()
    if pos < len(template):
        tail = template[pos:]
        if "${" in tail:
            raise ValueError(f"unenclosed variable quotes: {template!r}")
        parts.append(("lit", tail))
    return parts


def compile_template(
    template: str,
    d: SqlDialect,
    resolver=None,
) -> str:
    """Template → SQL expression string. ``resolver(name) -> column sql``."""
    resolver = resolver or (lambda name: name)
    exprs: list[str] = []
    for part in parse_template(template):
        if part[0] == "lit":
            exprs.append(d.lit(part[1]))
        elif part[0] == "var":
            exprs.append(resolver(part[1]))
        else:
            _, name, a, b = part
            exprs.append(_slice_expr(d, resolver(name), a, b))
    if not exprs:
        return "''"
    return exprs[0] if len(exprs) == 1 else d.concat(*exprs)


def template_fields(template: str) -> list[str]:
    """Field names referenced by a template (for validation)."""
    return [p[1] for p in parse_template(template) if p[0] in ("var", "slice")]
