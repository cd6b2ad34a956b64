"""The transform-chain compiler: all 15 reference transform types.

The reference runs records one-at-a-time through a chain of closures
(reference: base/logtransform.go:5-13, registry transform/index.go:24-40).
We compile the *whole chain* into one set of SQL column expressions — a
single Catalyst projection + one filter + a counter spec — so the entire
pipeline is one whole-stage-codegen span, vectorized, with nothing
row-at-a-time in Python.

Compilation threads three pieces of state through the step list:

    env        field → SQL expression (the record's current value as an
               expression over the input columns)
    alive      boolean expr: record not dropped by any prior `drop`
               (drop aborts the chain in the reference,
               base/bsupport/logtransforms.go:13-20 — later counters must
               not see dropped rows)
    guard      boolean expr: the conjunction of enclosing if/switch
               conditions (conditional steps become CASE WHEN threading,
               not branches)

Output: `CompiledChain` with final field expressions, the drop filter,
labelled-counter conditions (reference: metricLabel counters,
base/logprocesscounterset.go:85-103) and the parsed-timestamp expression.

Dialect-parameterized: the same compiler emits Spark SQL (product path,
run via F.expr) or DuckDB SQL (oracle path), so correctness is checked
engine-vs-engine on identical semantics.

Documented divergences from the reference (see SURVEY.md §2.4):
- `drop` percentage<100: the reference keeps a sequential running ratio
  (transform/tdrop/tdrop.go:75-84) — inherently single-threaded. We use
  deterministic hashing: md5(conv_id, turn_idx) % 100 < pct.
- `truncate` cuts by characters, not bytes (fixtures are ASCII; Spark
  substr is char-based and already UTF-8 safe).
- `unescape`/`redactEmail` expression paths use regex/replace chains;
  scanner-exact vectorized pandas UDF variants live in
  functions/redact.py for byte-exact needs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions.dialect import SqlDialect
from ..functions.match import compile_match
from ..functions.template import compile_template

REDACT_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*"
REDACT_REPLACEMENT = "REDACTED"

# unescape map — reference: util/stringunescape/unescape.go:73-102 via
# base/bsupport/unescape.go:9-17 ("\b \f \n \r \t \\")
UNESCAPE_PAIRS = [
    ("\\n", "\n"),
    ("\\t", "\t"),
    ("\\r", "\r"),
    ("\\b", "\b"),
    ("\\f", "\f"),
    ("\\\\", "\\"),
]


@dataclass
class CompiledChain:
    env: dict[str, str]                    # field -> final SQL expr
    alive: str                             # NOT dropped condition
    drop_cond: str                         # filter-out condition
    counters: list[tuple[str, str]]        # (label, condition expr)
    ts_expr: str | None = None             # parseTime result (timestamp)
    unescaped: str = "unescaped"           # final unescaped-flag expr


@dataclass
class _State:
    d: SqlDialect
    env: dict[str, str]
    alive: str = "TRUE"
    drop_cond: str = "FALSE"
    counters: list[tuple[str, str]] = field(default_factory=list)
    ts_expr: str | None = None
    unescaped: str = "unescaped"           # boolean column expr
    input_fields: frozenset[str] = frozenset()

    def resolver(self):
        e = dict(self.env)
        return lambda name: "(" + e[name] + ")"


def _and(*conds: str) -> str:
    real = [c for c in conds if c != "TRUE"]
    if not real:
        return "TRUE"
    return "(" + " AND ".join(real) + ")"


def _named_groups_to_plain(pattern: str) -> tuple[str, dict[str, int]]:
    """Strip (?<name>…)/(?P<name>…) group names; return name→index map.

    Java and RE2 disagree on named-group syntax, so we resolve names to
    indexes at compile time and emit anonymous groups.
    """
    names: dict[str, int] = {}
    idx = 0
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if c == "(":
            m = re.match(r"\(\?P?<([A-Za-z][A-Za-z0-9_]*)>", pattern[i:])
            if m:
                idx += 1
                names[m.group(1)] = idx
                out.append("(")
                i += m.end()
                continue
            if pattern[i : i + 2] != "(?":
                idx += 1
        out.append(c)
        i += 1
    return "".join(out), names


_EXTRACT_PATTERN = re.compile(
    r"^((?:\\.|[^*\[])*)  (?: (\*+) | \[([^\]]+)\] )  ((?:\\.|[^*\[])*)$",
    re.VERBOSE,
)


def _compile_extract_special(pattern: str, head: bool) -> str:
    """extractHead/extractTail mini-pattern → anchored regex with 1 group.

    Grammar: literal-prefix + (* | [charset]) + literal-suffix
    (reference: transform/textractspecial/stringextractor.go:166-259).
    The literal parts may escape specials with backslash.
    """
    m = _EXTRACT_PATTERN.match(pattern)
    if not m:
        raise ValueError(f"bad extract pattern {pattern!r}")
    prefix_raw, star, charset, suffix_raw = m.groups()

    def unescape_lit(s: str) -> str:
        return re.sub(r"\\(.)", r"\1", s)

    prefix = re.escape(unescape_lit(prefix_raw))
    suffix = re.escape(unescape_lit(suffix_raw))
    if star is not None:
        capture = "(.*?)" if (head and suffix) else "(.*)"
    else:
        capture = f"([{charset}]*)"
    if head:
        return "^" + prefix + capture + suffix
    return prefix + capture + suffix + "$"


def _apply(state: _State, guard: str, key: str, new_expr: str) -> None:
    old = state.env[key]
    state.env[key] = new_expr if guard == "TRUE" else state.d.if_(guard, new_expr, old)


def compile_steps(state: _State, steps: list[dict], guard: str) -> None:
    d = state.d
    for step in steps:
        t = step["type"]

        if t == "addFields":
            # reference: transform/taddfields/taddfields.go:64-76
            for dst, template in step["fields"].items():
                expr = compile_template(str(template), d, state.resolver())
                cond = _and(guard, f"{d.length('(' + expr + ')')} > 0")
                _apply(state, cond, dst, expr)

        elif t == "block":
            # reference: transform/tblock/tblock.go:38-40
            compile_steps(state, step["steps"], guard)

        elif t == "delFields":
            # reference: transform/tdelfields/tdelfields.go:46-52
            for k in step["keys"]:
                _apply(state, guard, k, "''")

        elif t == "drop":
            # reference: transform/tdrop/tdrop.go:65-85
            mcond = compile_match(d, step.get("match", {}), state.resolver())
            pct = int(step.get("percentage", 100))
            matched = _and(guard, state.alive, mcond)
            if pct >= 100:
                samp = "TRUE"
            else:
                h = d.hex_to_long(
                    d.md5(d.concat("conv_id", "':'", d.to_string("turn_idx")))
                )
                samp = f"(({h}) % 100 < {pct})"
            dropped = _and(matched, samp)
            label = step.get("metricLabel")
            if label:
                state.counters.append((label, dropped))
                if pct < 100:
                    state.counters.append(
                        ("!" + label, _and(matched, f"NOT {samp}"))
                    )
            state.drop_cond = f"({state.drop_cond} OR {dropped})"
            state.alive = _and(state.alive, f"NOT {dropped}")

        elif t == "extract":
            # reference: transform/textract/textract.go:72-92
            src = "(" + state.env[step["key"]] + ")"
            pat, names = _named_groups_to_plain(step["pattern"])
            if not names:
                raise ValueError("extract pattern needs named groups")
            hit = _and(guard, d.rlike(src, pat))
            for name, idx in names.items():
                _apply(state, hit, name, d.regexp_extract(src, pat, idx))

        elif t in ("extractHead", "extractTail"):
            # reference: transform/textractspecial/textractspecial.go:80-93
            src_key = step["key"]
            src = "(" + state.env[src_key] + ")"
            regex = _compile_extract_special(step["pattern"], t == "extractHead")
            hit = _and(guard, d.rlike(src, regex))
            captured = d.trim_chars(d.regexp_extract(src, regex, 1), " \t")
            _apply(state, hit, step["destKey"], captured)
            _apply(state, hit, src_key, d.regexp_replace_all(src, regex, ""))

        elif t == "if":
            # reference: transform/tif/tif.go:49-54
            cond = compile_match(d, step["match"], state.resolver())
            compile_steps(state, step["then"], _and(guard, cond))

        elif t == "mapValue":
            # reference: transform/tmapvalue/tmapvalue.go:50-61
            k = step["key"]
            col = "(" + state.env[k] + ")"
            default = d.lit(step.get("default", ""))
            mapped = d.map_lookup(step["mapping"], col, default)
            _apply(state, _and(guard, f"{d.length(col)} > 0"), k, mapped)

        elif t == "parseTime":
            # reference: transform/tparsetime/tparsetime.go:53-67
            k = step["key"]
            col = "(" + state.env[k] + ")"
            parsed = d.try_to_timestamp(col)
            ok = f"({parsed}) IS NOT NULL"
            prev = state.ts_expr or (
                "ts" if "ts" in state.input_fields else "CAST(NULL AS TIMESTAMP)"
            )
            state.ts_expr = d.if_(_and(guard, ok), parsed, prev)
            if step.get("errorLabel"):
                state.counters.append(
                    (
                        step["errorLabel"],
                        _and(guard, state.alive, f"NOT {ok}", f"{d.length(col)} > 0"),
                    )
                )

        elif t == "redactEmail":
            # reference: transform/tredactemail/redactemail.go:32-173
            k = step["key"]
            col = "(" + state.env[k] + ")"
            red = d.regexp_replace_all(col, REDACT_EMAIL_RE, REDACT_REPLACEMENT)
            if step.get("metricLabel"):
                state.counters.append(
                    (
                        step["metricLabel"],
                        _and(guard, state.alive, f"({red}) != {col}"),
                    )
                )
            _apply(state, guard, k, red)

        elif t == "replace":
            # reference: transform/treplace/treplace.go:57-64
            k = step["key"]
            col = "(" + state.env[k] + ")"
            pat = step["pattern"]
            if isinstance(pat, tuple):  # ("regex", pattern) from YAML !!regex
                pat = pat[1]
            _apply(
                state, guard, k,
                d.regexp_replace_all(col, pat, step["replacement"]),
            )

        elif t == "switch":
            # reference: transform/tswitch/tswitch.go:84-99 (first match
            # wins, no fallthrough; all matches see the switch-entry env)
            entry_resolver = state.resolver()
            not_prior = "TRUE"
            for case in step["cases"]:
                mcond = compile_match(d, case["match"], entry_resolver)
                eff = _and(guard, not_prior, mcond)
                compile_steps(state, case["then"], eff)
                not_prior = _and(not_prior, f"NOT {mcond}")

        elif t == "truncate":
            # reference: transform/ttruncate/ttruncate.go:53-66
            k = step["key"]
            col = "(" + state.env[k] + ")"
            max_len = int(step["maxLen"])
            suffix = step["suffix"]
            cond = _and(guard, f"{d.length(col)} > {max_len + len(suffix)}")
            cut = d.concat(d.substr(col, "1", str(max_len)), d.lit(suffix))
            _apply(state, cond, k, cut)

        elif t == "unescape":
            # reference: transform/tunescape/tunescape.go:47-63 — only if
            # the record was not already raw-multiline (unescaped flag)
            k = step["key"]
            col = "(" + state.env[k] + ")"
            expr = col
            for search, repl in UNESCAPE_PAIRS:
                expr = d.replace_literal(expr, search, repl)
            cond = _and(guard, f"NOT ({state.unescaped})")
            _apply(state, cond, k, expr)
            state.unescaped = (
                "TRUE" if guard == "TRUE" else d.if_(guard, "TRUE", state.unescaped)
            )

        else:
            raise ValueError(f"unknown transform type {t!r}")


def compile_chain(
    d: SqlDialect,
    steps: list[dict],
    schema_fields: list[str],
    input_fields: set[str],
) -> CompiledChain:
    """Compile a transform chain over a declared schema.

    ``schema_fields`` mirrors the reference's declared-field rule
    (reference: base/logschema.go:17-21): every field must be declared;
    undeclared-at-input fields start as ''.
    """
    env = {
        f: (f if f in input_fields else "''") for f in schema_fields
    }
    state = _State(d=d, env=env, input_fields=frozenset(input_fields))
    compile_steps(state, steps, "TRUE")
    return CompiledChain(
        env=state.env,
        alive=state.alive,
        drop_cond=state.drop_cond,
        counters=state.counters,
        ts_expr=state.ts_expr,
        unescaped=state.unescaped,
    )
