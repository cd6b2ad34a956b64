"""Required-literal extraction from regex patterns.

Used to gate regex evaluation behind a cheap ``contains()`` precheck:
if every match of a pattern must contain literal L, rows without L can
skip the regex entirely (the reference's scan-first design philosophy,
ref: DESIGN.md:83). Shared by the transform compiler (extract/replace
steps) and the match compiler (``!!regex`` conditions) — both dialects
emit the same precheck, so oracle parity is preserved by construction.
"""

from __future__ import annotations

import re


def named_groups_to_plain(pattern: str) -> tuple[str, dict[str, int]]:
    """``(?P<name>...)``/``(?<name>...)`` → anonymous groups + name→index.

    Java and RE2 disagree on named-group syntax, so names are resolved
    to indexes at compile time and anonymous groups are emitted.
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


def required_literal(pattern: str, min_len: int = 4) -> str | None:
    """Longest literal run every match of ``pattern`` must contain, or
    None.

    Group-aware: a ``(...)`` group NOT followed by a quantifier is
    transparent (its literal runs are required); a quantified group's
    runs are discarded (may match zero times); a group containing
    top-level-of-that-group alternation discards its runs (either
    branch may run) without invalidating siblings. Alternation at
    depth 0 kills the whole pattern. Character classes, ``{m,n}``
    bodies and escapes never contribute literal text; a char directly
    quantified by ``?``/``*``/``{`` is dropped (``+`` keeps it — the
    char still occurs at least once, contiguously).
    """
    plain, _ = named_groups_to_plain(pattern)
    n = len(plain)
    i = 0

    def quant_end(pos: int) -> int | None:
        """End index past a valid ``{m}``/``{m,}``/``{m,n}`` quantifier
        starting at ``pos``, else None (the brace is then a literal char
        in RE2/DuckDB and must NOT swallow following structure)."""
        m = re.match(r"\{\d+(?:,\d*)?\}", plain[pos:])
        return pos + m.end() if m else None

    # stack of [runs, alternated?] frames; frame 0 is depth 0
    stack: list[list] = [[[], False]]
    cur = ""

    def flush() -> None:
        nonlocal cur
        if cur:
            stack[-1][0].append(cur)
        cur = ""

    while i < n:
        c = plain[i]
        if c == "\\":
            flush()
            i += 2
            continue
        if c == "[":
            flush()
            i += 1
            if i < n and plain[i] == "^":
                i += 1
            if i < n and plain[i] == "]":
                i += 1
            while i < n and plain[i] != "]":
                i += 2 if plain[i] == "\\" else 1
            i += 1
            continue
        if c == "{":
            flush()
            qe = quant_end(i)
            # Literal brace (no valid quantifier body): a plain,
            # non-contributing char — do NOT skip ahead, or a '|' or
            # group inside the skipped span would be silently swallowed
            # and a non-required "literal" returned (silent row loss).
            i = qe if qe is not None else i + 1
            continue
        if c == "(":
            flush()
            if plain[i + 1 : i + 2] == "?":
                if plain[i + 2 : i + 3] == ":":
                    # non-capturing group: contents required; skip '?:'
                    stack.append([[], False])
                    i += 3
                    continue
                j = i + 2
                while j < n and plain[j] in "aiLmsux-":
                    j += 1
                if j > i + 2 and plain[j : j + 1] == ")":
                    # global inline flags like (?i): matching semantics
                    # of the WHOLE pattern change — no literal is safe
                    return None
                # lookaround / scoped flags / other (?...) construct:
                # contents are assertions or modifiers, never required
                # literal text of the match — collect nothing from them
                stack.append([[], True])
                i += 2
            else:
                stack.append([[], False])
                i += 1
            continue
        if c == ")":
            flush()
            runs, alternated = stack.pop() if len(stack) > 1 else ([], False)
            nxt = plain[i + 1] if i + 1 < n else ""
            quantified = (nxt and nxt in "?*") or (
                nxt == "{" and quant_end(i + 1) is not None
            )
            if not alternated and not quantified:
                stack[-1][0].extend(runs)  # non-quantified group: required
            i += 1
            continue
        if c == "|":
            flush()
            if len(stack) == 1:
                return None  # top-level alternation: nothing is required
            stack[-1][0] = []
            stack[-1][1] = True
            i += 1
            continue
        if c in "?*+}^$.":
            flush()
            i += 1
            continue
        nxt = plain[i + 1] if i + 1 < n else ""
        if (nxt and nxt in "?*") or (nxt == "{" and quant_end(i + 1) is not None):
            flush()
            i += 1
            continue
        cur += c
        i += 1
    flush()
    # unbalanced '(' leaves frames on the stack: their runs were inside
    # an unterminated group — treat them as required (regex engines
    # reject the pattern anyway)
    candidates: list[str] = []
    for runs, alternated in stack:
        if not alternated:
            candidates.extend(runs)
    best = max(candidates, key=len, default="")
    return best if len(best) >= min_len else None
