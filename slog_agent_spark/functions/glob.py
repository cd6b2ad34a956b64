"""Glob pattern → regex translator.

Implements the subset of gobwas/glob syntax the reference accepts in
``!!glob`` match expressions (reference: base/bmatch/valuematch.go:144-154,
compiled with no separator chars — so ``*`` and ``**`` are equivalent and
match across any characters):

    *        any run of characters (including empty)
    **       same (no separators configured)
    ?        exactly one character
    [abc]    character class (passed through; ranges/negation `[!a-z]`)
    {a,b}    alternation

The emitted regex uses only RE2 ∩ Java-regex constructs so the same
pattern string runs identically on Spark (Java) and DuckDB (RE2).
"""

from __future__ import annotations

_SPECIAL = set(".^$+()|\\")


def glob_to_regex(pattern: str, anchored: bool = True) -> str:
    out: list[str] = []
    i, n = 0, len(pattern)
    depth_alt = 0
    while i < n:
        c = pattern[i]
        if c == "*":
            # collapse runs of * / **
            while i + 1 < n and pattern[i + 1] == "*":
                i += 1
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            body = ""
            if j < n and pattern[j] in "!^":
                body += "^"
                j += 1
            if j < n and pattern[j] == "]":  # literal ] first
                body += "\\]"
                j += 1
            while j < n and pattern[j] != "]":
                ch = pattern[j]
                body += "\\" + ch if ch in ("\\", "[") else ch
                j += 1
            if j >= n:
                raise ValueError(f"unterminated character class in glob: {pattern!r}")
            out.append("[" + body + "]")
            i = j
        elif c == "{":
            depth_alt += 1
            out.append("(?:")
        elif c == "}":
            if depth_alt <= 0:
                raise ValueError(f"unbalanced '}}' in glob: {pattern!r}")
            depth_alt -= 1
            out.append(")")
        elif c == "," and depth_alt > 0:
            out.append("|")
        elif c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            out.append("\\" + nxt if nxt in _SPECIAL or nxt in "*?[]{}," else nxt)
            i += 1
        elif c in _SPECIAL:
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    if depth_alt != 0:
        raise ValueError(f"unbalanced '{{' in glob: {pattern!r}")
    body = "".join(out)
    # (?s): the reference compiles globs with NO separator chars, so
    # '*'/'?' match across newlines (gobwas/glob semantics) — without
    # DOTALL the regex path would disagree with both the reference and
    # the positional glob_to_predicate path on multiline field values
    return f"(?s)^{body}$" if anchored else f"(?s){body}"


# ---------------------------------------------------------------------------
# glob → regex-free SQL predicate
# ---------------------------------------------------------------------------

def _expand_class(body: str) -> str | None:
    """Class body → explicit char list; None if not cheaply expressible
    (negation, escapes, ranges wider than 16 chars)."""
    if not body or body[0] in "!^" or "\\" in body:
        return None
    out: list[str] = []
    i = 0
    while i < len(body):
        if i + 2 < len(body) and body[i + 1] == "-":
            lo, hi = ord(body[i]), ord(body[i + 2])
            if lo > hi:
                return None
            out.extend(chr(c) for c in range(lo, hi + 1))
            i += 3
        else:
            out.append(body[i])
            i += 1
    return "".join(out) if len(out) <= 16 else None


def _tokenize(pattern: str):
    """Glob → [("lit", s) | ("any",) | ("one",) | ("class", chars)],
    or None where the regex fallback is needed (alternation, negated/
    wide classes)."""
    toks: list[tuple] = []
    i, n = 0, len(pattern)
    lit = ""

    def flush():
        nonlocal lit
        if lit:
            toks.append(("lit", lit))
        lit = ""

    while i < n:
        c = pattern[i]
        if c == "*":
            flush()
            while i + 1 < n and pattern[i + 1] == "*":
                i += 1
            if not toks or toks[-1] != ("any",):
                toks.append(("any",))
        elif c == "?":
            flush()
            toks.append(("one",))
        elif c == "[":
            j = pattern.find("]", i + 2 if pattern[i + 1 : i + 2] == "]" else i + 1)
            if j < 0:
                return None
            chars = _expand_class(pattern[i + 1 : j])
            if chars is None:
                return None
            flush()
            toks.append(("class", chars))
            i = j
        elif c in "{},":
            return None  # alternation: regex fallback
        elif c == "\\" and i + 1 < n:
            lit += pattern[i + 1]
            i += 1
        else:
            lit += c
        i += 1
    flush()
    return toks


def glob_to_predicate(d, col: str, pattern: str) -> str | None:
    """Compile a glob match to a REGEX-FREE SQL predicate (positional
    substr/IN checks + an ordered locate chain), or None when the shape
    needs the regex fallback.

    Handles: fixed patterns (no ``*``), and ``seg0 * m1 * m2 ... * segN``
    where the anchored first/last segments may mix literals, ``?`` and
    small character classes, and every middle segment is a pure literal.
    The locate chain is greedy-leftmost, which is complete for
    existence: taking the earliest occurrence of m1 leaves maximal room
    for m2..suffix. Both dialects emit the same predicate (oracle-safe;
    equivalence vs the regex translation is property-tested). On the
    short-line flagship fixture this is throughput-neutral (the chain is
    JIT-bound, not regex-bound — measured A/B); the win is on long
    payloads, where a positional check beats a backtracking scan.
    """
    toks = _tokenize(pattern)
    if toks is None:
        return None

    # split on "any" into fixed-length segments
    segments: list[list[tuple]] = [[]]
    for t in toks:
        if t == ("any",):
            segments.append([])
        else:
            segments[-1].append(t)
    has_any = len(segments) > 1

    def seg_len(seg) -> int:
        return sum(len(t[1]) if t[0] == "lit" else 1 for t in seg)

    def char_checks(seg, pos_expr_of_offset) -> list[str]:
        """Positional checks for a fixed segment; ``pos_expr_of_offset``
        maps a 0-based offset inside the segment to a 1-based SQL pos."""
        conds: list[str] = []
        off = 0
        for kind, *val in seg:
            if kind == "lit":
                s = val[0]
                conds.append(
                    f"({d.substr(col, pos_expr_of_offset(off), str(len(s)))}"
                    f" = {d.lit(s)})"
                )
                off += len(s)
            elif kind == "class":
                opts = ", ".join(d.lit(ch) for ch in val[0])
                conds.append(
                    f"({d.substr(col, pos_expr_of_offset(off), '1')}"
                    f" IN ({opts}))"
                )
                off += 1
            else:  # "one": any char, length accounted for elsewhere
                off += 1
        return conds

    length = d.length(col)
    if not has_any:
        total = seg_len(segments[0])
        conds = [f"({length} = {total})"]
        conds += char_checks(segments[0], lambda o: str(o + 1))
        return "(" + " AND ".join(conds) + ")"

    first, *middles, last = segments
    for seg in middles:
        if len(seg) != 1 or seg[0][0] != "lit":
            return None  # floating class/? needs the regex engine

    plen, slen = seg_len(first), seg_len(last)
    mid_lens = [len(seg[0][1]) for seg in middles]
    conds = [f"({length} >= {plen + sum(mid_lens) + slen})"]
    # anchored prefix: plain startswith when it is one pure literal
    if len(first) == 1 and first[0][0] == "lit":
        conds.append(d.starts_with(col, first[0][1]))
    else:
        conds += char_checks(first, lambda o: str(o + 1))
    # anchored suffix
    if len(last) == 1 and last[0][0] == "lit":
        conds.append(d.ends_with(col, last[0][1]))
    else:
        conds += char_checks(last, lambda o: f"({length} - {slen - o - 1})")
    # ordered locate chain through the middle literals
    start = str(plen + 1)
    last_end = None
    for seg in middles:
        lit = seg[0][1]
        p = d.locate_from(lit, col, start) if start != "1" else d.locate(lit, col)
        conds.append(f"({p} > 0)")
        start = f"({p} + {len(lit)})"
        last_end = f"({p} + {len(lit) - 1})"
    if middles and slen:
        conds.append(f"({length} - {slen} >= {last_end})")
    return "(" + " AND ".join(conds) + ")"
