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
    return f"^{body}$" if anchored else body
