"""SQL expression emitter, parameterized by dialect (spark | duckdb).

The transform/match/template compilers in this package emit *SQL
expression strings* through this shim. On the product path the strings are
parsed by Spark via ``F.expr`` (identical Catalyst plan to the Column
API — whole-stage codegen, predicate pushdown all apply). On the oracle
path the same compiler emits DuckDB SQL, so the two engines execute the
same compiled semantics and the driver's DuckDB comparison is meaningful.

Only constructs with clean equivalents in both dialects are exposed;
anything engine-specific must go through a method here, never inline.
"""

from __future__ import annotations


class SqlDialect:
    SPARK = "spark"
    DUCKDB = "duckdb"

    def __init__(self, name: str):
        if name not in (self.SPARK, self.DUCKDB):
            raise ValueError(f"unknown dialect {name!r}")
        self.name = name

    # -- literals -----------------------------------------------------
    def lit(self, s: str) -> str:
        """Quote a Python string as a SQL string literal.

        Spark's parser processes backslash escapes inside literals;
        DuckDB's (standard SQL) does not. Both double single quotes.
        """
        if self.name == self.SPARK:
            s = s.replace("\\", "\\\\").replace("'", "\\'")
            # real control chars → escape sequences the Spark parser accepts
            s = s.replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")
            return f"'{s}'"
        out = s.replace("'", "''")
        if "\n" in out or "\t" in out or "\r" in out:
            # standard quotes can't hold control chars portably → concat chr()
            parts: list[str] = []
            buf = ""
            for ch in out:
                if ch in "\n\t\r":
                    if buf:
                        parts.append(f"'{buf}'")
                        buf = ""
                    parts.append(f"chr({ord(ch)})")
                else:
                    buf += ch
            if buf:
                parts.append(f"'{buf}'")
            return "(" + " || ".join(parts) + ")"
        return f"'{out}'"

    # -- regex --------------------------------------------------------
    def rlike(self, col: str, pattern: str) -> str:
        if self.name == self.SPARK:
            return f"({col} RLIKE {self.lit(pattern)})"
        return f"regexp_matches({col}, {self.lit(pattern)})"

    def regexp_extract(self, col: str, pattern: str, group: int) -> str:
        return f"regexp_extract({col}, {self.lit(pattern)}, {group})"

    def regexp_count(self, col: str, pattern: str) -> str:
        """Number of non-overlapping matches of ``pattern`` in col.

        Pattern goes through ``lit()`` — a bare f-string interpolation
        would be silently corrupted by Spark's literal escape processing
        the moment the pattern grows a backslash (round-3 ADVICE).

        NULL input counts 0 on BOTH engines (round-4 ADVICE: Spark's
        size() returns -1/NULL on a NULL array while DuckDB's len()
        returns NULL — a NULL text row would break dual-dialect parity
        of every count built on this). Normalized at the input: a NULL
        column scans as the empty string, which has zero matches."""
        inp = f"coalesce({col}, '')"
        if self.name == self.SPARK:
            return f"size(regexp_extract_all({inp}, {self.lit(pattern)}, 0))"
        return f"len(regexp_extract_all({inp}, {self.lit(pattern)}))"

    def regexp_replace_all(self, col: str, pattern: str, replacement: str) -> str:
        """Replace ALL matches (Spark is global-only; DuckDB needs 'g').

        Capture-group references use Java's ``$1`` syntax in the input and
        are translated to RE2's ``\\1`` for DuckDB.
        """
        if self.name == self.SPARK:
            return f"regexp_replace({col}, {self.lit(pattern)}, {self.lit(replacement)})"
        import re as _re

        replacement = _re.sub(r"\$(\d)", r"\\\1", replacement)
        return (
            f"regexp_replace({col}, {self.lit(pattern)}, "
            f"{self.lit(replacement)}, 'g')"
        )

    # -- strings -------------------------------------------------------
    def length(self, col: str) -> str:
        return f"length({col})"

    def substr(self, col: str, start_1based: str, length: str) -> str:
        return f"substr({col}, {start_1based}, {length})"

    def concat(self, *parts: str) -> str:
        return "(" + " || ".join(parts) + ")"

    def replace_literal(self, col: str, search: str, replacement: str) -> str:
        return f"replace({col}, {self.lit(search)}, {self.lit(replacement)})"

    def starts_with(self, col: str, prefix: str) -> str:
        fn = "startswith" if self.name == self.SPARK else "starts_with"
        return f"{fn}({col}, {self.lit(prefix)})"

    def ends_with(self, col: str, suffix: str) -> str:
        fn = "endswith" if self.name == self.SPARK else "ends_with"
        return f"{fn}({col}, {self.lit(suffix)})"

    def contains(self, col: str, needle: str) -> str:
        return f"contains({col}, {self.lit(needle)})"

    def trim_chars(self, col: str, chars: str) -> str:
        """Trim the given characters from both ends."""
        if self.name == self.SPARK:
            return f"trim(BOTH {self.lit(chars)} FROM {col})"
        return f"trim({col}, {self.lit(chars)})"

    def rtrim_chars(self, col: str, chars: str) -> str:
        """Trim the given characters from the right end."""
        if self.name == self.SPARK:
            return f"trim(TRAILING {self.lit(chars)} FROM {col})"
        return f"rtrim({col}, {self.lit(chars)})"

    def locate(self, needle: str, col: str) -> str:
        """1-based position of literal ``needle`` in col; 0 if absent."""
        if self.name == self.SPARK:
            return f"locate({self.lit(needle)}, {col})"
        return f"strpos({col}, {self.lit(needle)})"

    def locate_from(self, needle: str, col: str, start_1based: str) -> str:
        """1-based position of ``needle`` in col at/after ``start``; 0 if
        absent."""
        if self.name == self.SPARK:
            return f"locate({self.lit(needle)}, {col}, {start_1based})"
        inner = f"strpos(substr({col}, {start_1based}), {self.lit(needle)})"
        return (
            f"(CASE WHEN {inner} = 0 THEN 0 "
            f"ELSE {inner} + ({start_1based}) - 1 END)"
        )

    def to_string(self, expr: str) -> str:
        t = "STRING" if self.name == self.SPARK else "VARCHAR"
        return f"CAST(({expr}) AS {t})"

    # -- predicate-pushdown fence ---------------------------------------
    # Catalyst pushes a WHERE below the defining projection by
    # substituting the column's expression into the Filter — and Filter
    # predicates get no subexpression elimination, so an expensive
    # computed column (pair Jaccard/Hamming) is evaluated twice per row.
    # A nondeterministic field in the projection blocks the rule
    # (PushPredicateThroughNonJoin requires fields.forall(deterministic));
    # the filter must REFERENCE the fence so ColumnPruning keeps it.
    # DuckDB has no such pathology (and no spark_partition_id), so the
    # oracle emits nothing — result schema/values identical by
    # construction (spark_partition_id() >= 0 is always true).

    def fence_field(self) -> str:
        """Extra SELECT item for a fenced projection ('' on DuckDB)."""
        if self.name == self.SPARK:
            return ", spark_partition_id() AS __fence"
        return ""

    def fence_pred(self) -> str:
        """Leading WHERE conjunct referencing the fence ('' on DuckDB)."""
        if self.name == self.SPARK:
            return "__fence >= 0 AND "
        return ""

    # -- control flow ---------------------------------------------------
    def if_(self, cond: str, then: str, otherwise: str) -> str:
        return f"(CASE WHEN {cond} THEN {then} ELSE {otherwise} END)"

    def case(self, whens: list[tuple[str, str]], otherwise: str) -> str:
        body = " ".join(f"WHEN {c} THEN {v}" for c, v in whens)
        return f"(CASE {body} ELSE {otherwise} END)"

    # -- maps / pools ----------------------------------------------------
    def pool(self, items: list[str], idx0: str) -> str:
        lits = ", ".join(self.lit(s) for s in items)
        if self.name == self.SPARK:
            return f"element_at(array({lits}), CAST(({idx0}) + 1 AS INT))"
        return f"[{lits}][CAST(({idx0}) + 1 AS INT)]"

    def map_lookup(self, mapping: dict[str, str], key: str, default: str) -> str:
        """Constant dict lookup with default expr (small dims: stays a
        literal CASE — at bigger sizes callers should broadcast-join)."""
        whens = [(f"{key} = {self.lit(k)}", self.lit(v)) for k, v in mapping.items()]
        return self.case(whens, default)

    # -- hashing -----------------------------------------------------------
    def md5(self, col: str) -> str:
        return f"md5({col})"

    def hex_to_long(self, hexcol: str) -> str:
        """First 15 hex chars → BIGINT (portable; avoids sign issues)."""
        if self.name == self.SPARK:
            return f"CAST(conv(substr({hexcol}, 1, 15), 16, 10) AS BIGINT)"
        return f"CAST(('0x' || substr({hexcol}, 1, 15)) AS BIGINT)"

    def hex_digit(self, col_char_expr: str) -> str:
        """Single hex char expression → its integer value (0-15)."""
        if self.name == self.SPARK:
            return f"CAST(conv({col_char_expr}, 16, 10) AS INT)"
        return f"CAST(('0x' || {col_char_expr}) AS INTEGER)"

    def xor(self, a: str, b: str) -> str:
        if self.name == self.SPARK:
            return f"(({a}) ^ ({b}))"
        return f"xor(({a}), ({b}))"

    def bit_count(self, x: str) -> str:
        return f"bit_count({x})"

    def int_div(self, a: str, b: str) -> str:
        op = "div" if self.name == self.SPARK else "//"
        return f"(({a}) {op} ({b}))"

    def floor_div(self, a: str, b: str) -> str:
        """Integer division with FLOOR semantics, explicit on BOTH
        engines: Spark's ``div`` truncates toward zero, and DuckDB's
        integer ``//`` ALSO truncates (1.0.x; its float ``//`` floors —
        exactly the kind of per-engine, per-type surprise worth never
        depending on). The shared correction subtracts 1 when the
        truncated quotient had a nonzero remainder and the operands'
        signs differ — pure integer arithmetic on the already-computed
        quotient/remainder (both engines' ``%`` take the dividend's
        sign), no double-precision detour, exact at any BIGINT."""
        op = "div" if self.name == self.SPARK else "//"
        return (
            f"((({a}) {op} ({b})) - (CASE WHEN (({a}) % ({b})) <> 0 "
            f"AND ((({a}) < 0) <> (({b}) < 0)) THEN 1 ELSE 0 END))"
        )

    def unix_micros(self, col: str) -> str:
        """Timestamp column → microseconds since epoch (BIGINT)."""
        if self.name == self.SPARK:
            return f"unix_micros(CAST({col} AS TIMESTAMP))"
        return f"epoch_us({col})"

    # -- timestamps ----------------------------------------------------------

    # The reference's accepted grammar (transform/tparsetime/rfc3339.go:
    # 13-77): fixed punctuation at positions 4/7/10/13/16, optional
    # .fraction (>=1 digit), optional 'Z' / ±hh:mm / ±hhmm zone. Both
    # engines' formatless parsers are MORE permissive (space-separated
    # datetimes, date-only strings), so parseTime gates on this shape
    # first — keeping error-label behavior aligned with the reference.
    # Remaining documented divergence: a zone-less value is local time in
    # the reference but UTC here (session tz pinned); same instant only
    # when the agent runs in UTC.
    RFC3339_SHAPE = (
        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
    )

    def try_to_timestamp(self, col: str) -> str:
        """Parse RFC3339 (optional fraction, 'Z' or ±hh:mm/±hhmm offset)
        to a UTC-normalized naive timestamp; NULL on failure or on any
        shape the reference's strict parser rejects.

        reference: transform/tparsetime/tparsetime.go:53-67 (RFC3339 only).
        Spark's formatless try_to_timestamp resolves instants against the
        session tz (pinned to UTC by session.py); DuckDB goes through
        TIMESTAMPTZ then shifts to UTC explicitly so the result is
        independent of the connection tz.
        """
        gate = self.rlike(col, self.RFC3339_SHAPE)
        if self.name == self.SPARK:
            parse = f"try_to_timestamp({col})"
        else:
            parse = f"timezone('UTC', try_cast({col} AS TIMESTAMPTZ))"
        return f"(CASE WHEN {gate} THEN {parse} END)"


SPARK = SqlDialect(SqlDialect.SPARK)
DUCKDB = SqlDialect(SqlDialect.DUCKDB)
